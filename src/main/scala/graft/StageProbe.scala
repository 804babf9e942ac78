package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STAGE-LEVEL wall-time attribution for the catalog's slowest
  * queries (VERDICT r14 #3/#7) — the dedupPipelineAudit timing device
  * promoted to a standalone diagnostic main, so a perf question about
  * a composed query ("is it the substrate, a leg, or the fusion?")
  * is answered by measurement instead of inference from anchor
  * deltas. Each named probe times its stages COLD (fresh plans, SQL
  * cache cleared between stages) and prints one table row per stage.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.StageProbe
  *        [probe ...]"  (default: all probes)
  *
  * The stage timings are diagnostic, not benchmarks: stages share the
  * JVM and build on warmed executor code, so compare stages WITHIN a
  * probe, not across runs.
  */
object StageProbe {

  private def timed(label: String)(body: => Long): (String, Double, Long) = {
    val t0 = System.nanoTime()
    val n = body
    (label, (System.nanoTime() - t0) / 1e9, n)
  }

  /** Each probe returns (stage label, seconds, rows materialized). */
  private def probes(spark: SparkSession, d: String)
      : Map[String, () => Seq[(String, Double, Long)]] = {
    import graft.queries.Tables
    def docs = Tables.documents(spark, d)
    Map(
      "link_predict" -> (() => {
        val edges = graft.operators.Itemsets.pairEdges(
          Tables.lineitem(spark, d), "l_orderkey", "l_partkey")
        val s1 = timed("substrate:pairEdges")(edges.count())
        spark.sqlContext.clearCache()
        val s2 = timed("full:adamicAdar")(
          graft.operators.Graph.adamicAdar(edges).count())
        Seq(s1, s2)
      }),
      "hybrid_rrf" -> (() => {
        val s1 = timed("leg:bm25TopK")(
          graft.operators.Retrieval.bm25TopK(docs, 10).count())
        spark.sqlContext.clearCache()
        val s2 = timed("leg:hashedTextTopK")(
          graft.operators.Similarity.hashedTextTopK(
            docs.filter(col("doc_id") % 100 === 0 &&
              col("doc_id") < 1000000L), docs, 10).count())
        spark.sqlContext.clearCache()
        val s3 = timed("full:rrfFusion")(
          graft.operators.Retrieval.rrfFusion(docs).count())
        Seq(s1, s2, s3)
      }),
      "rm3_rescore" -> (() => {
        val s1 = timed("leg:bm25TopK(first pass)")(
          graft.operators.Retrieval.bm25TopK(docs, 5).count())
        spark.sqlContext.clearCache()
        val s2 = timed("stage:rm3ExpansionTerms")(
          graft.operators.Retrieval.rm3ExpansionTerms(docs).count())
        spark.sqlContext.clearCache()
        val s3 = timed("full:rm3Rescore")(
          graft.operators.Retrieval.rm3Rescore(docs).count())
        Seq(s1, s2, s3)
      }),
      "dedup_winnow_verified" -> (() => {
        val s1 = timed("stage:winnowCandidatePairs")(
          graft.operators.Dedup.winnowCandidatePairs(
            graft.operators.Dedup.withNearDuplicates(docs)).count())
        spark.sqlContext.clearCache()
        val s2 = timed("full:winnowVerifiedPairs")(
          graft.operators.Dedup.winnowVerifiedPairs(
            graft.operators.Dedup.withNearDuplicates(docs)).count())
        Seq(s1, s2)
      }))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = probes(spark, sfDir)
    val names = if (args.isEmpty) all.keys.toSeq.sorted else args.toSeq
    names.foreach { n =>
      println(s"\n== $n (sf=$sfDir) ==")
      all(n)().foreach { case (label, sec, rows) =>
        println(f"  $label%-32s ${sec}%8.2f s  ($rows%d rows)")
      }
      spark.sqlContext.clearCache()
    }
    spark.stop()
  }
}
