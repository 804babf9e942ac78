package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off measurement harness for VERDICT r8 #3 / the r8 ADVICE
  * "measure first" caveat: does a per-round count()-probed early stop
  * beat [[graft.operators.Graph.kCore]]'s fixed 12 peel rounds at
  * sf0.1, after the r8 probe-batching lesson (12 count jobs to save
  * ~2 of 12 rounds lost 2.5–5× there)? Interleaves the two variants
  * A/B-style, 1 warm-up + 3 timed passes each; results land in
  * PLANS.md and this file is deleted after the measurement.
  */
object KCoreProbe {

  private def kCoreEarlyStop(edges: DataFrame, k: Int,
                             maxRounds: Int = 12): (DataFrame, Int) = {
    var e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    var n = e.count()
    var rounds = 0
    var converged = false
    while (rounds < maxRounds && !converged) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src"))
      val next = e.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val n2 = next.count() // the probe: peeling is monotone, equal
      rounds += 1           // edge count == fixpoint reached
      converged = n2 == n
      n = n2
      e = next
    }
    (e.select(col("src").as("node")).groupBy(col("node"))
      .agg(count(lit(1)).as("degree")), rounds)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def edges: DataFrame = {
      val p = graft.operators.Itemsets.pairEdges(
        queries.Tables.lineitem(spark, sfDir), "l_orderkey", "l_partkey")
      p.select(col("a").as("src"), col("b").as("dst"))
        .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    }

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def runFixed(): Double = time {
      graft.operators.Graph.kCore(edges, 3)
        .write.format("noop").mode("overwrite").save()
    }
    var lastRounds = 0
    def runEarly(): Double = time {
      val (df, r) = kCoreEarlyStop(edges, 3)
      lastRounds = r
      df.write.format("noop").mode("overwrite").save()
    }

    runFixed(); runEarly() // warm-up, discarded
    val fixed = Seq.fill(3) { runFixed() }
    val early = Seq.fill(3) { runEarly() }
    println(f"[kcore-probe] fixed12: min=${fixed.min}%.2fs " +
      f"med=${fixed.sorted.apply(1)}%.2fs all=${fixed.map(t => f"$t%.2f")}")
    println(f"[kcore-probe] earlystop: min=${early.min}%.2fs " +
      f"med=${early.sorted.apply(1)}%.2fs rounds=$lastRounds " +
      f"all=${early.map(t => f"$t%.2f")}")
    spark.stop()
  }
}
