package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketch}

/** KMV sketch accuracy/exactness and winnow-pair recall gates. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.documents(spark, sf)

  test("KMV estimation path lands within 30% of exact (k=64, n≈100)") {
    val exact = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.kmvDistinctByGroup(
      docs.select(col("lang"), col("doc_id")), "lang", "doc_id", 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Int]("k_actual"), r.getAs[Double]("estimate"))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (lang, (kAct, e)) =>
      val n = exact(lang)
      if (n > 64) {
        assert(kAct == 64)
        assert(math.abs(e - n) / n <= 0.30, s"$lang: est $e exact $n")
      } else assert(e == n.toDouble, s"$lang: small group must be exact")
    }
  }

  test("KMV below-k groups report the exact count (k_actual < k)") {
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.kmvDistinctByGroup(
      docs.select(col("source"), col("doc_id")), "source", "doc_id", 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate")).toMap
    exact.foreach { case (src, n) =>
      assert(n < 64 && est(src) == n.toDouble, s"$src")
    }
  }

  test("winnow candidate pairs recover every injected near-dup pair") {
    val corpus = Dedup.withNearDuplicates(docs)
    val pairs = Dedup.winnowCandidatePairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = docs.filter(col("doc_id") % 50 === 0)
      .collect().map(_.getAs[Long]("doc_id"))
      .map(id => (id, id + 1000000L)).toSet
    injected.foreach(p => assert(pairs.contains(p), s"missing $p"))
    // and compression really happened: candidate set ≪ all-pairs
    val n = corpus.count()
    assert(pairs.size < n * (n - 1) / 20)
  }
}
