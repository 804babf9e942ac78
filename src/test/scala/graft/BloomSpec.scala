package graft

import org.apache.spark.sql.functions._
import graft.operators.Bloom

/** Bloom-filter contract: zero false negatives, deterministic bit
  * pattern, designed-rate false positives, broadcast-probe plan.
  */
class BloomSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.documents(spark, sf)
  private lazy val prev = docs.filter(col("doc_id") % 2 === 0)

  test("no false negatives; false positives exist at the undersized m") {
    val words = Bloom.build(prev, "doc_id", 1024, 3)
    val verdicts = Bloom.probe(docs, "doc_id", words, 1024, 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // every indexed key answers maybe
    prev.collect().map(_.getAs[Long]("doc_id"))
      .foreach(id => assert(verdicts(id), s"false negative for $id"))
    val odd = verdicts.filter { case (id, _) => id % 2 == 1 }
    assert(odd.exists(!_._2), "some definite-new verdicts")
    // m=1024/k=3 over 250 keys: fpp ≈ (1-e^(-0.73))^3 ≈ 0.14 — the FP
    // count among 250 odd ids should be visibly positive but minority
    val fps = odd.count(_._2)
    assert(fps > 0 && fps < odd.size / 2, s"fp count $fps of ${odd.size}")
  }

  test("bit pattern is a pure function of the key set") {
    val a = Bloom.build(prev, "doc_id", 1024, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Bloom.build(prev.orderBy(col("doc_id").desc), "doc_id", 1024, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b, "row order must not change the filter")
    assert(a.nonEmpty && a.forall(_._2 != 0L), "only non-zero words stored")
  }

  test("probe plan broadcasts the word table — the index never shuffles") {
    val words = Bloom.build(prev, "doc_id", 1024, 3)
    val plan = Bloom.probe(docs, "doc_id", words, 1024, 3)
      .queryExecution.sparkPlan
    assert(plan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty)
  }

  test("at properly-sized m the fp rate drops to ~zero on this corpus") {
    val words = Bloom.build(prev, "doc_id", 1 << 16, 4)
    val fp = Bloom.probe(docs, "doc_id", words, 1 << 16, 4)
      .filter(col("key") % 2 === 1 && col("maybe_present"))
    assert(fp.count() <= 1) // fpp ≈ 2e-7 per key at n=250, m=65536, k=4
  }
}
