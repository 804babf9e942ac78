package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.query.Analytics

/** r9 wave-13 operators: exact media dedup, chunk-upload planner,
  * dyadic time-decayed counts.
  */
class Round9Wave13Spec extends SparkSpec {
  import spark.implicits._

  test("mediaDedup: byte-identical payloads group; distinct ones " +
    "drop out") {
    val docs = Seq((1L, "same text", "a"), (2L, "same text", "b"),
      (3L, "other", "a")).toDF("doc_id", "text", "source")
    val got = Multimodal.mediaDedup(Multimodal.mediaTable(docs))
      .collect()
    assert(got.length == 1, "one duplicate group")
    assert(got(0).getAs[Long]("keeper_doc_id") == 1L)
    assert(got(0).getAs[Long]("n") == 2L)
    // Payload = 33-byte header + text bytes.
    assert(got(0).getAs[Long]("total_bytes") == 2L * (33 + 9))
  }

  test("chunkPlan: exact multiples, remainders, and the sub-chunk " +
    "payload") {
    // Payload bytes = 33 + len(text).
    val docs = Seq(
      (1L, "x" * (256 - 33), "s"),       // exactly 1 chunk
      (2L, "x" * (256 - 33 + 1), "s"),   // 1 byte over -> 2 chunks
      (3L, "x" * 10, "s"))               // sub-chunk
      .toDF("doc_id", "text", "source")
    val got = Multimodal.chunkPlan(Multimodal.mediaTable(docs))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("n_chunks"),
          r.getAs[Long]("last_chunk_bytes"))).toMap
    assert(got(1L) == ((256L, 1L, 256L)))
    assert(got(2L) == ((257L, 2L, 1L)))
    assert(got(3L) == ((43L, 1L, 43L)))
  }

  test("decayCounts: weights halve per half-life exactly; beyond 20 " +
    "half-lives they are exactly 0") {
    val ts0 = java.sql.Timestamp.valueOf("2024-12-31 12:00:00")
    def at(daysBefore: Int) = new java.sql.Timestamp(
      ts0.getTime - daysBefore * 86400000L)
    val events = Seq(
      ("a", at(0)), ("a", at(29)),   // same half-life bucket: w = 1
      ("a", at(30)),                 // one half-life: w = 1/2
      ("a", at(90)),                 // three: w = 1/8
      ("b", at(0)), ("b", at(30 * 25))) // second beyond cap: w = 0
      .toDF("event_type", "ts")
    val got = Analytics.decayCounts(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("decayed_count")))
      .toMap
    assert(got("a") == ((4L, 1.0 + 1.0 + 0.5 + 0.125)))
    assert(got("b") == ((2L, 1.0)))
  }
}
