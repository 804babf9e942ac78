package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin

/** As-of and range join semantics on crafted fixtures. */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("as-of join: latest right at-or-before, per key, NULL before first") {
    val left = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 12:00:00"),
      (3L, 10L, "2024-01-01 08:00:00"), // before any right row
      (4L, 20L, "2024-01-01 12:00:00")  // exact-tie with right → inclusive
    ).toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"), col("t").cast("timestamp").as("ts"))
    val right = Seq(
      (10L, "2024-01-01 09:00:00", "5.00"),
      (10L, "2024-01-01 11:00:00", "7.00"),
      (20L, "2024-01-01 12:00:00", "9.00")
    ).toDF("user_id", "t", "v")
      .select(col("user_id"), col("t").cast("timestamp").as("ts"),
        col("v").cast("decimal(18,2)").as("purchase_value"))

    val out = TemporalJoin.asofJoin(left, right, "user_id", "ts",
      Seq("purchase_value")).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.toString)).toMap
    assert(out(1L) == Some("5.00"))  // 10:00 → 09:00 row
    assert(out(2L) == Some("7.00"))  // 12:00 → 11:00 row
    assert(out(3L) == None)          // nothing at-or-before 08:00
    assert(out(4L) == Some("9.00"))  // equal ts is inclusive
  }

  test("bucketed range join == inequality join; each event hits its interval") {
    val events = Seq(
      (1L, 10L, "2024-01-01 10:15:00"),
      (2L, 10L, "2024-01-01 11:45:00"),
      (3L, 10L, "2024-01-01 23:00:00") // outside any interval
    ).toDF("event_id", "user_id", "t")
      .select(col("event_id"), col("user_id"), col("t").cast("timestamp").as("ts"))
    val intervals = Seq(
      (10L, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
      (10L, "2024-01-01 11:00:00", "2024-01-01 12:00:00")
    ).toDF("user_id", "s", "e")
      .select(col("user_id"), col("s").cast("timestamp").as("session_start"),
        col("e").cast("timestamp").as("session_end"))

    val out = TemporalJoin.bucketedRangeJoin(events, intervals, "user_id",
      "ts", "session_start", "session_end", bucketSeconds = 600)
      .select("event_id", "session_start").collect()
      .map(r => r.getLong(0) -> r.get(1).toString).toMap
    assert(out == Map(
      1L -> "2024-01-01 10:00:00.0",
      2L -> "2024-01-01 11:00:00.0"))
  }
}
