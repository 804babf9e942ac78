package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Tables.Money

/** Time-series resampling: project each key's event stream onto a
  * regular grid with forward-fill — "what was the latest value at every
  * hour mark". Built by COMPOSITION: span → sequence-exploded grid →
  * the as-of join (TemporalJoin) carries the last value onto each grid
  * point. Grid points before a user's first event stay NULL.
  *
  * Scale: the grid explodes one row per (key, bucket) — size is
  * span/width per key, independent of event count; the as-of join is the
  * one-shuffle union-window. No driver-side time loops.
  */
object Resample {

  def hourlyCarryForward(events: DataFrame): DataFrame = {
    val spans = events.groupBy(col("user_id")).agg(
      date_trunc("hour", min(col("ts"))).as("t0"),
      date_trunc("hour", max(col("ts"))).as("t1"))
    val grid = spans.select(col("user_id"),
      explode(sequence(col("t0"), col("t1"), expr("interval 1 hour")))
        .as("ts"))
    val state = events.groupBy(col("user_id"), col("ts"))
      .agg(max(col("v")).cast(Money).as("state_v"))
    TemporalJoin.asofJoin(grid, state, "user_id", "ts", Seq("state_v"))
  }
}
