package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Tables.Money

/** Event-time windowed aggregation over the `events` table — the
  * streaming surface of the engine (builder brief; Structured Streaming).
  *
  * Every transform below is expressed once and works on BOTH a batch
  * DataFrame (the differential-oracle path: DuckDB reproduces tumbling
  * windows with time_bucket, sliding with an offset cross join, sessions
  * with classic gap-island windows) and a streaming DataFrame (apply
  * `withWatermark` upstream; see `watermarked` and StreamingSpec).
  *
  * `value` is cast to DECIMAL(18,2) at scan so sums are exact and
  * engine-comparable.
  *
  * Scale: tumbling/sliding aggs are partial+final hash aggs keyed by
  * (window, type) — map-side combine keeps the shuffle tiny; sessions key
  * state by user_id, the natural shard key for streaming state stores.
  */
object Events {

  /** Typed view: timestamps as TIMESTAMP, value as exact decimal. */
  def typed(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("ts").cast("timestamp").as("ts"),
      col("user_id"), col("event_type"),
      col("value").cast(Money).as("v"), col("props"))

  /** Watermarked variant for streaming sources. */
  def watermarked(events: DataFrame, delay: String = "2 hours"): DataFrame =
    typed(events).withWatermark("ts", delay)

  /** Tumbling event-time windows: count + exact sum per (window, type). */
  def tumbling(e: DataFrame, width: String = "1 hour"): DataFrame =
    e.groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast(Money).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Sliding windows (each event lands in width/slide windows). */
  def sliding(e: DataFrame, width: String = "1 hour",
              slide: String = "30 minutes"): DataFrame =
    e.groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast(Money).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Gap-based sessions per user: window end = last event + gap
    * (Spark session_window semantics; an event AT the end bound starts a
    * new session).
    */
  def sessions(e: DataFrame, gap: String = "30 minutes"): DataFrame =
    e.groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).cast(Money).as("total"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total"))

  /** Click→purchase attribution: each click joined to the same user's
    * purchases in the FOLLOWING `within` interval (click happens first,
    * purchase within the window after it) — expressed once, runs
    * as a BATCH interval join (sort-merge on user_id with the range
    * residual; the DuckDB oracle reproduces it exactly) and as a
    * STREAM-STREAM inner join (watermark both sides upstream; the time
    * bound is exactly what lets Structured Streaming expire join state —
    * StreamingSpec proves batch parity through micro-batches).
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
                       within: String = "1 hour"): DataFrame =
    clicks.alias("c").join(purchases.alias("p"),
      expr(s"""c.user_id = p.user_id AND
              |p.ts BETWEEN c.ts AND c.ts + INTERVAL $within""".stripMargin))
      .select(col("c.event_id").as("click_id"),
        col("c.user_id").as("user_id"), col("c.ts").as("click_ts"),
        col("p.ts").as("purchase_ts"), col("p.v").as("purchase_value"))

  /** JSON property extraction + rollup (props is a JSON string). */
  def jsonRollup(e: DataFrame): DataFrame =
    e.select(col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))

  /** WATERMARK late-data accounting, batch twin: replay the log in
    * arrival order (event_id — the monotone ingest sequence) and flag
    * every event whose event time trails the per-user high-water mark
    * by more than `delaySec` — exactly the rows a streaming watermark
    * of that delay would drop from state. Per type: total, late count,
    * and worst lateness beyond the allowance. The sizing answer to
    * "what delay keeps loss under x%?" — run over a day's log before
    * picking the `withWatermark` budget (the allowance
    * [[watermarked]]'s default encodes).
    *
    * Scale shape: one window partitioned by user_id (the same state
    * key streaming uses — the log shuffles once) over arrival order,
    * then one tiny per-type aggregate. All integer epoch-micros; the
    * first event per user coalesces to an effective −∞ mark (never
    * late).
    */
  def lateDataStats(e: DataFrame, delaySec: Long = 600L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    e.withColumn("hwm_us",
        coalesce(max(unix_micros(col("ts"))).over(w), lit(Long.MinValue / 2)))
      .withColumn("late_us",
        greatest(col("hwm_us") - lit(delaySec * 1000000L)
          - unix_micros(col("ts")), lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"))
  }
}

