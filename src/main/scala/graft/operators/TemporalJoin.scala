package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins — the brief's canonical
  * custom-operator examples. Both are built by COMPOSITION (preference
  * (a) in the brief's ladder): the union-and-carry window for as-of, a
  * time-bucketed equi-prejoin for range — no custom SparkPlan needed,
  * and both stay shuffle-partitionable by the join key.
  *
  * The DuckDB oracle runs its NATIVE `ASOF LEFT JOIN` against the as-of
  * composition — two independent algorithms, one answer.
  */
object TemporalJoin {

  /** As-of join: for each left row, the latest right row with
    * `right.ts <= left.ts` within `key` (left outer: no match → NULL
    * values). Right rows must be unique per (key, ts) — pre-aggregate
    * ties upstream. `left` must not already contain `valCols`.
    *
    * Shape: union-tag both sides, one window per key ordered by
    * (ts, side) with right-before-left at equal ts (inclusive as-of),
    * carry the last non-null right value forward, keep left rows.
    * One shuffle on `key`, one sorted pass — the streaming-friendly
    * as-of shape (state per key = one carried value).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               tsCol: String, valCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left.withColumn("__side", lit(1))
    val rTagged = right
      .select((Seq(key, tsCol) ++ valCols).map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols ++ valCols).map(col): _*)
  }

  /** Range join: events × intervals where `start <= ts < end` within
    * `key`. Naively a broadcast-nested-loop; here intervals explode to
    * the fixed-width time buckets they cover and events join their own
    * bucket (equi-join!), with the exact range predicate as a residual
    * filter. Bucket width trades replication (long intervals → more
    * bucket rows) against join fan-in — size it near the median interval
    * length.
    */
  def bucketedRangeJoin(events: DataFrame, intervals: DataFrame,
                        key: String, tsCol: String,
                        startCol: String, endCol: String,
                        bucketSeconds: Int = 1800): DataFrame = {
    val b = lit(bucketSeconds.toLong)
    val ev = events.withColumn("__bucket",
      (col(tsCol).cast("long") / b).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence((col(startCol).cast("long") / b).cast("long"),
        (col(endCol).cast("long") / b).cast("long"))))
    ev.join(iv, Seq(key, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }

  /** POINT-IN-TIME join against an SCD2-style versioned dimension —
    * the feature-store primitive (each fact row sees the attribute
    * version valid AT ITS OWN timestamp, never the current one; the
    * leakage-free training-data join): equi-join on the entity key
    * with the validity range as a residual predicate, `valid_to IS
    * NULL` meaning the open current version.
    *
    * Scale shape: the KEY is the join key, so Spark plans a plain
    * sort-merge/hash join on it — the range is a per-key residual over
    * the handful of versions an entity carries (SCD2 dims are
    * versions-per-key-bounded by construction). No interval bucketing
    * needed — unlike [[bucketedRangeJoin]]'s key-less ranges, the
    * equi-key already co-locates.
    */
  def pointInTime(facts: DataFrame, factKey: String, tsCol: String,
                  dim: DataFrame, dimKey: String,
                  fromCol: String = "valid_from",
                  toCol: String = "valid_to"): DataFrame =
    facts.join(dim,
      facts(factKey) === dim(dimKey) &&
        facts(tsCol) >= dim(fromCol) &&
        (dim(toCol).isNull || facts(tsCol) < dim(toCol)))
}
