package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level data-quality profiling — the one-pass pre-flight every
  * large ingest runs before committing a 100 TB table: per-column
  * row/null/distinct counts and value bounds, the numbers that back
  * schema drift alarms, join-key sanity checks (is the FK domain what
  * the dimension promises?), and partition-planner inputs.
  */
object Profile {

  /** Per-column profile of integer key/measure columns: one row per
    * column — (column, n_rows, n_null, n_distinct, min_val, max_val).
    *
    * Scale shape: ONE aggregate over ONE scan closes every metric for
    * every column at once — the scan is the whole cost at 100 TB, so
    * the profiler must never pay it per column. The multiple exact
    * COUNT(DISTINCT) land in a single Expand-based aggregate
    * (Catalyst's standard multi-distinct plan: the scan is read once,
    * expanded |cols| ways, each leg partially aggregated map-side);
    * swap in HLL/KMV sketch columns from [[Sketch]] on the same plan
    * when approximate distincts suffice. The per-column rows come from
    * exploding a literal struct array over the single aggregate row —
    * driver-free, |cols| rows total.
    */
  def keyColumnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("long").as(s"min_$c"),
      max(col(c)).cast("long").as(s"max_$c")))
    val all = count(lit(1)).as("n_rows") +: aggs
    val one = df.agg(all.head, all.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"),
      col("n_rows"),
      (col("n_rows") - col(s"cnt_$c")).as("n_null"),
      col(s"nd_$c").as("n_distinct"),
      col(s"min_$c").as("min_val"),
      col(s"max_$c").as("max_val")))
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
