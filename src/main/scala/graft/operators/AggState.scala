package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate MAINTENANCE — the warehouse rollup pattern at
  * 100 TB: a daily ingest must update per-key totals without rescanning
  * the fact history, so the stored artifact is per-key PARTIAL STATE
  * (sum, count — the classic commutative-monoid pair), and each new
  * slice folds in with one key-shuffled merge over state ∪ delta-state:
  * cost proportional to |keys| + |delta|, independent of history size.
  * This is exactly Spark's own partial/final aggregation split, lifted
  * to a PERSISTENT boundary (the same algebra `StreamingIngest` uses
  * per micro-batch, here as a batch artifact any engine can re-read).
  *
  * Exactness: sums are DECIMAL (money semantics) — decimal addition is
  * associative and commutative, so ANY slicing of the fact table merges
  * to bit-identical state, and the DuckDB oracle can simply aggregate
  * the whole table directly. (Float sums would NOT carry this
  * guarantee; keep monoid state in decimal/integer domains.)
  */
object AggState {

  /** Per-key partial state of `df`: (keys…, psum DECIMAL, pn BIGINT). */
  def partialState(df: DataFrame, keys: Seq[String],
                   valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as("psum"), count(lit(1)).as("pn"))

  /** Fold any number of partial states into one — the monoid merge:
    * union, one shuffle keyed on the group keys, re-sum. Output schema
    * equals [[partialState]]'s, so merges chain (day → month → year).
    */
  def mergeStates(keys: Seq[String], states: DataFrame*): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("psum")).as("psum"), sum(col("pn")).as("pn"))
}
