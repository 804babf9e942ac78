package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deterministic sampling and split assignment for training-data
  * pipelines. `rand()`-based sampling is non-reproducible across runs,
  * retries and engines; everything here derives from a CONTENT hash of a
  * key column (the md5-based 60-bit fingerprint), so a row's sample
  * membership and split assignment are stable properties of the row —
  * re-runs, backfills and a DuckDB oracle all agree.
  *
  * Scale: pure per-row expressions — no shuffle, no state, fully
  * codegen'd; the sample filter pushes down like any predicate.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column. */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    pmod(TextOps.fingerprint64(key.cast("string")), lit(buckets.toLong))

  /** Keep ~keepPct% of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          keepPct: Int): DataFrame =
    df.filter(hashBucket(col(keyCol)) < keepPct)

  /** Stable train/val/test assignment by key-hash ranges. */
  def splitAssign(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Stratified sample: exactly `quota` rows per stratum (fewer if the
    * stratum is smaller), chosen by ranking a salted content hash within
    * each stratum — a deterministic per-stratum lottery, reproducible
    * across runs and engines.
    *
    * Scale: the window partitions BY STRATUM, so state is bounded by
    * stratum size and the plan shuffles once on the stratum key. For a
    * quota ≪ stratum size at extreme scale, swap the window for the
    * bounded-heap TopK aggregator (operators/TopK.scala) keyed by
    * stratum — same contract, shuffle carries only quota rows per
    * stratum.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, keyCol: String,
                       quota: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("strat_hk"), col(keyCol))
    df.withColumn("strat_hk",
        md5(concat(col(keyCol).cast("string"), lit(":strat"))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= quota)
      .drop("strat_hk")
  }
}
