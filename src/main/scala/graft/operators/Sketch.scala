package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** K-minimum-values (KMV) distinct-count sketch — the deterministic
  * alternative to HLL for cardinality estimation at scale.
  *
  * Spark's `approx_count_distinct` is a fine HLL++ but its sketch is
  * engine-private: no cross-engine differential, no mergeable artifact
  * another system can read. KMV keeps the k SMALLEST distinct md5-derived
  * hash values; with hashes uniform on [0, 2⁶⁰), the k-th smallest h₍ₖ₎
  * estimates the distinct count as (k−1)·2⁶⁰/h₍ₖ₎ (Bar-Yossef et al.'s
  * classic estimator, std error ≈ 1/√(k−2)). Every byte of the sketch is
  * a pure function of the key set — DuckDB replicates it row-for-row.
  *
  * Scale shape: a typed Aggregator holds ≤ k longs per group PER MAP
  * PARTITION (bounded distinct-heap), so the shuffle carries k·partitions
  * longs per group — never the distinct value set itself (a plain
  * `countDistinct` shuffles every distinct value; HLL ships ~1.5 KB
  * registers — KMV at k=256 ships 2 KB, same order). Sketches merge by
  * distinct-union-truncate, so partial results compose across days/shards
  * — the property warehouse rollups need.
  */
object Sketch {

  /** Bounded distinct bottom-k of hash values. Buffer is sorted distinct
    * ascending, capped at k — insertion skips anything ≥ the cap once
    * full, so per-row cost is a binary-search-free compare in the common
    * case.
    */
  class KmvAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], KmvSketch] {
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.sizeIs >= k && buf.last <= h) buf
      else if (buf.contains(h)) buf
      else ((buf :+ h).sorted).take(k)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(r: Seq[Long]): KmvSketch =
      KmvSketch(r.size, if (r.isEmpty) 0L else r.last)
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
  }

  /** The (k−1)·2⁶⁰/h₍ₖ₎ estimator over a finished sketch — ONE home for
    * the arithmetic so the batch column expression and the streaming
    * path (StreamingSketch) cannot drift. Below-k sketches saw every
    * distinct hash: exact count.
    */
  def estimate(k: Int, s: KmvSketch): Double =
    if (s.k_actual < k) s.k_actual.toDouble
    else (k - 1).toDouble * math.pow(2, 60) / s.hk.toDouble

  /** Per-group distinct estimate of `valueCol` (string-castable), keyed
    * by `groupCol`: (group, k_actual, hk, estimate). k_actual < k means
    * the group's distinct count was observed exactly.
    */
  def kmvDistinctByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         k: Int = 64): DataFrame = {
    val hashed = df.select(col(groupCol).cast("string").as("g"),
      TextOps.fingerprint64(col(valueCol).cast("string")).as("h"))
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    hashed.groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(Encoders.scalaLong)
      .agg(new KmvAggregator(k).toColumn.name("s"))
      .toDF(groupCol, "s")
      .select(col(groupCol), col("s.k_actual").as("k_actual"),
        col("s.hk").as("hk"),
        // column twin of [[estimate]] — same branches, same double ops
        // (the oracle SQL mirrors this expression; keep all three
        // in sync)
        when(col("s.k_actual") < k, col("s.k_actual").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
            / col("s.hk").cast("double"))
          .as("estimate"))
  }
}

/** Sketch summary: how many mins were kept and the k-th smallest. */
case class KmvSketch(k_actual: Int, hk: Long)
