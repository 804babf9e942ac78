package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Snapshot-level change-data-capture — the "what changed since
  * yesterday's run?" operator a daily-refresh corpus pipeline puts in
  * front of every expensive downstream stage (re-embedding, re-dedup,
  * re-indexing touch only the delta, never the full corpus). The
  * reference re-ingests its whole CSV every run
  * (`/root/reference/scripts/ingest.py:220-240`, full dim DELETE+INSERT
  * plus row-at-a-time fact upserts); this is the scale-out replacement:
  * diff two materialized snapshots into an explicit change feed.
  *
  * Payload comparison is by 60-bit md5 fingerprint
  * ([[TextOps.fingerprint64]]), not by value: the shuffle carries
  * (key, long) — 16 bytes/row — instead of the payload itself, which for
  * a document corpus is the difference between shuffling 16 B and 16 KB
  * per row. The md5 idiom keeps every verdict DuckDB-replicable.
  *
  * Scale shape: ONE full-outer sort-merge join keyed on the snapshot
  * key — both sides hash-partition on the key, co-partitioned deltas
  * never re-shuffle. Unchanged rows (the overwhelming majority of a
  * daily diff) are dropped before anything downstream sees them. This
  * is the CDC-feed shape table formats emit natively (Delta CDF,
  * Iceberg changelog); here it is derived from plain snapshots, so it
  * works over any pair of parquet directories.
  */
object Cdc {

  /** (key, change) with change ∈ added | removed | changed; unchanged
    * rows emit nothing. `payloadCol` is the value column whose
    * fingerprint defines row identity (pre-concat multiple columns for
    * composite payloads).
    */
  def snapshotDiff(prev: DataFrame, curr: DataFrame, keyCol: String,
                   payloadCol: String): DataFrame = {
    def fp(df: DataFrame, as: String) = df.select(
      col(keyCol), TextOps.fingerprint64(col(payloadCol)).as(as))
    fp(prev, "p_fp").join(fp(curr, "c_fp"), Seq(keyCol), "full_outer")
      .withColumn("change",
        when(col("p_fp").isNull, "added")
          .when(col("c_fp").isNull, "removed")
          .when(col("p_fp") =!= col("c_fp"), "changed"))
      .filter(col("change").isNotNull)
      .select(col(keyCol), col("change"))
  }
}
