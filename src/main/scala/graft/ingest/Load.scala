package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sinks — S4 full-rebuild overwrite and S5 upsert/MERGE emulation
  * (SURVEY.md §2.1; reference `scripts/ingest.py:61-101,220-240`).
  *
  * Vanilla Spark has no in-place MERGE; the idempotent-re-ingest contract
  * (`SOLUTION.md:312-325`) is met by recomputing the post-merge state:
  * rows of the existing table whose key does NOT appear in the incoming
  * batch (left_anti), unioned with the incoming batch — new keys insert,
  * existing keys take the incoming row's values, exactly the reference's
  * `ON CONFLICT(invoice_number) DO UPDATE`.
  *
  * Scale: the anti-join shuffles both sides on the key once (or neither,
  * if both tables are bucketed by the key on disk — the right layout for
  * a repeatedly-merged 100 TB fact). The union is shuffle-free.
  */
object Load {

  /** S5: MERGE-equivalent state: `existing ⟂ incoming ∪ incoming`. */
  def merge(existing: DataFrame, incoming: DataFrame,
            key: String): DataFrame =
    existing.join(incoming.select(col(key)), Seq(key), "left_anti")
      .unionByName(incoming)

  /** S4: deterministic full rebuild of the dimension (`ingest.py:221-236`
    * — DELETE + bulk INSERT each run). Parquet overwrite is the same
    * contract with an atomic directory commit.
    */
  def overwriteDim(dim: DataFrame, path: String): Unit =
    dim.write.mode("overwrite").parquet(path)

  /** S5 applied to a parquet table path (read-merge-rewrite). */
  def mergeInto(spark: org.apache.spark.sql.SparkSession, path: String,
                incoming: DataFrame, key: String): Unit = {
    val existing = spark.read.parquet(path)
    // materialize before overwriting the directory being read
    val merged = merge(existing, incoming, key).cache()
    merged.count()
    merged.write.mode("overwrite").parquet(path)
    merged.unpersist()
  }

  /** The 100 TB layout for the QUERY side of the fact: partition by month
    * of invoice_date, so the monthly-summary family's half-open month
    * range (F2) prunes to one partition directory and the past-due
    * cutoff scans only months ≤ as-of — the distributed analog of the
    * reference's `invoice_date` B-tree index
    * (`schema_template.sql:40-47`). PartitionPruneSpec asserts the scan's
    * partition filters.
    */
  def writePartitionedByMonth(invoices: DataFrame, path: String): Unit =
    invoices
      .withColumn("inv_month",
        date_format(col("invoice_date"), "yyyy-MM"))
      .write.mode("overwrite").partitionBy("inv_month").parquet(path)

  /** The 100 TB layout for a repeatedly-merged fact: store it BUCKETED on
    * the merge key. The anti-join then reads the existing side already
    * hash-partitioned — no shuffle of the (huge) stored table per
    * re-ingest; only the (small) incoming batch shuffles to match.
    * BucketedMergeSpec asserts the plan: one exchange, on the incoming
    * side only.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  /** Merge against a bucketed table, rewriting it in the same layout.
    * localCheckpoint truncates the lineage: the overwrite would otherwise
    * be rejected for reading the table it targets (a cache alone keeps
    * the table reference in the plan).
    */
  def mergeIntoBucketed(spark: org.apache.spark.sql.SparkSession,
                        table: String, incoming: DataFrame, key: String,
                        buckets: Int): Unit = {
    val merged = merge(spark.table(table), incoming, key)
      .localCheckpoint(eager = true)
    writeBucketed(merged, table, key, buckets)
  }
}
