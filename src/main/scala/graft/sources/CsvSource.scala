package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 — the reference's CSV source contract (`scripts/ingest.py:118-121`):
  * header-keyed rows, every value a string, columns addressed by exact
  * name (`ingest.py:126-172`). Schema is DECLARED, never inferred —
  * inference would silently type-drift the money/date columns the parse
  * layer owns (SURVEY.md §1.1).
  *
  * PERMISSIVE mode + a corrupt-record column is the file-level half of
  * T6 quarantine (malformed CSV lines); cast-level quarantine is
  * `Normalize.quarantine`.
  */
object CsvSource {

  val Columns: Seq[String] = Seq(
    "CustomerName", "InvoiceNumber", "InvoiceDate", "CustomerPoNumber",
    "BillTotal", "Applied", "Status", "Currency", "ContactName",
    "ContactPhone", "ContactEmail", "CustomerTerms", "DueDate")

  val arRawSchema: StructType = StructType(
    Columns.map(c => StructField(c, StringType, nullable = true)) :+
      StructField("_corrupt_record", StringType, nullable = true))

  /** Read a reference-shaped CSV with an input-order `row_id`.
    *
    * `row_id` ordering caveat (SURVEY.md §7.3 hard part 4): monotonic ids
    * are ordered WITHIN a partition; "file order" across partitions holds
    * only for a single-split file. The reference's first-seen semantics
    * are only well-defined for exactly that case — a bigger file needs an
    * explicit ordering column in the data itself.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(arRawSchema)
      .csv(path)
      .withColumn("row_id", monotonically_increasing_id())

  /** File-level quarantine companion (T6): lines the CSV parser itself
    * could not form into rows. Spark disallows projecting ONLY the
    * corrupt-record column from a raw CSV scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the
    * frame returned by `read` before calling this, as the ingest job does
    * anyway.
    */
  def corruptLines(raw: DataFrame): DataFrame =
    raw.filter(col("_corrupt_record").isNotNull)
      .select(col("row_id"), col("_corrupt_record"))
}
