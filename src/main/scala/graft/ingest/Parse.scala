package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Tables.Money

/** Ingest-time scalar transforms T1-T5 (SURVEY.md §2.3) — the reference's
  * per-row Python parser helpers (`scripts/ingest.py:24-58,126-172`)
  * re-expressed as codegen'd column expressions. No UDFs: every helper is
  * a composition of built-ins, so whole-stage codegen keeps the parse in
  * one fused pass over the scan.
  *
  * Failure semantics are permissive (`try_*`): an unparseable value yields
  * NULL and is picked up by the T6 quarantine (`Normalize.quarantine`)
  * rather than failing the job — mirroring the reference's per-row
  * try/except (`ingest.py:124,191-200`).
  */
object Parse {

  /** T1 money parse (`ingest.py:24-28`): strip; empty → Decimal(0); exact
    * decimal otherwise; junk → NULL (quarantined downstream).
    */
  def money(c: Column): Column =
    coalesce(nullif(trim(c), lit("")), lit("0"))
      .try_cast(Money)

  /** T2 date parse with time-strip (`ingest.py:31-46`): strip, token
    * before first space, then `M/d/yyyy` falling back to `M/d/yy`.
    *
    * Two-digit years: the reference's Python `%y` pivots 69→1969; Spark's
    * strict `yy` maps to 20yy. The reference data spans 2024-2025 where
    * both agree (SURVEY.md §7.3 hard part 2); dates outside 2000-2068
    * must use the 4-digit form.
    */
  def date(c: Column): Column = {
    val token = nullif(element_at(split(trim(c), " "), 1), lit(""))
    coalesce(
      try_to_timestamp(token, lit("M/d/yyyy")),
      try_to_timestamp(token, lit("M/d/yy"))
    ).cast("date")
  }

  /** T3 terms-days extract (`ingest.py:49-58`): first integer in the
    * terms string; no digits / empty → NULL.
    */
  def termsDays(c: Column): Column =
    nullif(regexp_extract(trim(c), "(\\d+)", 1), lit("")).try_cast("int")

  /** T5 trim + empty→NULL (`ingest.py:162-172`). */
  def trimNull(c: Column): Column = nullif(trim(c), lit(""))

  /** T5 quirk: `customer_po_number` is trimmed but KEEPS the empty string
    * (`ingest.py:166` has no falsy-guard). Preserved: observable behavior.
    * coalesce: Spark's CSV reader yields NULL for an empty unquoted field
    * where Python's csv yields "" — normalize to the reference's "".
    */
  def trimKeepEmpty(c: Column): Column = coalesce(trim(c), lit(""))

  /** T4 due-date derivation (`ingest.py:155-158`): explicit DueDate wins;
    * else invoice_date + terms_days (column-valued date_add).
    */
  def deriveDueDate(dueRaw: Column, invoiceDate: Column,
                    termsDays: Column): Column =
    coalesce(dueRaw, date_add(invoiceDate, termsDays))

  /** The full parsed view over a raw CSV-shaped frame (column contract =
    * the reference CSV header, `ingest.py:126-172`). `row_id` must already
    * exist (file order for CSV sources; see Normalize for why it matters).
    */
  def parsed(raw: DataFrame): DataFrame =
    raw.select(
      col("row_id"),
      trim(col("CustomerName")).as("name"),
      trim(col("InvoiceNumber")).as("invoice_number"),
      date(col("InvoiceDate")).as("invoice_date"),
      money(col("BillTotal")).as("bill_total"),
      money(col("Applied")).as("applied"),
      trimNull(col("Status")).as("status"),
      trimNull(col("Currency")).as("currency"),
      trimNull(col("ContactName")).as("contact_name"),
      trimNull(col("ContactPhone")).as("contact_phone"),
      trimNull(col("ContactEmail")).as("contact_email"),
      trimNull(col("CustomerTerms")).as("customer_terms"),
      trimKeepEmpty(col("CustomerPoNumber")).as("customer_po_number"),
      termsDays(col("CustomerTerms")).as("terms_days"),
      date(col("DueDate")).as("due_date_raw"))
    .withColumn("due_date",
      deriveDueDate(col("due_date_raw"), col("invoice_date"),
        col("terms_days")))
}
