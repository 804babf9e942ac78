package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables

/** The raw string-typed ingest substrate.
  *
  * The reference ingests a denormalized CSV whose 13 columns all arrive as
  * strings (`scripts/ingest.py:118-121`, header contract `ingest.py:126-172`).
  * The harness testdata is typed parquet, so this view deterministically
  * re-derives a "CSV-shaped" table — same column names, string values,
  * with the reference data's quirks injected at fixed row positions:
  * padded whitespace (T5), empty money (T1), unparseable money (T6),
  * empty due dates (T4), digitless terms (T3), empty contacts (T5/D2).
  *
  * Every generator below is a deterministic scalar expression over
  * `orders ⋈ customer`, expressed identically in the DuckDB oracle
  * (IngestCatalog.rawSql) — the substrate itself is oracle-checked.
  *
  * Scale: a projection over the fact scan joined to a broadcast dimension —
  * no shuffle; the quirk injection is pure per-row compute.
  */
object Raw {

  /** First digit of o_orderpriority ("1-URGENT".."5-LOW") — the terms
    * knob, as in Tables.invoices.
    */
  private def digit: Column =
    regexp_extract(col("o_orderpriority"), "(\\d+)", 1).cast("int")

  private def mod(n: Int): Column = col("o_orderkey") % n === 0

  def raw(s: SparkSession, d: String): DataFrame = {
    val money = col("o_totalprice").cast(Tables.Money).cast("string")
    val dueStr = concat(
      date_format(date_add(to_date(col("o_orderdate")), digit * 7),
        "MM/dd/yyyy"),
      lit(" 00:00"))
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
        col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey").as("row_id"),
        when(mod(7), concat(lit("  "), col("c_name"), lit(" ")))
          .otherwise(col("c_name")).as("CustomerName"),
        col("o_orderkey").cast("string").as("InvoiceNumber"),
        date_format(to_date(col("o_orderdate")), "MM/dd/yyyy")
          .as("InvoiceDate"),
        when(mod(11), lit(""))
          .otherwise(concat(lit("PO-"), col("o_orderkey").cast("string")))
          .as("CustomerPoNumber"),
        when(mod(113), lit("N/A")).when(mod(97), lit(""))
          .otherwise(concat(lit(" "), money, lit(" "))).as("BillTotal"),
        when(mod(89), lit(""))
          .otherwise(concat(col("o_custkey").cast("string"), lit(".75")))
          .as("Applied"),
        col("o_orderstatus").as("Status"),
        when(mod(53), lit("")).when(mod(127), lit("CAD")).otherwise(lit("USD"))
          .as("Currency"),
        when(mod(5), lit(""))
          .otherwise(concat(lit("Contact "), col("c_name"))).as("ContactName"),
        when(mod(3), lit(""))
          .otherwise(concat(lit("P-"), col("o_custkey").cast("string")))
          .as("ContactPhone"),
        when(mod(13), lit(""))
          .otherwise(concat(lower(regexp_replace(col("c_name"), "#", "")),
            lit("@example.com"))).as("ContactEmail"),
        when(mod(61), lit("Due on receipt"))
          .otherwise(concat(lit("Net "), (digit * 7).cast("string")))
          .as("CustomerTerms"),
        when(mod(41), lit("")).otherwise(dueStr).as("DueDate"))
  }
}
