package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.queries.Tables.Money

/** Monthly revenue summary — reference `GET /invoices/summary/month`
  * (`app/api/invoices.py:176-233`).
  *
  * Operators covered (SURVEY.md §2): F2 half-open month range, F3
  * case-insensitive name equality (optional), F5 conditional predicate
  * assembly, A3 ungrouped multi-agg with COALESCE null-fallbacks, C4
  * month-string parse, J1 fact⋈dim join.
  *
  * Quirk preserved on purpose (SURVEY.md §2.6): `MIN(currency)` — a month
  * mixing currencies reports the lexicographic minimum while summing across
  * all of them; that is the reference's observable behavior
  * (`app/api/invoices.py:216`).
  *
  * Scale: the month predicate is two literal date comparisons pushed into
  * the parquet scan (partition-prunable if the fact is date-partitioned);
  * the aggregation is a partial+final hash agg over zero grouping keys —
  * one row out per partition, no data shuffle beyond the final reduce.
  */
object MonthlySummary {

  /** C4: `"yyyy-MM"` → [first day, first day of next month) half-open
    * bounds (`app/api/invoices.py:189-196`, incl. the December wrap).
    * Invalid month strings surface as a null bound → empty result; the
    * HTTP-400 contract belongs to an API edge, not the engine.
    */
  def monthBounds(month: String): (Column, Column) = {
    val first = to_date(lit(month), "yyyy-MM")
    (first, add_months(first, 1))
  }

  /** One-pass rollup over the filtered fact⋈dim join
    * (`app/api/invoices.py:200-233`). `invoices` needs invoice_date,
    * bill_total, currency, customer_id; `customers` needs id, name.
    */
  def summary(invoices: DataFrame, customers: DataFrame, month: String,
              customerName: Option[String] = None): DataFrame = {
    val (first, next) = monthBounds(month)
    // F5: WHERE conjunction assembled conditionally (`invoices.py:200-210`)
    val preds: Seq[Column] =
      Seq(col("invoice_date") >= first, col("invoice_date") < next) ++
        customerName.map(n => lower(col("name")) === lit(n.toLowerCase))
    invoices
      // prune the fact side to what the rollup needs BEFORE the join —
      // also avoids capturing an unrelated fact-side `name` column
      .select(col("customer_id"), col("invoice_date"), col("bill_total"),
        col("currency"))
      .transform(f => Joins.dimJoin(f,
        customers.select(col("id"), col("name")),
        col("customer_id") === col("id")))
      .filter(preds.reduce(_ && _))
      // A3 (`invoices.py:212-222`) + Python-side fallbacks (224-226)
      .agg(
        coalesce(sum(col("bill_total")), lit(BigDecimal(0)))
          .cast(Money).as("sum_bill_total"),
        count(lit(1)).as("count_invoices"),
        coalesce(min(col("currency")), lit("USD")).as("currency"))
      .select(lit(month).as("month"), col("currency"),
        col("sum_bill_total"), col("count_invoices"))
  }
}
