package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.query.PastDue

/** The reference-parity operator catalog over the harness substrate
  * (SURVEY.md §2 rows → named queries + DuckDB oracle twins).
  *
  * Conventions shared by every entry (SURVEY.md §7.3):
  *  - money: `double` parquet cols cast to DECIMAL(18,2) at scan, summed
  *    exactly, one final rounding cast — both engines agree bit-for-bit;
  *  - dates: timestamps cast to DATE before compare/arith;
  *  - determinism: every ORDER BY carries a unique tie-breaker, every
  *    LIMIT/OFFSET sits on a total order;
  *  - every aggregate/computed column aliased identically in Spark and SQL.
  */
object RelationalCatalog {
  import Tables.Money
  private val AsOf = SparkEntry.AsOf

  type Q = (SparkSession, String) => DataFrame

  /** SQL fragment: the invoices view over `orders` (Tables.invoices twin). */
  private val invSql =
    """SELECT o_orderkey AS invoice_number, o_custkey AS customer_id,
      |  CAST(o_orderdate AS DATE) AS invoice_date,
      |  CAST(o_totalprice AS DECIMAL(18,2)) AS bill_total,
      |  o_orderstatus AS status, o_orderpriority AS customer_terms,
      |  7 * CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS INT) AS terms_days,
      |  CAST(o_orderdate AS DATE)
      |    + 7 * CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS INT) AS due_date
      |FROM orders""".stripMargin

  /** SQL fragment: per-invoice applied payments (Tables.applied twin).
    * ROUND before the final cast: DuckDB's decimal downcast truncates while
    * Spark's rounds HALF_UP; DuckDB ROUND is half-away-from-zero, which
    * matches HALF_UP on these positive sums.
    */
  private def appliedSql(asOf: String) =
    s"""SELECT l_orderkey AS invoice_number,
       |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
       |       * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DECIMAL(18,2)) AS applied
       |FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '$asOf'
       |GROUP BY 1""".stripMargin

  private def invoicesWithApplied(s: SparkSession, d: String): DataFrame =
    Tables.invoices(s, d)
      .join(Tables.applied(s, d, AsOf), Seq("invoice_number"), "left_outer")

  // ---------------------------------------------------------------- queries

  val queries: Map[String, Q] = Map(
    // Flagship: F1 ∘ J1 ∘ C1/C2 ∘ O1 (+ deterministic tie-break). The page
    // itself (O3) is exercised by q_past_due_page.
    "q_past_due" -> ((s, d) =>
      PastDue.report(invoicesWithApplied(s, d), Tables.customers(s, d),
        lit(AsOf).cast("date"))),

    // O3 LIMIT/OFFSET over the totally-ordered report (TakeOrderedAndProject).
    "q_past_due_page" -> ((s, d) =>
      PastDue.page(
        PastDue.report(invoicesWithApplied(s, d), Tables.customers(s, d),
          lit(AsOf).cast("date")),
        limit = 50, offset = 10)),

    // A1: count-before-page scalar (as a 1-row DataFrame for the oracle).
    "q_past_due_total" -> ((s, d) => {
      import s.implicits._
      Seq(PastDue.total(invoicesWithApplied(s, d), lit(AsOf).cast("date")))
        .toDF("total")
    })
  )

  // ------------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "q_past_due" ->
      s"""WITH inv AS ($invSql), app AS (${appliedSql(AsOf)}),
         |pd AS (
         |  SELECT inv.*, app.applied FROM inv LEFT JOIN app USING (invoice_number)
         |  WHERE COALESCE(bill_total, 0) - COALESCE(applied, 0) > 0
         |    AND due_date < DATE '$AsOf')
         |SELECT pd.invoice_number, c.c_name AS customer_name, pd.invoice_date,
         |  pd.due_date, pd.bill_total, pd.applied,
         |  CAST(GREATEST(COALESCE(pd.bill_total,0) - COALESCE(pd.applied,0), 0)
         |       AS DECIMAL(18,2)) AS outstanding,
         |  CAST(datediff('day', pd.due_date, DATE '$AsOf') AS INT) AS days_past_due
         |FROM pd JOIN customer c ON pd.customer_id = c.c_custkey
         |ORDER BY pd.due_date, pd.invoice_number""".stripMargin,

    "q_past_due_page" ->
      s"""WITH inv AS ($invSql), app AS (${appliedSql(AsOf)}),
         |pd AS (
         |  SELECT inv.*, app.applied FROM inv LEFT JOIN app USING (invoice_number)
         |  WHERE COALESCE(bill_total, 0) - COALESCE(applied, 0) > 0
         |    AND due_date < DATE '$AsOf')
         |SELECT pd.invoice_number, c.c_name AS customer_name, pd.invoice_date,
         |  pd.due_date, pd.bill_total, pd.applied,
         |  CAST(GREATEST(COALESCE(pd.bill_total,0) - COALESCE(pd.applied,0), 0)
         |       AS DECIMAL(18,2)) AS outstanding,
         |  CAST(datediff('day', pd.due_date, DATE '$AsOf') AS INT) AS days_past_due
         |FROM pd JOIN customer c ON pd.customer_id = c.c_custkey
         |ORDER BY pd.due_date, pd.invoice_number
         |LIMIT 50 OFFSET 10""".stripMargin,

    "q_past_due_total" ->
      s"""WITH inv AS ($invSql), app AS (${appliedSql(AsOf)})
         |SELECT COUNT(*) AS total
         |FROM inv LEFT JOIN app USING (invoice_number)
         |WHERE COALESCE(bill_total, 0) - COALESCE(applied, 0) > 0
         |  AND due_date < DATE '$AsOf'""".stripMargin
  )
}
