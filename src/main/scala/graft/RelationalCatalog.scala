package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.Tables
import graft.query.{CustomerContact, Lookups, MonthlySummary, PastDue, Serialize}

/** The reference-parity operator catalog over the harness substrate
  * (SURVEY.md §2 rows → named queries + DuckDB oracle twins).
  *
  * Conventions shared by every entry (SURVEY.md §7.3):
  *  - money: `double` parquet cols cast to DECIMAL(18,2) at scan, summed
  *    exactly, one final rounding cast, oracle ROUNDs before any narrowing
  *    decimal cast (DuckDB truncates, Spark rounds HALF_UP);
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
  private[graft] val invSql =
    """SELECT o_orderkey AS invoice_number, o_custkey AS customer_id,
      |  CAST(o_orderdate AS DATE) AS invoice_date,
      |  CAST(o_totalprice AS DECIMAL(18,2)) AS bill_total,
      |  o_orderstatus AS status, o_orderstatus AS currency,
      |  o_orderpriority AS customer_terms,
      |  7 * CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS INT) AS terms_days,
      |  CAST(o_orderdate AS DATE)
      |    + 7 * CAST(regexp_extract(o_orderpriority, '(\d+)', 1) AS INT) AS due_date
      |FROM orders""".stripMargin

  /** SQL fragment: the customers dimension view (Tables.customers twin). */
  private[graft] val custSql =
    """SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
      |  CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal
      |FROM customer""".stripMargin

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

  /** Oracle twin of the past-due report body: CTEs + the select list over
    * the filtered/joined past-due rows, shared by report/page/serialized
    * variants. `selectList` chooses the output shaping.
    */
  private def pastDueSql(selectList: String, tail: String = "") =
    s"""WITH inv AS ($invSql), app AS (${appliedSql(AsOf)}),
       |pd AS (
       |  SELECT inv.*, app.applied FROM inv LEFT JOIN app USING (invoice_number)
       |  WHERE COALESCE(bill_total, 0) - COALESCE(applied, 0) > 0
       |    AND due_date < DATE '$AsOf')
       |SELECT $selectList
       |FROM pd JOIN customer c ON pd.customer_id = c.c_custkey
       |ORDER BY pd.due_date, pd.invoice_number$tail""".stripMargin

  private val pastDueCols =
    s"""pd.invoice_number, c.c_name AS customer_name, pd.invoice_date,
       |  pd.due_date, pd.bill_total, pd.applied,
       |  CAST(GREATEST(COALESCE(pd.bill_total,0) - COALESCE(pd.applied,0), 0)
       |       AS DECIMAL(18,2)) AS outstanding,
       |  pd.currency, pd.status,
       |  CAST(datediff('day', pd.due_date, DATE '$AsOf') AS INT) AS days_past_due""".stripMargin

  private val pastDueColsSerialized =
    s"""pd.invoice_number, c.c_name AS customer_name,
       |  CAST(pd.invoice_date AS VARCHAR) AS invoice_date,
       |  CAST(pd.due_date AS VARCHAR) AS due_date,
       |  CAST(pd.bill_total AS VARCHAR) AS bill_total,
       |  CAST(pd.applied AS VARCHAR) AS applied,
       |  CAST(CAST(GREATEST(COALESCE(pd.bill_total,0) - COALESCE(pd.applied,0), 0)
       |       AS DECIMAL(18,2)) AS VARCHAR) AS outstanding,
       |  pd.currency, pd.status,
       |  CAST(datediff('day', pd.due_date, DATE '$AsOf') AS INT) AS days_past_due""".stripMargin

  /** Oracle twin of the monthly summary (MonthlySummary.summary). */
  private def summarySql(month: String, nextMonth: String,
                         nameFilter: String = "") =
    s"""WITH inv AS ($invSql)
       |SELECT '$month' AS month,
       |  COALESCE(MIN(currency), 'USD') AS currency,
       |  CAST(ROUND(COALESCE(SUM(bill_total), 0), 2) AS DECIMAL(18,2)) AS sum_bill_total,
       |  COUNT(*) AS count_invoices
       |FROM inv JOIN customer c ON inv.customer_id = c.c_custkey
       |WHERE invoice_date >= DATE '$month-01'
       |  AND invoice_date < DATE '$nextMonth-01'$nameFilter""".stripMargin

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

    // O1 descending branch: sort=due_date.desc page (the reference's
    // other sort arm, `app/api/invoices.py:61-65`).
    "q_past_due_desc" -> ((s, d) =>
      PastDue.page(
        PastDue.report(invoicesWithApplied(s, d), Tables.customers(s, d),
          lit(AsOf).cast("date"), descending = true),
        limit = 20, offset = 0)),

    // A1: count-before-page scalar (as a 1-row DataFrame for the oracle).
    "q_past_due_total" -> ((s, d) => {
      import s.implicits._
      Seq(PastDue.total(invoicesWithApplied(s, d), lit(AsOf).cast("date")))
        .toDF("total")
    }),

    // F2 ∘ F5 ∘ A3 ∘ C4: monthly rollup, no name filter.
    "q_monthly_summary" -> ((s, d) =>
      MonthlySummary.summary(Tables.invoices(s, d), Tables.customers(s, d),
        "1997-03")),

    // + F3: case-insensitive customer-name filter (param deliberately
    // lowercased vs the stored 'Customer#000001108').
    "q_monthly_summary_by_customer" -> ((s, d) =>
      MonthlySummary.summary(Tables.invoices(s, d), Tables.customers(s, d),
        "1997-03", Some("cUstomer#000001108"))),

    // A3 null-fallback branch: empty month → 0 / 'USD' / 0 via COALESCE.
    "q_monthly_summary_empty" -> ((s, d) =>
      MonthlySummary.summary(Tables.invoices(s, d), Tables.customers(s, d),
        "2030-01")),

    // A2: existence-count 404 gate (case-insensitive, matches 302 rows).
    "q_customer_exists" -> ((s, d) =>
      CustomerContact.exists(Tables.customers(s, d), "BUILDing", "segment")),

    // F3 ∘ J2 ∘ A4 ∘ O2 ∘ O3: contact page. matchCol=segment is the
    // substrate mapping so >1 customer matches (see CustomerContact doc).
    "q_customer_contact" -> ((s, d) =>
      CustomerContact.contacts(Tables.customers(s, d), Tables.invoices(s, d),
        "builDING", "segment", Seq("segment", "acctbal"),
        limit = 10, offset = 2)),

    // F4 ∘ J1: single-invoice detail.
    "q_invoice_lookup" -> ((s, d) =>
      Lookups.invoiceByNumber(Tables.invoices(s, d), Tables.customers(s, d), 7L)),

    // F4: dimension point lookup.
    "q_customer_lookup" -> ((s, d) =>
      Lookups.customerById(Tables.customers(s, d), 42L)),

    // O2: full customer list ordered by name.
    "q_customer_list" -> ((s, d) =>
      Lookups.customerList(Tables.customers(s, d))),

    // S6: response-shape serialization of the past-due page (money → 2-dp
    // strings, dates → ISO strings).
    "q_serialize_page" -> ((s, d) =>
      Serialize.jsonShape(
        PastDue.page(
          PastDue.report(invoicesWithApplied(s, d), Tables.customers(s, d),
            lit(AsOf).cast("date")),
          limit = 50, offset = 10),
        moneyCols = Seq("bill_total", "applied", "outstanding"),
        dateCols = Seq("invoice_date", "due_date")))
  )

  // ------------------------------------------------------------- oracle SQL

  val oracleSql: Map[String, String] = Map(
    "q_past_due" -> pastDueSql(pastDueCols),

    "q_past_due_page" -> pastDueSql(pastDueCols, "\nLIMIT 50 OFFSET 10"),

    "q_past_due_desc" ->
      s"""WITH inv AS ($invSql), app AS (${appliedSql(AsOf)}),
         |pd AS (
         |  SELECT inv.*, app.applied FROM inv LEFT JOIN app USING (invoice_number)
         |  WHERE COALESCE(bill_total, 0) - COALESCE(applied, 0) > 0
         |    AND due_date < DATE '$AsOf')
         |SELECT $pastDueCols
         |FROM pd JOIN customer c ON pd.customer_id = c.c_custkey
         |ORDER BY pd.due_date DESC, pd.invoice_number
         |LIMIT 20""".stripMargin,

    "q_past_due_total" ->
      s"""WITH inv AS ($invSql), app AS (${appliedSql(AsOf)})
         |SELECT COUNT(*) AS total
         |FROM inv LEFT JOIN app USING (invoice_number)
         |WHERE COALESCE(bill_total, 0) - COALESCE(applied, 0) > 0
         |  AND due_date < DATE '$AsOf'""".stripMargin,

    "q_monthly_summary" -> summarySql("1997-03", "1997-04"),

    "q_monthly_summary_by_customer" -> summarySql("1997-03", "1997-04",
      "\n  AND lower(c.c_name) = 'customer#000001108'"),

    "q_monthly_summary_empty" -> summarySql("2030-01", "2030-02"),

    "q_customer_exists" ->
      """SELECT COUNT(*) AS n FROM customer
        |WHERE lower(c_mktsegment) = 'building'""".stripMargin,

    "q_customer_contact" ->
      s"""WITH inv AS ($invSql)
         |SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment,
         |  CAST(c_acctbal AS DECIMAL(18,2)) AS acctbal,
         |  MAX(inv.invoice_date) AS last_seen_invoice_date
         |FROM customer c LEFT JOIN inv ON c.c_custkey = inv.customer_id
         |WHERE lower(c_mktsegment) = 'building'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY name, id
         |LIMIT 10 OFFSET 2""".stripMargin,

    "q_invoice_lookup" ->
      s"""WITH inv AS ($invSql)
         |SELECT inv.*, c.c_name AS customer_name
         |FROM inv JOIN customer c ON inv.customer_id = c.c_custkey
         |WHERE invoice_number = 7""".stripMargin,

    "q_customer_lookup" ->
      s"""WITH cust AS ($custSql)
         |SELECT * FROM cust WHERE id = 42""".stripMargin,

    "q_customer_list" ->
      s"""WITH cust AS ($custSql)
         |SELECT * FROM cust ORDER BY name, id""".stripMargin,

    "q_serialize_page" -> pastDueSql(pastDueColsSerialized,
      "\nLIMIT 50 OFFSET 10")
  )
}
