package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Customer contact lookup with last-invoice recency — reference
  * `GET /customers/contact` (`app/api/customers.py:52-119`).
  *
  * Operators covered (SURVEY.md §2): F3 case-insensitive equality, A2
  * existence count (the 404 gate), J2 dim⟕fact left outer join (customers
  * with zero invoices appear with NULL last_seen_invoice_date), A4 grouped
  * MAX over the dim columns, O2 static name sort, O3 limit/offset.
  *
  * Scale: the dim side is filtered to the matched name(s) before the join,
  * so the left join streams the fact once against a tiny build side; the
  * grouped MAX is a hash agg keyed by the (small) matched-dim keys.
  */
object CustomerContact {

  /** A2: match count driving the reference's 404
    * (`app/api/customers.py:64-74`). 1-row DataFrame so it orace-checks.
    */
  def exists(customers: DataFrame, name: String,
             matchCol: String = "name"): DataFrame =
    customers.filter(lower(col(matchCol)) === lit(name.toLowerCase))
      .agg(count(lit(1)).as("n"))

  /** The contact page (`app/api/customers.py:77-99`): matched customers
    * ⟕ invoices, MAX(invoice_date) per customer grouped over the carried
    * dim columns (the reference groups by its 5 customer columns,
    * `customers.py:87-93` — pass them via `dimCols`), ordered by name.
    *
    * `matchCol` is the column the case-insensitive lookup runs against —
    * `name` in the reference; the harness catalog passes `segment` so the
    * lookup matches many customers and genuinely exercises grouping and
    * paging (substrate mapping, not reference semantics).
    *
    * The deterministic `id` tie-breaker on the sort is ours (SURVEY.md
    * §7.3 hard part 3); the reference's bare ORDER BY name is
    * planner-dependent across equal names.
    */
  def contacts(customers: DataFrame, invoices: DataFrame, name: String,
               matchCol: String = "name",
               dimCols: Seq[String] = Seq("segment", "acctbal"),
               limit: Int = 10, offset: Int = 0): DataFrame = {
    val groupCols = (Seq("id", "name") ++ dimCols).map(col)
    customers.filter(lower(col(matchCol)) === lit(name.toLowerCase))
      .join(invoices.select(col("customer_id"), col("invoice_date")),
        col("id") === col("customer_id"), "left_outer")
      .groupBy(groupCols: _*)
      .agg(max(col("invoice_date")).as("last_seen_invoice_date"))
      .orderBy(col("name").asc, col("id").asc)
      .offset(offset).limit(limit)
  }

  /** The reference's envelope quirk: `total` in the response is the PAGE
    * length, not the matched-customer count (`app/api/customers.py:118`).
    * Preserved verbatim — it is observable behavior.
    */
  def contactsEnvelope(page: DataFrame): (DataFrame, Long) =
    (page, page.count())
}
