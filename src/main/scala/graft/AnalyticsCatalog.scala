package graft

import org.apache.spark.sql.functions._
import graft.query.Analytics
import graft.queries.Tables
import graft.streaming.Events

/** General-analytics operator catalog: window functions, set operations,
  * ROLLUP, pivot (query/Analytics.scala) — surface beyond the reference,
  * each with an exact DuckDB twin.
  */
object AnalyticsCatalog {
  type Q = RelationalCatalog.Q
  private val eventsSql = ScaleCatalog.eventsSql
  private val invSql = RelationalCatalog.invSql
  private val custSql = RelationalCatalog.custSql

  val queries: Map[String, Q] = Map(
    // Window rank: top-3 users by exact total per event type.
    "q_topn_per_group" -> ((s, d) =>
      Analytics.topNPerGroup(Events.typed(Tables.events(s, d)))),

    // Window running frame: cumulative total per user over event time.
    "q_running_totals" -> ((s, d) =>
      Analytics.runningTotals(Events.typed(Tables.events(s, d)))),

    // INTERSECT / EXCEPT over customer ids, tagged.
    "q_set_ops" -> ((s, d) =>
      Analytics.segmentSetOps(Tables.customers(s, d), Tables.invoices(s, d),
        "BUILDING", "1997-03-01", "1997-04-01")),

    // ROLLUP subtotals over (currency, status).
    "q_rollup" -> ((s, d) =>
      Analytics.revenueRollup(Tables.invoices(s, d))),

    // Pivot: segment rows × fixed status columns.
    "q_status_pivot" -> ((s, d) =>
      Analytics.statusPivot(Tables.invoices(s, d), Tables.customers(s, d)))
  )

  val oracleSql: Map[String, String] = Map(
    "q_topn_per_group" ->
      s"""WITH $eventsSql,
         |t AS (
         |  SELECT event_type, user_id,
         |    CAST(ROUND(SUM(v), 2) AS DECIMAL(18,2)) AS total,
         |    COUNT(*) AS n_events
         |  FROM e GROUP BY 1, 2),
         |r AS (
         |  SELECT *, CAST(row_number() OVER (
         |    PARTITION BY event_type ORDER BY total DESC, user_id) AS INT) AS rnk
         |  FROM t)
         |SELECT event_type, user_id, total, n_events, rnk
         |FROM r WHERE rnk <= 3""".stripMargin,

    "q_running_totals" ->
      s"""WITH $eventsSql
         |SELECT user_id, event_id, ts,
         |  CAST(ROUND(SUM(v) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING), 2)
         |    AS DECIMAL(18,2)) AS running_total
         |FROM e""".stripMargin,

    "q_set_ops" ->
      s"""WITH cust AS ($custSql), inv AS ($invSql),
         |seg AS (SELECT id FROM cust WHERE segment = 'BUILDING'),
         |act AS (
         |  SELECT DISTINCT customer_id AS id FROM inv
         |  WHERE invoice_date >= DATE '1997-03-01'
         |    AND invoice_date < DATE '1997-04-01')
         |SELECT id, 'both' AS op
         |FROM (SELECT id FROM seg INTERSECT SELECT id FROM act)
         |UNION ALL
         |SELECT id, 'seg_only' AS op
         |FROM (SELECT id FROM seg EXCEPT SELECT id FROM act)""".stripMargin,

    "q_rollup" ->
      s"""WITH inv AS ($invSql)
         |SELECT currency, status, COUNT(*) AS n,
         |  CAST(ROUND(SUM(bill_total), 2) AS DECIMAL(18,2)) AS revenue
         |FROM inv GROUP BY ROLLUP (currency, status)""".stripMargin,

    "q_status_pivot" ->
      s"""WITH inv AS ($invSql)
         |SELECT c.c_mktsegment AS segment,
         |  COUNT(*) FILTER (WHERE status = 'F') AS F,
         |  COUNT(*) FILTER (WHERE status = 'O') AS O,
         |  COUNT(*) FILTER (WHERE status = 'P') AS P
         |FROM inv JOIN customer c ON inv.customer_id = c.c_custkey
         |GROUP BY 1""".stripMargin
  )
}
