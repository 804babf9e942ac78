package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Driver-canonical output typing for the differential gate.
  *
  * The harness hashes result values through a float-rendering path, so a
  * DECIMAL output whose value carries a trailing zero (`2494.00` rendered
  * `2494.0`) hash-mismatches even when content is identical on both engines
  * (proven in round 2: 24/61 queries, all content-verified equal). DuckDB
  * additionally widens `SUM(INT)` to HUGEINT where Spark emits BIGINT.
  *
  * Fix: keep all decimal arithmetic INTERNAL (HALF_UP money semantics are
  * unchanged — see `Tables.Money`), but make every query's FINAL projection
  * carry DOUBLE instead of DECIMAL, and BIGINT instead of HUGEINT, on BOTH
  * sides. decimal→double is a correctly-rounded single conversion in both
  * engines (unscaled longs here stay far below 2^53), so the two sides
  * produce bit-identical doubles.
  *
  *  - Spark side: [[spark]] casts every top-level DecimalType column of a
  *    result to DoubleType, by schema inspection — no per-query list.
  *  - Oracle side: [[oracle]] wraps the SQL with DuckDB's
  *    `SELECT * REPLACE (CAST(c AS DOUBLE) AS c)`, driven by [[retyped]].
  *
  * `tools/check.py` fails any output that still carries DECIMAL/HUGEINT on
  * either side, so a drift between [[retyped]] and a catalog's real output
  * types is caught locally before the driver sees it.
  */
object Canonical {

  /** Oracle output columns that need a final re-cast, per query.
    * "d" → CAST AS DOUBLE (DECIMAL outputs), "l" → CAST AS BIGINT (HUGEINT
    * from DuckDB's SUM over INT). Spark-side needs no such list — it
    * inspects the DataFrame schema directly.
    */
  private val retyped: Map[String, Seq[(String, String)]] = {
    def d(cols: String*): Seq[(String, String)] = cols.map(_ -> "DOUBLE")
    Map(
      "q_asof_join"                   -> d("purchase_value"),
      "q_click_attribution"           -> d("purchase_value"),
      "q_cube"                        -> d("revenue"),
      "q_customer_contact"            -> d("acctbal"),
      "q_customer_list"               -> d("acctbal"),
      "q_customer_lookup"             -> d("acctbal"),
      "q_dedup_embedding"             -> d("score"),
      "q_events_json"                 -> Seq("sum_k" -> "BIGINT"),
      "q_events_session"              -> d("total"),
      "q_events_sliding"              -> d("total"),
      "q_events_tumbling"             -> d("total"),
      "q_invoice_lookup"              -> d("bill_total"),
      "q_knn_brute"                   -> d("score"),
      "q_knn_ivf"                     -> d("score"),
      "q_knn_ivf_learned"             -> d("score"),
      "q_knn_lsh"                     -> d("score"),
      "q_sql_knn_lsh"                 -> d("score"),
      "q_knn_multiprobe"              -> d("score"),
      "q_mutual_knn"                  -> d("score"),
      "q_knn_ivf_sq8"                 -> d("score"),
      "q_knn_pq"                      -> d("score"),
      "q_knn_ivf_pq"                  -> d("score"),
      "q_knn_ivf_pq_residual"         -> d("score"),
      "q_knn_matryoshka"              -> d("score"),
      "q_knn_binary_rerank"           -> d("score"),
      "q_bm25"                        -> d("score"),
      "q_ql_dirichlet"                -> d("score"),
      "q_sql_bm25"                    -> d("score"),
      "q_agg_merge"                   -> d("psum"),
      "q_knn_text"                    -> d("score"),
      "q_hard_negatives"              -> d("score"),
      "q_knn_quantized"               -> d("score"),
      "q_knn_quantized_rerank"        -> d("score"),
      "q_knn_topk_agg"                -> d("score"),
      "q_monthly_summary"             -> d("sum_bill_total"),
      "q_monthly_summary_by_customer" -> d("sum_bill_total"),
      "q_monthly_summary_empty"       -> d("sum_bill_total"),
      "q_parse_money"                 -> d("bill_total", "applied"),
      "q_past_due"                    -> d("bill_total", "applied", "outstanding"),
      "q_past_due_desc"               -> d("bill_total", "applied", "outstanding"),
      "q_past_due_page"               -> d("bill_total", "applied", "outstanding"),
      "q_grouping_sets"               -> d("revenue"),
      "q_percent_rank"                -> d("bill_total"),
      "q_quantile_sketch"             -> d("p", "est"),
      "q_rate_limit"                  -> d("v"),
      "q_rolling_anomaly"             -> d("x"),
      "q_quartiles"                   -> d("bill_total"),
      "q_quartiles_by_currency"       -> d("bill_total"),
      "q_resample_ffill"              -> d("state_v"),
      "q_semantic_dedup"              -> d("score"),
      "q_skew_join"                   -> d("revenue"),
      "q_semantic_dedup_2level"       -> d("score"),
      "q_rollup"                      -> d("revenue"),
      "q_running_totals"              -> d("running_total"),
      "q_sql_monthly"                 -> d("sum_bill_total"),
      "q_tfidf"                       -> d("score"),
      "q_topn_per_group"              -> d("total"),
      "q_trailing_7d"                 -> d("trailing_7d"),
      "q_upsert"                      -> d("bill_total"),
      "q_winsorize"                   -> d("lo", "hi")
    )
  }

  /** Cast every top-level DECIMAL column to DOUBLE; no-op otherwise. */
  def spark(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType])) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast(DoubleType).as(f.name)
        case _              => col(f.name)
      }
    }.toIndexedSeq: _*)

  /** Re-type the oracle's output columns to match [[spark]]'s. */
  def oracle(name: String, sql: String): String =
    retyped.get(name) match {
      case None => sql
      case Some(cols) =>
        val repl = cols
          .map { case (c, t) => s"CAST($c AS $t) AS $c" }
          .mkString(", ")
        s"SELECT * REPLACE ($repl) FROM (\n$sql\n) __canon"
    }
}
