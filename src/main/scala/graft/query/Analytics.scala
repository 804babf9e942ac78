package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Tables.Money

/** General analytics operators beyond the reference surface (the
  * reference has no window functions, set ops, or grouping sets —
  * SURVEY.md §2.9): top-N per group, running totals, set algebra,
  * ROLLUP subtotals, pivot. Each is a declarative plan with an exact
  * DuckDB twin; money stays exact decimal throughout.
  *
  * Scale: the windows partition by their group key (event_type /
  * user_id) — state is bounded per key and shuffles once on that key;
  * ROLLUP/pivot are single hash aggregates with map-side partials.
  */
object Analytics {

  /** Top-N contributors per group: rank users by exact total within each
    * event_type (deterministic id tie-break).
    */
  def topNPerGroup(events: DataFrame, n: Int = 3): DataFrame = {
    val totals = events.groupBy(col("event_type"), col("user_id"))
      .agg(sum(col("v")).cast(Money).as("total"), count(lit(1)).as("n_events"))
    totals.withColumn("rnk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("total").desc, col("user_id").asc)))
      .filter(col("rnk") <= n)
      .select(col("event_type"), col("user_id"), col("total"),
        col("n_events"), col("rnk"))
  }

  /** Running cumulative total per user over event time (ROWS frame,
    * event_id tie-break so equal timestamps accumulate identically in
    * any engine).
    */
  def runningTotals(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"), col("ts"),
      sum(col("v")).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(Money).as("running_total"))

  /** Set algebra over customer ids: customers in `segment` INTERSECT /
    * EXCEPT customers having invoices in [from, until), tagged rows.
    */
  def segmentSetOps(customers: DataFrame, invoices: DataFrame,
                    segment: String, from: String, until: String): DataFrame = {
    val inSeg = customers.filter(col("segment") === lit(segment))
      .select(col("id"))
    val active = invoices
      .filter(col("invoice_date") >= lit(from).cast("date") &&
        col("invoice_date") < lit(until).cast("date"))
      .select(col("customer_id").as("id"))
    inSeg.intersect(active).withColumn("op", lit("both"))
      .unionByName(inSeg.except(active).withColumn("op", lit("seg_only")))
  }

  /** Quantile bucketing by value: exact quartile boundaries
    * (percentile_disc — the SQL-standard "smallest value with cumulative
    * distribution ≥ p") computed in ONE aggregate, broadcast as a 1-row
    * frame, buckets assigned with indicator sums in the same scan.
    *
    * Deliberately NOT `ntile(4) OVER (ORDER BY …)`: an unpartitioned
    * window moves the whole fact table to a single partition — the r2
    * plan audit flagged it as the catalog's one scale-killer. Value
    * quartiles keep equal values in the same bucket (rank-splitting ties
    * is planner luck anyway) and cost one tiny agg + one scan, no global
    * sort, no single-partition stage.
    */
  def quartiles(invoices: DataFrame): DataFrame = {
    // two passes (boundary agg, assignment scan) over a pruned 2-column
    // projection. Deliberately NOT cached: a lazily-returned frame has
    // no post-action unpersist point, and a persistent cache leaks into
    // every later plan that matches (CacheManager keys on the plan), so
    // benchmarks under-report the scan. Two pruned columnar scans are
    // the honest 100 TB cost; swap percentile_approx in when
    // approximate boundaries are acceptable and one pass matters.
    val proj = invoices.select(col("invoice_number"), col("bill_total"))
    val cuts = proj.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY bill_total)").as("c1"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY bill_total)").as("c2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY bill_total)").as("c3"))
    proj.crossJoin(broadcast(cuts))
      .select(col("invoice_number"), col("bill_total"),
        (lit(1) + (col("bill_total") > col("c1")).cast("int")
                + (col("bill_total") > col("c2")).cast("int")
                + (col("bill_total") > col("c3")).cast("int")).as("quartile"))
  }

  /** Trailing 7-day spend per customer — a RANGE frame over the DATE
    * value (every invoice within [date-6d, date] joins the frame,
    * including same-date ties, so the result is order-independent and
    * deterministic without a tie-break). Partitioned by customer:
    * bounded state, one shuffle on the key.
    */
  def trailing7d(invoices: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("days"))
      .rangeBetween(-6, 0)
    invoices
      .withColumn("days",
        datediff(col("invoice_date"), lit("1992-01-01").cast("date")))
      .select(col("customer_id"), col("invoice_number"), col("invoice_date"),
        sum(col("bill_total")).over(w).cast(Money).as("trailing_7d"))
  }

  /** FULL OUTER join surface: per-customer activity in two adjacent
    * months, customers present in either side, NULL counts on the
    * missing side (sort-merge FullOuter — the one join type the
    * reference never exercises).
    */
  def monthOverMonth(invoices: DataFrame): DataFrame = {
    def monthCounts(from: String, until: String, as: String) = invoices
      .filter(col("invoice_date") >= lit(from).cast("date") &&
        col("invoice_date") < lit(until).cast("date"))
      .groupBy(col("customer_id")).agg(count(lit(1)).as(as))
    monthCounts("1997-03-01", "1997-04-01", "n_mar")
      .join(monthCounts("1997-04-01", "1997-05-01", "n_apr"),
        Seq("customer_id"), "full_outer")
  }

  /** Grouped value quartiles: boundaries per currency (keyed exact
    * percentile aggregate — tiny output), joined back on the group key,
    * buckets assigned in the same scan. The keyed variant is the MORE
    * scale-natural shape: boundary state is per-group and the join back
    * is a broadcast of #groups rows.
    */
  def quartilesByGroup(invoices: DataFrame): DataFrame = {
    val cuts = invoices.groupBy(col("currency")).agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY bill_total)").as("c1"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY bill_total)").as("c2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY bill_total)").as("c3"))
    invoices.join(broadcast(cuts), Seq("currency"))
      .select(col("invoice_number"), col("currency"), col("bill_total"),
        (lit(1) + (col("bill_total") > col("c1")).cast("int")
                + (col("bill_total") > col("c2")).cast("int")
                + (col("bill_total") > col("c3")).cast("int")).as("quartile"))
  }

  /** Latest invoice per customer — the arg-max family, via a
    * struct-ordered max: (invoice_date, invoice_number) compares
    * lexicographically in both engines, so the unique invoice_number
    * tie-break makes the winner deterministic. One keyed aggregate with
    * map-side partials; no window, no sort.
    */
  def latestInvoicePerCustomer(invoices: DataFrame): DataFrame =
    invoices
      .groupBy(col("customer_id"))
      .agg(max(struct(col("invoice_date"), col("invoice_number"))).as("m"))
      .select(col("customer_id"),
        col("m.invoice_date").as("last_date"),
        col("m.invoice_number").as("last_invoice"))

  /** Per-user inter-event gaps in seconds (lag over event time;
    * event_id tie-break; NULL for each user's first event).
    */
  def eventDeltas(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events.select(col("user_id"), col("event_id"), col("ts"),
      (col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        .as("gap_seconds"))
  }

  /** Daily active users: exact COUNT(DISTINCT) per day plus event
    * volume. Spark plans mixed distinct/non-distinct aggregates through
    * an Expand (one row replica per aggregate family) and two keyed
    * exchanges with partial aggregation — the distinct pattern scales as
    * long as (day, user) cardinality does, which is the operator's
    * honest floor.
    */
  def dailyActive(events: DataFrame): DataFrame =
    events
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_users"),
        count(lit(1)).as("n_events"))

  /** ROLLUP subtotals: (currency, status) → (currency) → grand total. */
  def revenueRollup(invoices: DataFrame): DataFrame =
    invoices.rollup(col("currency"), col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("bill_total")).cast(Money).as("revenue"))

  /** CUBE: all four grouping sets over (currency, status) — subtotals by
    * each dim alone, the cross, and the grand total, in ONE pass (Spark
    * expands the grouping sets before the partial aggregate, so the
    * shuffle carries per-set partials, not four scans).
    */
  def revenueCube(invoices: DataFrame): DataFrame =
    invoices.cube(col("currency"), col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("bill_total")).cast(Money).as("revenue"))

  /** Pivot: segment rows × fixed status columns (explicit value list —
    * an open-ended pivot would need a pre-scan; fixed keeps one pass),
    * missing combinations as 0.
    */
  def statusPivot(invoices: DataFrame, customers: DataFrame): DataFrame =
    Joins.dimJoin(
      invoices.select(col("customer_id"), col("status")),
      customers.select(col("id"), col("segment")),
      col("customer_id") === col("id"))
      .groupBy(col("segment"))
      .pivot("status", Seq("F", "O", "P"))
      .count()
      .na.fill(0L, Seq("F", "O", "P"))
}
