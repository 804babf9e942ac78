package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps
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

  /** Anti join: customers with NO invoice in [from, until) — the
    * "inactive segment" list. LEFT ANTI is the right physical shape: the
    * fact side is reduced to its key column before the join, the
    * dimension streams through, and no row widens. At 100 TB the fact
    * key projection shuffles once on customer_id (or broadcasts, if the
    * window is selective enough for AQE to see a small build side).
    */
  def inactiveCustomers(customers: DataFrame, invoices: DataFrame,
                        from: String, until: String): DataFrame =
    customers.join(
      invoices.filter(col("invoice_date") >= lit(from).cast("date") &&
          col("invoice_date") < lit(until).cast("date"))
        .select(col("customer_id")),
      col("id") === col("customer_id"), "left_anti")
      .select(col("id"), col("name"), col("segment"))

  /** Semi join: customers with AT LEAST one invoice in [from, until) —
    * existence without multiplication (a plain inner join would
    * duplicate each customer per matching invoice and need a distinct;
    * LEFT SEMI short-circuits on first match and keeps dimension
    * cardinality).
    */
  def activeCustomers(customers: DataFrame, invoices: DataFrame,
                      from: String, until: String): DataFrame =
    customers.join(
      invoices.filter(col("invoice_date") >= lit(from).cast("date") &&
          col("invoice_date") < lit(until).cast("date"))
        .select(col("customer_id")),
      col("id") === col("customer_id"), "left_semi")
      .select(col("id"), col("name"), col("segment"))

  /** Invoice cadence per customer: days since the previous and until the
    * next invoice (lag/lead over a per-customer window; invoice_number
    * tie-break makes same-day sequences deterministic). Partitioned
    * window — bounded state, one shuffle on customer_id.
    */
  def invoiceCadence(invoices: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("customer_id"))
      .orderBy(col("invoice_date"), col("invoice_number"))
    invoices.select(col("customer_id"), col("invoice_number"),
      col("invoice_date"),
      datediff(col("invoice_date"), lag(col("invoice_date"), 1).over(w))
        .as("days_since_prev"),
      datediff(lead(col("invoice_date"), 1).over(w), col("invoice_date"))
        .as("days_to_next"))
  }

  /** Explicit GROUPING SETS — (currency) and (status) subtotals in ONE
    * pass, without the cross or grand total CUBE would add (Spark
    * expands per-set replicas before the partial aggregate, so the
    * shuffle carries per-set partials; a UNION of two groupBys would
    * scan twice).
    */
  def revenueGroupingSets(invoices: DataFrame): DataFrame =
    invoices
      .groupingSets(Seq(Seq(col("currency")), Seq(col("status"))),
        col("currency"), col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("bill_total")).cast(Money).as("revenue"))

  /** Relative standing within a group: percent_rank and cume_dist of
    * each invoice's value within its currency. Both are exact ratios of
    * integers ((rank-1)/(n-1), peers/n) evaluated in double — bit-equal
    * across engines, no rounding dance needed. Partitioned window.
    */
  def percentRanks(invoices: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("currency")).orderBy(col("bill_total"))
    invoices.select(col("invoice_number"), col("currency"),
      col("bill_total"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
  }

  /** Per-currency correlation / covariance / regression slope of
    * (terms_days, bill_total) — computed FROM EXACT SUMS: the aggregate
    * collects integer/decimal sums (exact in both engines), and the
    * statistics are a final double formula over those sums. Because the
    * inputs to the double math are exact and the expression tree is
    * mirrored verbatim in the oracle, the doubles are bit-identical —
    * unlike built-in streaming corr/stddev, whose accumulation order is
    * engine-private. One keyed aggregate with map-side partials.
    */
  def corrByGroup(invoices: DataFrame): DataFrame = {
    val sums = invoices.groupBy(col("currency")).agg(
      count(lit(1)).as("n"),
      sum(col("terms_days")).as("sx"),
      sum(col("bill_total")).as("sy"),
      sum(col("bill_total") * col("terms_days")).as("sxy"),
      sum(col("terms_days") * col("terms_days")).as("sx2"),
      sum(col("bill_total") * col("bill_total")).as("sy2"))
    val n = col("n").cast("double"); val sx = col("sx").cast("double")
    val sy = col("sy").cast("double"); val sxy = col("sxy").cast("double")
    val sx2 = col("sx2").cast("double"); val sy2 = col("sy2").cast("double")
    // round(…,6): sy2's unscaled value exceeds 2^53, where decimal→double
    // conversion may differ by an ulp between engines (Spark rounds the
    // full value once; DuckDB converts the unscaled int then divides) —
    // 6dp absorbs the ulp while keeping the statistics exact enough to
    // gate on.
    // Degenerate-group guard (ADVICE r4): a group with n=1 or zero
    // variance has a 0 denominator; Spark doubles would yield
    // NaN/Infinity while DuckDB's behavior depends on a session flag, so
    // the statistics are NULLed instead. The guard expressions are
    // doubles mirrored verbatim in the oracle — same inputs (exact sums),
    // same IEEE ops, same branch taken.
    val varX = n * sx2 - sx * sx
    val varY = n * sy2 - sy * sy
    sums.select(col("currency"), col("n"),
      when(varX > 0d && varY > 0d,
        round((n * sxy - sx * sy) / (sqrt(varX) * sqrt(varY)), 6))
        .as("corr"),
      when(n > 1d,
        round((n * sxy - sx * sy) / (n * (n - lit(1.0))), 6))
        .as("covar_samp"),
      when(varX > 0d,
        round((n * sxy - sx * sy) / varX, 6))
        .as("beta"))
  }

  /** Cohort retention: customers grouped by their first-invoice month,
    * counted per months-elapsed offset — the classic retention triangle.
    * Two keyed aggregates (first-seen, then cohort×offset counts) and
    * one join of the per-customer cohort (dimension-sized) back onto
    * distinct activity months; everything shuffles on customer_id or the
    * tiny (cohort, offset) key.
    */
  def retentionCohorts(invoices: DataFrame): DataFrame = {
    val first = invoices.groupBy(col("customer_id"))
      .agg(min(col("invoice_date")).as("first_date"))
      .select(col("customer_id"),
        date_trunc("month", col("first_date")).as("cohort_month"))
    invoices
      .select(col("customer_id"),
        date_trunc("month", col("invoice_date")).as("act_month"))
      .distinct()
      .join(first, Seq("customer_id"))
      .select(date_format(col("cohort_month"), "yyyy-MM").as("cohort"),
        months_between(col("act_month"), col("cohort_month")).cast("int")
          .as("month_offset"))
      .groupBy(col("cohort"), col("month_offset"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Unpivot: melt the fixed status columns of [[statusPivot]] back to
    * (segment, status, n) long form — Spark's Unpivot plan node (an
    * Expand: one replica per value column, no shuffle beyond the
    * pivot's own aggregate).
    */
  def statusUnpivot(invoices: DataFrame, customers: DataFrame): DataFrame =
    statusPivot(invoices, customers)
      .unpivot(Array(col("segment")),
        Array(col("F"), col("O"), col("P")), "status", "n")

  /** Ordered conversion funnel over typed events: per user, the first
    * step-1 event, then the first step-2 event STRICTLY after it, then
    * the first step-3 event strictly after that — the standard product
    * funnel where step order matters (a purchase before the click does
    * not convert the click). Output: one row per stage with how many
    * users reached it, monotone non-increasing by construction.
    *
    * Shape: each stage is one groupBy(user) MIN over a filtered scan,
    * joined to the previous stage's frontier — three aggregates keyed on
    * user_id (map-side partials, no window, no ordering shuffle). At
    * 100 TB the per-stage frontier is |users| rows, and every join is an
    * equi-join on user_id that AQE can broadcast once the funnel
    * narrows.
    */
  def funnel(events: DataFrame,
             steps: Seq[String] = Seq("view", "click", "purchase"))
      : DataFrame = {
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts"))
    val frontiers = steps.tail.scanLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("ts").as("prev_ts")),
          Seq("user_id"))
        .filter(col("ts") > col("prev_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts"))
    }
    steps.zip(frontiers).zipWithIndex.map { case ((step, f), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(step).as("step"),
          col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** FUNNEL CONVERSION LATENCY — the companion read to [[funnel]]'s
    * stage counts: for users who complete the whole funnel, the
    * distribution of first-step → final-conversion lag (p50/p90/p99
    * + max in whole seconds) — the product-analytics number that
    * decides whether conversion is an impulse or a deliberation.
    * Lags are exact integer second differences (both engines
    * truncate the sub-second part of a positive epoch identically);
    * the percentiles are discrete order statistics, so no
    * interpolation arithmetic can disagree.
    *
    * Scale shape: the [[funnel]] frontier chain (per-step keyed
    * min-aggregates and semi-join-shaped filters), one |converted|-
    * row lag frame, one exact percentile aggregate. 1 row out.
    */
  def funnelLatency(events: DataFrame,
                    steps: Seq[String] = Seq("view", "click",
                      "purchase")): DataFrame = {
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts"))
    val last = steps.tail.foldLeft(first) { (prev, step) =>
      events.filter(col("event_type") === step)
        .join(prev.select(col("user_id"), col("ts").as("prev_ts")),
          Seq("user_id"))
        .filter(col("ts") > col("prev_ts"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("ts"))
    }
    first.select(col("user_id"), col("ts").as("t0"))
      .join(last.select(col("user_id"), col("ts").as("t1")),
        Seq("user_id"))
      .select((col("t1").cast("long") - col("t0").cast("long"))
        .as("lag_s"))
      .agg(count(lit(1)).as("n_converted"),
        // percentile_disc returns DOUBLE; the value is an exact
        // integer element, so the cast back to long is lossless.
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_s)")
          .cast("long").as("p50_s"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_s)")
          .cast("long").as("p90_s"),
        expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY lag_s)")
          .cast("long").as("p99_s"),
        max(col("lag_s")).as("max_s"))
  }

  /** k-anonymity suppression over a dimension's quasi-identifier
    * columns: any (nationkey, segment) combination carried by fewer
    * than `k` customers has BOTH quasi-identifiers nulled — the
    * generalize-or-suppress privacy gate a pipeline applies before
    * customer attributes may ride along with training data. Identifiers
    * (the key) survive; `suppressed` flags the affected rows so
    * downstream can count information loss.
    *
    * Shape: one groupBy over the QI columns (tiny result — at most
    * |QI-value combinations| rows) broadcast-joined back onto the scan;
    * no window, no second pass over the fact.
    */
  def kAnonymize(customers: DataFrame, k: Int = 10): DataFrame = {
    val groups = customers
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("qi_n"))
    customers.join(broadcast(groups), Seq("c_nationkey", "c_mktsegment"))
      .select(col("c_custkey"),
        when(col("qi_n") >= k, col("c_nationkey")).as("nation_qi"),
        when(col("qi_n") >= k, col("c_mktsegment")).as("segment_qi"),
        (col("qi_n") < k).as("suppressed"))
  }

  /** l-DIVERSITY audit (Machanavajjhala et al. '07) — the release
    * check k-anonymity misses: a quasi-identifier group can hold ≥ k
    * rows yet leak its sensitive attribute completely if every row
    * SHARES the value. Per (nationkey, segment) QI group over a
    * banded sensitive attribute (account-balance band, exact integer
    * cents DIV — the +100000 offset keeps the dividend positive so
    * truncating and flooring division agree across engines): the
    * distinct-value count against `l`, and entropy l-diversity
    * (H ≥ ln l) via per-value 1e6 fixed-point −p·ln p terms summed as
    * integers — the cross-engine-exact entropy fold.
    *
    * Scale shape: two keyed aggregates (QI×band, then QI) and a
    * #groups-sized broadcast join; the output is QI-cardinality-
    * bounded (≤ 125 rows here) regardless of table size.
    */
  def lDiversity(customers: DataFrame, l: Int = 3): DataFrame = {
    val lnLFp = Math.round(1e6 * Math.log(l.toDouble))
    val banded = customers.select(col("c_nationkey"), col("c_mktsegment"),
      (expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)") + 100000L)
        .as("cents_off"))
      .withColumn("band", expr("cents_off DIV 100000"))
    val cells = banded
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val groups = cells
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("cnt")).as("n"),
        count(lit(1)).as("n_distinct_sv"))
    cells.join(groups, Seq("c_nationkey", "c_mktsegment"))
      .withColumn("term",
        round(lit(-1e6) * (col("cnt").cast("double") / col("n"))
          * log(col("cnt").cast("double") / col("n"))).cast("long"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        col("n"), col("n_distinct_sv"))
      .agg(sum(col("term")).as("entropy_fp"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        col("n_distinct_sv"),
        round(col("entropy_fp").cast("double") / 1e6, 6).as("entropy"),
        (col("n_distinct_sv") >= l).as("distinct_ok"),
        (col("entropy_fp") >= lnLFp).as("entropy_ok"))
  }

  /** t-CLOSENESS audit (Li et al. '07) — the release check
    * [[lDiversity]] misses: a QI group can carry ≥ l distinct
    * sensitive values yet still leak by SKEW (all its mass piled on
    * the tail bands while the population is centered). Per
    * (nationkey, segment) group over the same ordered acctbal bands
    * as l-diversity: the Earth-Mover's Distance to the GLOBAL band
    * distribution under the ordered equal-distance ground metric,
    * EMD = Σᵢ|Rᵢ| / (n_g·N·(m−1)) with Rᵢ = N·Σ_{j≤i}cnt_j −
    * n_g·Σ_{j≤i}gcnt_j — the cumulative-difference closed form,
    * EXACT integers until the single final division. The breach test
    * cross-multiplies against the rational threshold tNum/tDen
    * (default 3/20 = 0.15, the paper's running example), so no float
    * comparison decides a privacy gate.
    *
    * Scale shape: one (QI × band) keyed aggregate, two tiny rollups,
    * then a ≤|QI|·|bands| frame (bands are range-bounded — ~11 here
    * — so the broadcast cross join is constant-sized, the modularity
    * device) with per-group cumulative windows over ≤|bands| rows.
    */
  def tCloseness(customers: DataFrame, tNum: Long = 3L,
                 tDen: Long = 20L): DataFrame = {
    val banded = customers.select(col("c_nationkey"), col("c_mktsegment"),
      (expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)") + 100000L)
        .as("cents_off"))
      .withColumn("band", expr("cents_off DIV 100000"))
    val cells = banded
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val groups = cells
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(sum(col("cnt")).as("n"))
    val gbands = cells.groupBy(col("band"))
      .agg(sum(col("cnt")).as("gcnt"))
    val tot = gbands.agg(sum(col("gcnt")).as("nn"),
      count(lit(1)).as("m"))
    val cum = Window
      .partitionBy(col("c_nationkey"), col("c_mktsegment"))
      .orderBy(col("band"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups
      .crossJoin(broadcast(gbands))
      .join(cells, Seq("c_nationkey", "c_mktsegment", "band"), "left")
      .na.fill(0L, Seq("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("r",
        col("nn") * sum(col("cnt")).over(cum)
          - col("n") * sum(col("gcnt")).over(cum))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("n"),
        col("nn"), col("m"))
      .agg(sum(abs(col("r"))).as("sabs"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        round(col("sabs").cast("double")
          / (col("n").cast("double") * col("nn").cast("double")
            * (col("m") - 1L).cast("double")), 6).as("t_emd"),
        (col("sabs") * lit(tDen)
          > lit(tNum) * col("n") * col("nn") * (col("m") - 1L))
          .as("breach"))
  }

  /** RIGHT-TO-ERASURE purge audit — the GDPR/CCPA deletion dry-run:
    * for each table, how many rows a pending delete-key set would
    * purge vs keep (run BEFORE the destructive pass; cascades are
    * expressed by deriving each table's key set from its parent's
    * purge). One broadcast-key left join + one conditional aggregate
    * per table — each table scanned exactly once, counts only, nothing
    * rewritten. A delete set too big to broadcast swaps in the Bloom
    * pre-filter ([[graft.operators.Bloom]]) on the same plan.
    */
  def purgeAudit(tables: Seq[(String, DataFrame, String, DataFrame)])
      : DataFrame =
    tables.map { case (name, df, keyCol, keys) =>
      val k = keys.select(col("key")).distinct()
        .withColumn("__m", lit(1))
      df.join(broadcast(k), df(keyCol) === col("key"), "left")
        .agg(
          sum(when(col("__m").isNotNull, 1L).otherwise(0L))
            .as("n_purged"),
          sum(when(col("__m").isNull, 1L).otherwise(0L)).as("n_kept"))
        .select(lit(name).as("table_name"), col("n_purged"),
          col("n_kept"))
    }.reduce(_ unionByName _)

  /** CUPED variance reduction (Deng et al. '13, "Improving the
    * sensitivity of online controlled experiments") — the pre-period
    * covariate adjustment every experimentation platform runs:
    * Y′ = Y − θ(X − X̄) with θ = cov(X,Y)/var(X), where X is each
    * customer's PRE-split spend and Y the post-split spend; the
    * treatment split is the deterministic content-hash lottery. The
    * whole read-out is closed-form from ONE conditional aggregate
    * pass — per-arm adjusted means need no second scan because
    * mean(Y′ | arm) = Ȳ_arm − θ(X̄_arm − X̄), and the variance
    * reduction is corr²(X,Y) exactly.
    *
    * Determinism: per-order dollars snap once to integers, all sums
    * are exact longs, and the closed form is a shared double tree
    * (the [[trendSlope]]/[[welchTTest]] device). Zero pre-period
    * variance → θ and the reduction emit null.
    *
    * Scale shape: one keyed per-customer aggregate, one left join
    * onto the customer dim, one global aggregate row. 1 row out.
    */
  def cuped(customers: DataFrame, orders: DataFrame,
            splitDate: String = "1996-01-01"): DataFrame = {
    val cut = lit(splitDate).cast("date")
    val per = orders.select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice, 0) AS BIGINT)").as("v"))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("d") < cut, col("v")).otherwise(0L)).as("x"),
        sum(when(col("d") >= cut, col("v")).otherwise(0L)).as("y"))
    val units = customers.select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .withColumn("arm", pmod(TextOps.fingerprint64(
        concat(col("c_custkey").cast("string"), lit(":cuped"))),
        lit(2L)))
    val g = units.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("na"),
      sum(when(col("arm") === 0L, col("x")).otherwise(0L)).as("sxa"),
      sum(when(col("arm") === 0L, col("y")).otherwise(0L)).as("sya"),
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nb"),
      sum(when(col("arm") === 1L, col("x")).otherwise(0L)).as("sxb"),
      sum(when(col("arm") === 1L, col("y")).otherwise(0L)).as("syb"))
    val nD = col("n").cast("double")
    val covN = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double"))
    val varXN = (nD * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double"))
    val varYN = (nD * col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double"))
    val theta = covN / varXN
    val xbar = col("sx").cast("double") / nD
    val meanAdjA = (col("sya").cast("double") / col("na").cast("double")
      - theta * (col("sxa").cast("double") / col("na").cast("double")
        - xbar))
    val meanAdjB = (col("syb").cast("double") / col("nb").cast("double")
      - theta * (col("sxb").cast("double") / col("nb").cast("double")
        - xbar))
    g.select(col("n"), col("na"), col("nb"),
      round(when(varXN =!= 0.0, theta), 6).as("theta"),
      round(col("syb").cast("double") / col("nb").cast("double")
        - col("sya").cast("double") / col("na").cast("double"), 6)
        .as("diff_raw"),
      round(when(varXN =!= 0.0, meanAdjB - meanAdjA), 6)
        .as("diff_adj"),
      round(when(varXN =!= 0.0 && varYN =!= 0.0,
        covN * covN / (varXN * varYN)), 6).as("var_reduction"))
  }

  /** MANN-WHITNEY U (Wilcoxon rank-sum) per nation — the
    * NONPARAMETRIC two-sample test beside [[welchTTest]]: does
    * segment A's balance distribution stochastically dominate B's,
    * with no normality assumption? Midranks handle ties exactly: in
    * DOUBLED-rank space r₂ = 2·minrank + t − 1 is an INTEGER, so
    * Σ midrank and U carry .5 granularity without a float fold —
    * 2U_A = Σ_A r₂ − n_A(n_A+1)·... the normal approximation (with
    * the standard tie correction Σ(t³−t)) is a closed-form double
    * tree on per-nation 1-row aggregates.
    *
    * Scale shape: the rank windows partition BY NATION (state
    * bounded per key, one shuffle); tie counts are one keyed
    * aggregate; output is |nations| rows. Degenerate groups (either
    * side empty, or zero variance) emit null U/z.
    */
  def mannWhitney(customers: DataFrame, groupA: String = "BUILDING",
                  groupB: String = "MACHINERY"): DataFrame = {
    val base = customers
      .filter(col("c_mktsegment").isin(groupA, groupB))
      .select(col("c_nationkey"), col("c_mktsegment").as("seg"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("v"))
    val wRank = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("v"))
    val wTie = Window.partitionBy(col("c_nationkey"), col("v"))
    val ranked = base
      .withColumn("minrank", rank().over(wRank))
      .withColumn("t", count(lit(1)).over(wTie))
      .withColumn("r2", lit(2L) * col("minrank") + col("t") - 1L)
    val g = ranked.groupBy(col("c_nationkey")).agg(
      sum(when(col("seg") === groupA, 1L).otherwise(0L)).as("na"),
      sum(when(col("seg") === groupB, 1L).otherwise(0L)).as("nb"),
      sum(when(col("seg") === groupA, col("r2")).otherwise(0L))
        .as("s2a"))
    val ties = base.groupBy(col("c_nationkey"), col("v"))
      .agg(count(lit(1)).as("tc"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("tc") * col("tc") * col("tc") - col("tc"))
        .as("tie3"))
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val nD = naD + nbD
    val ua = ((col("s2a") - col("na") * (col("na") + 1L))
      .cast("double") / lit(2.0))
    val sigma2 = (naD * nbD / lit(12.0)
      * ((nD + 1.0) - col("tie3").cast("double") / (nD * (nD - 1.0))))
    g.join(ties, Seq("c_nationkey"))
      .select(col("c_nationkey"), col("na"), col("nb"),
        round(when(col("na") > 0L && col("nb") > 0L, ua), 6).as("u_a"),
        round(when(col("na") > 0L && col("nb") > 0L && sigma2 > 0.0,
          (ua - naD * nbD / lit(2.0)) / sqrt(sigma2)), 6).as("z"))
  }

  /** KRUSKAL-WALLIS H per nation — the k-sample extension of
    * [[mannWhitney]]: do the five market segments' balance
    * distributions differ at all, rank-based? Midranks ride the same
    * integer doubled-rank device (Σ n_g·r̄_g² = Σ s₂g²/(4n_g)); the
    * per-nation reduction over the ≤ |segments| group terms is a
    * SORTED FOLD (seg-ordered collect + aggregate — the
    * q_token_entropy idiom: deterministic without a fixed-point
    * cap, since group counts can make s₂g² overflow any integer
    * scale at extreme n). Standard tie correction; degenerate
    * all-tied nations emit null.
    *
    * Scale shape: rank windows partition by nation; the fold runs
    * over ≤ |segments| structs per nation; |nations| rows out.
    */
  def kruskalWallis(customers: DataFrame): DataFrame = {
    val base = customers.select(col("c_nationkey"),
      col("c_mktsegment").as("seg"),
      expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("v"))
    val ranked = base
      .withColumn("minrank", rank().over(
        Window.partitionBy(col("c_nationkey")).orderBy(col("v"))))
      .withColumn("t", count(lit(1)).over(
        Window.partitionBy(col("c_nationkey"), col("v"))))
      .withColumn("r2", lit(2L) * col("minrank") + col("t") - 1L)
    val grp = ranked.groupBy(col("c_nationkey"), col("seg"))
      .agg(count(lit(1)).as("ng"), sum(col("r2")).as("s2g"))
    val ties = base.groupBy(col("c_nationkey"), col("v"))
      .agg(count(lit(1)).as("tc"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("tc") * col("tc") * col("tc") - col("tc"))
        .as("tie3"))
    val folded = grp.groupBy(col("c_nationkey"))
      .agg(sum(col("ng")).as("n"), count(lit(1)).as("n_groups"),
        aggregate(
          transform(
            sort_array(collect_list(struct(col("seg"), col("ng"),
              col("s2g")))),
            g => g.getField("s2g").cast("double")
              * g.getField("s2g").cast("double")
              / (lit(4.0) * g.getField("ng").cast("double"))),
          lit(0.0), (acc, x) => acc + x).as("sr2"))
    val nD = col("n").cast("double")
    val h = (lit(12.0) / (nD * (nD + 1.0)) * col("sr2")
      - lit(3.0) * (nD + 1.0))
    val corr = (lit(1.0) - col("tie3").cast("double")
      / (nD * nD * nD - nD))
    folded.join(ties, Seq("c_nationkey"))
      .select(col("c_nationkey"), col("n"), col("n_groups"),
        round(h, 6).as("h"),
        round(when(corr > 0.0, h / corr), 6).as("h_tie_corrected"))
  }

  /** SPEARMAN rank correlation per nation between a customer's
    * account balance and their total order spend — the MONOTONE
    * association read beside the Pearson operators (q_signal_corr /
    * q_corr_by_currency): rank-based, so one whale's raw magnitude
    * cannot manufacture correlation, and any monotone (not just
    * linear) relationship shows at full strength.
    *
    * Midranks ride [[mannWhitney]]'s integer DOUBLED-rank device
    * (r₂ = 2·minrank + t − 1, exact .5 granularity with no float
    * fold); ρ is then Pearson over the doubled ranks — the shared
    * closed-form double tree from exact sums. Rank products are
    * summed through DECIMAL(38,0) (DuckDB sums BIGINT into HUGEINT;
    * both convert the same exact integer to the same double), so the
    * Σr² ceiling sits at 10³⁸, far beyond any per-nation n. All-tied
    * variables emit null.
    *
    * Scale shape: one keyed per-customer aggregate, a dim-sized
    * left join, rank windows partitioned BY NATION, one keyed
    * closed-form aggregate; |nations| rows out.
    */
  def spearman(customers: DataFrame, orders: DataFrame): DataFrame = {
    val spend = orders.select(col("o_custkey"),
        expr("CAST(round(o_totalprice, 0) AS BIGINT)").as("v"))
      .groupBy(col("o_custkey")).agg(sum(col("v")).as("y"))
    val base = customers.select(col("c_custkey"), col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("x"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_nationkey"), col("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    def doubledRank(v: String): Column =
      lit(2L) * rank().over(
        Window.partitionBy(col("c_nationkey")).orderBy(col(v))) +
        count(lit(1)).over(
          Window.partitionBy(col("c_nationkey"), col(v))) - 1L
    val ranked = base
      .withColumn("rx", doubledRank("x"))
      .withColumn("ry", doubledRank("y"))
    def decSum(c: Column) = sum(c.cast("decimal(38,0)"))
    val g = ranked.groupBy(col("c_nationkey")).agg(
      count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      decSum(col("rx") * col("rx")).as("sxx"),
      decSum(col("ry") * col("ry")).as("syy"),
      decSum(col("rx") * col("ry")).as("sxy"))
    val nD = col("n").cast("double")
    val cov = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double"))
    val vx = (nD * col("sxx").cast("double")
      - col("sx").cast("double") * col("sx").cast("double"))
    val vy = (nD * col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double"))
    g.select(col("c_nationkey"), col("n"),
      round(when(vx > 0.0 && vy > 0.0, cov / sqrt(vx * vy)), 6)
        .as("rho"))
  }

  /** EMPIRICAL-BAYES SHRINKAGE of per-nation mean balances (the
    * James–Stein / random-effects partial pooling every per-group
    * ranking should apply before trusting small groups): the
    * method-of-moments estimate τ̂² = max(0, (SSB − (k−1)σ̂²) /
    * (N − Σn²/N)) of the between-group variance, then each group
    * mean shrinks toward the grand mean with weight
    * w = τ̂²/(τ̂² + σ̂²/n) — small groups pool hard, big groups keep
    * their own signal. The readout that separates "this source
    * really is better" from "this source has 12 documents".
    *
    * Exactness: per-group n/Σx/Σx² are exact integers (cents;
    * squares through DECIMAL(38,0)/HUGEINT); SSW and SSB come from
    * those moments as one shared double tree, with the two Σ-over-
    * groups folds (Σ Sᵢ²/nᵢ and Σ nᵢ(x̄ᵢ−x̄)², k ≤ 25 terms) run as
    * the ORDER BY-keyed sorted fold. One division per output row.
    */
  def ebShrinkage(customers: DataFrame): DataFrame = {
    def fold(term: Column, key: Column): Column =
      aggregate(sort_array(collect_list(struct(key.as("k"),
        term.as("t")))), lit(0.0), (acc, x) => acc + x.getField("t"))
    val per = customers.select(col("c_nationkey"),
        expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)").as("x"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x") * col("x")).cast("decimal(38,0)"))
          .cast("double").as("sxx"))
      .localCheckpoint()
    val g = per.agg(sum(col("n")).as("nn"), sum(col("s")).as("ss"),
      count(lit(1)).as("kk"),
      fold(col("sxx"), col("c_nationkey")).as("sumsxx"),
      fold(col("s").cast("double") * col("s").cast("double")
        / col("n").cast("double"), col("c_nationkey")).as("sumssn"),
      fold((col("n") * col("n")).cast("double"),
        col("c_nationkey")).as("sumn2"))
    val nnD = col("nn").cast("double")
    val gmean = col("ss").cast("double") / nnD
    val ssw = col("sumsxx") - col("sumssn")
    val ssb = col("sumssn") - gmean * gmean * nnD
    val sig2 = ssw / (nnD - col("kk").cast("double"))
    val tau2 = greatest(lit(0.0),
      (ssb - (col("kk") - 1L).cast("double") * sig2)
        / (nnD - col("sumn2") / nnD))
    per.crossJoin(broadcast(
        g.select(gmean.as("gmean"), sig2.as("sig2"), tau2.as("tau2"))))
      .withColumn("raw",
        col("s").cast("double") / col("n").cast("double"))
      .withColumn("w",
        when(col("tau2") + col("sig2") / col("n").cast("double") > 0.0,
          col("tau2")
            / (col("tau2") + col("sig2") / col("n").cast("double")))
          .otherwise(lit(0.0)))
      .select(col("c_nationkey"), col("n"),
        round(col("raw") / lit(100.0), 6).as("raw_mean_dollars"),
        round(col("w"), 6).as("weight"),
        round((col("gmean")
          + col("w") * (col("raw") - col("gmean"))) / lit(100.0), 6)
          .as("shrunk_mean_dollars"))
  }

  /** COHORT LTV CURVES — the revenue companion to
    * [[retentionCohorts]]: for each acquisition cohort (first-order
    * month) and age a, the average CUMULATIVE spend per cohort
    * member through month cohort+a. The trick that keeps it one
    * aggregate instead of a |customers|×|months| densification:
    * summing over members FIRST makes the cumulative a per-(cohort,
    * month) prefix sum — cohort_spend(m) cumulated over m, divided
    * once by the (constant) cohort size.
    *
    * Months are the engine-neutral integer index year·12 + month − 1
    * (no date_trunc/locale surface); spend is exact integer cents;
    * the prefix sum is an integer window per cohort; one division
    * per output row. Gap months genuinely without cohort spend do
    * not emit a row (the curve is defined at observed months; a
    * consumer interpolates flats).
    *
    * Scale shape: two keyed aggregates ((customer), (cohort, month)),
    * a cohort-keyed broadcast-size join, calendar-bounded windows.
    */
  def ltvCohorts(orders: DataFrame): DataFrame = {
    val mo = (d: Column) => (year(d) * 12 + month(d) - 1).cast("long")
    ltvFinish(orders.select(col("o_custkey"),
      mo(to_date(col("o_orderdate"))).as("m"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("cents")))
  }

  /** The LTV readout over a (o_custkey, m, cents) frame — shared by
    * the batch operator and the streaming twin's stateless finish
    * (the cusumFinish pattern: the per-customer month histogram is
    * the sufficient statistic, and a LATE-arriving early order
    * correctly re-ages its customer's cohort on replay).
    */
  private[graft] def ltvFinish(base: DataFrame): DataFrame = {
    val firstMo = base.groupBy(col("o_custkey"))
      .agg(min(col("m")).as("cohort"))
    val cohortSize = firstMo.groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_customers"))
    val monthly = base.join(firstMo, Seq("o_custkey"))
      .groupBy(col("cohort"), col("m"))
      .agg(sum(col("cents")).as("sp"))
    val cum = Window.partitionBy(col("cohort")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("cumsp", sum(col("sp")).over(cum))
      .join(cohortSize, Seq("cohort"))
      .select(col("cohort").as("cohort_month"),
        (col("m") - col("cohort")).as("age_months"),
        col("n_customers"),
        round(col("cumsp").cast("double")
          / col("n_customers").cast("double") / lit(100.0), 6)
          .as("avg_ltv_dollars"))
  }

  /** MULTI-FEATURE OLS by normal equations + Cramer (the canonical
    * "regression at any scale" shape: ONE aggregation pass collects
    * the 3×3 Gram matrix and the cross moments — sufficient
    * statistics, never rows — and the solve is closed-form): fit
    * extendedprice_cents ~ β₀ + β₁·quantity + β₂·discount_pct over
    * lineitem, with R². [[trendSlope]]'s single-feature OLS
    * generalized to the d-feature regime every feature pipeline
    * actually needs; for small d the 3×3 Cramer determinants are a
    * shared double tree both engines evaluate identically.
    *
    * Exactness: x₁, x₂, y are exact integers; every moment sums
    * through DECIMAL(38,0)/HUGEINT (products reach ~2⁶³ at corpus
    * scale); the determinants, β and R² are one shared tree over the
    * exact moments converted to double once each. Singular designs
    * (det = 0) emit null βs.
    */
  def olsMulti(lineitem: DataFrame): DataFrame = {
    val base = lineitem.select(
      col("l_quantity").cast("long").as("x1"),
      round(col("l_discount") * 100, 0).cast("long").as("x2"),
      expr("CAST(round(l_extendedprice * 100, 0) AS BIGINT)").as("y"))
    def d38(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    val g = base.agg(count(lit(1)).as("n"),
      d38(col("x1")).as("s1"), d38(col("x2")).as("s2"),
      d38(col("x1") * col("x1")).as("s11"),
      d38(col("x1") * col("x2")).as("s12"),
      d38(col("x2") * col("x2")).as("s22"),
      d38(col("y")).as("sy"),
      d38(col("x1") * col("y")).as("s1y"),
      d38(col("x2") * col("y")).as("s2y"),
      d38(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    val det = det3(nD, col("s1"), col("s2"),
      col("s1"), col("s11"), col("s12"),
      col("s2"), col("s12"), col("s22"))
    val b0 = det3(col("sy"), col("s1"), col("s2"),
      col("s1y"), col("s11"), col("s12"),
      col("s2y"), col("s12"), col("s22")) / det
    val b1 = det3(nD, col("sy"), col("s2"),
      col("s1"), col("s1y"), col("s12"),
      col("s2"), col("s2y"), col("s22")) / det
    val b2 = det3(nD, col("s1"), col("sy"),
      col("s1"), col("s11"), col("s1y"),
      col("s2"), col("s12"), col("s2y")) / det
    val sst = col("syy") - col("sy") * col("sy") / nD
    val ssr = (b0 * col("sy") + b1 * col("s1y") + b2 * col("s2y")
      - col("sy") * col("sy") / nD)
    g.select(col("n"),
      round(when(det =!= 0.0, b0 / lit(100.0)), 6).as("beta0_dollars"),
      round(when(det =!= 0.0, b1 / lit(100.0)), 6).as("beta1_per_qty"),
      round(when(det =!= 0.0, b2 / lit(100.0)), 6).as("beta2_per_pct"),
      round(when(det =!= 0.0 && sst > 0.0, ssr / sst), 6).as("r2"))
  }

  /** MINIMUM DETECTABLE EFFECT (the power-analysis readout that
    * belongs BEFORE [[welchTTest]]/[[cuped]] are run): with n units
    * split 50/50 and outcome deviation σ̂, the smallest true lift a
    * two-sided α = 0.05 test detects with 80 % power is
    * MDE = (z_{0.975} + z_{0.80})·σ̂·√(2/(n/2)) = 2.801586·2σ̂/√n.
    * The "is this experiment even worth running" number — and the
    * reason the per-customer outcome frame is the unit of analysis
    * (per-order rows would understate σ across the same n).
    *
    * Determinism: per-customer integer-dollar outcomes; n/Σy exact
    * longs; Σy² through DECIMAL(38,0) (HUGEINT twin); σ̂², the two
    * pinned z constants, and the closed form are one shared double
    * tree. 1 row out.
    */
  def mde(customers: DataFrame, orders: DataFrame,
          splitDate: String = "1996-01-01"): DataFrame = {
    val cut = lit(splitDate).cast("date")
    val per = orders.select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice, 0) AS BIGINT)").as("v"))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("d") >= cut, col("v")).otherwise(0L)).as("y"))
    val units = customers.select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("y"), lit(0L)).as("y"))
    val g = units.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
      sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    val nD = col("n").cast("double")
    val sigma2 = ((nD * col("syy").cast("double")
      - col("sy").cast("double") * col("sy").cast("double"))
      / (nD * nD))
    val mdeAbs = lit(2.801586) * lit(2.0) * sqrt(sigma2) / sqrt(nD)
    g.select(col("n").as("n_units"),
      round(col("sy").cast("double") / nD, 6).as("mean_spend"),
      round(sqrt(sigma2), 6).as("sigma"),
      round(mdeAbs, 6).as("mde_abs"),
      round(when(col("sy") > 0L, mdeAbs
        / (col("sy").cast("double") / nD)), 6).as("mde_rel"))
  }

  /** SAMPLE-RATIO-MISMATCH check (the first gate any experiment
    * readout must pass; Fabijan et al. '19 call SRM "the guardrail
    * metric"): chi-square goodness-of-fit of OBSERVED per-arm unit
    * counts against the DESIGN weights. A biased logging path, a
    * bot filter that correlates with assignment, or a redirect bug
    * silently corrupts every downstream metric — the count test
    * catches it before [[welchTTest]]/[[cuped]] are even looked at.
    *
    * Exactness: with integer design weights pᵢ (total P), the
    * per-arm deviation Δᵢ = P·obsᵢ − n·pᵢ is EXACT integer
    * arithmetic; the χ² contribution Δᵢ²/(P·n·pᵢ) is one double
    * division per arm, snapped to 1e6 fixed point so the k-term χ²
    * total is an integer sum (no float fold). The alarm compares
    * fixed-point integers against `critFp` = round(1e6·χ²_crit)
    * (default 6634897 = the df=1, α=0.01 critical value — SRM
    * convention is a deliberately strict α so it never fires on
    * noise).
    *
    * Output: one row per arm (expected count, contribution; chi2 and
    * alarm null) + an arm = −1 total row carrying χ² and the alarm.
    * Scale shape: one keyed count over the assignment frame, then
    * all arithmetic on a k-row frame with a 1-row broadcast total.
    */
  def srmCheck(assigned: DataFrame, armCol: String,
               weights: Seq[Int], critFp: Long = 6634897L): DataFrame = {
    val spark = assigned.sparkSession
    import spark.implicits._
    val pTot = weights.sum.toLong
    val design = weights.zipWithIndex
      .map { case (p, i) => (i.toLong, p.toLong) }.toDF("arm", "p")
    val obs = assigned
      .groupBy(col(armCol).cast("long").as("arm"))
      .agg(count(lit(1)).as("n_obs"))
    val tot = assigned.agg(count(lit(1)).as("n"))
    val diff = (col("n_obs") * lit(pTot) - col("n") * col("p"))
      .cast("double")
    val perArm = design.join(obs, Seq("arm"), "left")
      .na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      .withColumn("contrib_fp",
        round(lit(1e6) * diff * diff
          / (lit(pTot.toDouble) * col("n").cast("double")
            * col("p").cast("double"))).cast("long"))
    val armRows = perArm.select(col("arm"), col("n_obs"),
      round(col("n").cast("double") * col("p").cast("double")
        / lit(pTot.toDouble), 6).as("expected"),
      round(col("contrib_fp").cast("double") / lit(1e6), 6)
        .as("contribution"),
      lit(null).cast("double").as("chi2"),
      lit(null).cast("boolean").as("alarm"))
    val total = perArm
      .agg(sum(col("n_obs")).as("n_obs"),
        sum(col("contrib_fp")).as("fp"))
      .select(lit(-1L).as("arm"), col("n_obs"),
        col("n_obs").cast("double").as("expected"),
        lit(null).cast("double").as("contribution"),
        round(col("fp").cast("double") / lit(1e6), 6).as("chi2"),
        (col("fp") > lit(critFp)).as("alarm"))
    armRows.unionByName(total)
  }

  /** The deterministic assignment frame under the catalog's SRM
    * instance: distinct event users through the content-hash lottery
    * with cumulative integer weight cutoffs (arm i covers hash mod P
    * in [Σp₍<i₎, Σp₍≤i₎)).
    */
  def srmAssignments(events: DataFrame,
                     weights: Seq[Int] = Seq(9, 1)): DataFrame =
    events.select(col("user_id")).distinct()
      .select(col("user_id"),
        srmArm(col("user_id"), weights).as("arm"))

  /** The arm column under [[srmAssignments]] — exposed so the
    * streaming twin's stateless finish maps the SAME lottery over
    * its first-sight user stream.
    */
  def srmArm(userId: Column, weights: Seq[Int]): Column = {
    val pTot = weights.sum.toLong
    val h = pmod(TextOps.fingerprint64(
      concat(userId.cast("string"), lit(":srm"))), lit(pTot))
    val cuts = weights.scanLeft(0L)(_ + _).tail
    cuts.zipWithIndex.tail.foldLeft(
      when(h < cuts.head, 0L)) { case (acc, (cut, i)) =>
        acc.when(h < cut, i.toLong)
      }
  }

  /** WELCH'S two-sample t — the unequal-variance A/B significance test
    * (the experiment read-out: is segment A's metric different from
    * segment B's beyond noise?). Accumulates n/Σx/Σx² for both arms in
    * ONE conditional aggregate pass (no join, no second scan), then
    * the closed form — means, clamped one-pass variances, t, and the
    * Welch–Satterthwaite df — in identically-parenthesized doubles.
    */
  def welchTTest(df: DataFrame, groupCol: String, groupA: String,
                 groupB: String, valueCol: Column): DataFrame = {
    val agg = df.select(col(groupCol).as("g"), valueCol.as("x"))
      .filter(col("g").isin(groupA, groupB))
      .agg(
        sum(when(col("g") === groupA, 1L).otherwise(0L)).as("na"),
        sum(when(col("g") === groupA, col("x"))).as("sa"),
        sum(when(col("g") === groupA, col("x") * col("x"))).as("qa"),
        sum(when(col("g") === groupB, 1L).otherwise(0L)).as("nb"),
        sum(when(col("g") === groupB, col("x"))).as("sb"),
        sum(when(col("g") === groupB, col("x") * col("x"))).as("qb"))
    def m(s: String, n: String) = col(s).cast("double") / col(n).cast("double")
    def v(q: String, s: String, n: String) = greatest(
      (col(q).cast("double")
        - (col(s).cast("double") * col(s).cast("double"))
          / col(n).cast("double"))
        / (col(n).cast("double") - lit(1.0)),
      lit(0.0))
    val sea = v("qa", "sa", "na") / col("na").cast("double")
    val seb = v("qb", "sb", "nb") / col("nb").cast("double")
    val se2 = sea + seb
    // Degenerate-arm guard (ADVICE r7): a missing/singleton arm
    // (n ≤ 1 → the n−1 divisor) or two constant arms (se2 = 0 → the
    // √se2 divisor) yields an EXPLICIT null t/df instead of a silent
    // NaN riding into downstream comparisons.
    val ok = col("na") > 1 && col("nb") > 1 && se2 =!= lit(0.0)
    agg.select(col("na").as("n_a"), col("nb").as("n_b"),
      round(m("sa", "na"), 6).as("mean_a"),
      round(m("sb", "nb"), 6).as("mean_b"),
      round(when(ok,
        (m("sa", "na") - m("sb", "nb")) / sqrt(se2)), 6).as("t_stat"),
      round(when(ok, (se2 * se2)
        / ((sea * sea) / (col("na").cast("double") - lit(1.0))
          + (seb * seb) / (col("nb").cast("double") - lit(1.0)))), 6)
        .as("df"))
  }

  /** Top event-type TRIGRAMS across per-user ordered paths — the
    * next-step sequence-mining read on top of [[transitionMatrix]]'s
    * bigrams: two `lead`s over the SAME per-user sort (one shuffle,
    * one window pass), a |types|³-bounded aggregate, top-k via
    * TakeOrderedAndProject.
    */
  def pathTrigrams(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t1"), col("t2"), col("t3"))
      .limit(k)
  }

  /** Rolling z-score ANOMALY detection on a daily grouped metric — the
    * operational-monitoring primitive (is today's volume off its
    * trailing baseline?): per (group, day), the trailing `window`-day
    * mean/std EXCLUDING the current day, and an anomaly flag when
    * |z| > `zThresh`. Mean/variance come from exact decimal Σx/Σx²
    * window sums (the one-pass formula var = (Σx² − (Σx)²/n)/(n−1),
    * clamped at 0 against float cancellation), so the float surface is
    * a fixed handful of identically-parenthesized double ops. Days
    * with n < 2 or zero variance emit NULL z / false flag.
    *
    * Scale shape: one (group, day) aggregate, then THREE range-frame
    * window sums over the SAME (group → day) sort — Spark plans one
    * shuffle + one sort, partitioned by group throughout; frames are
    * day-counts, never data-sized.
    */
  def rollingAnomaly(events: DataFrame, window: Int = 7,
                     zThresh: Double = 2.0): DataFrame = {
    val daily = events
      .select(col("event_type"), to_date(col("ts")).as("day"), col("v"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("v")).cast(Money).as("x"))
      .withColumn("d",
        datediff(col("day"), lit("1992-01-01").cast("date")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("d"))
      .rangeBetween(-window, -1)
    val st = daily
      .withColumn("n", count(col("x")).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val mean = sxD / nD
    val variance = greatest(
      (col("sxx").cast("double") - (sxD * sxD) / nD) / (nD - lit(1.0)),
      lit(0.0))
    val z = (col("x").cast("double") - mean) / sqrt(variance)
    st.select(col("event_type"), col("day"), col("x"), col("n"),
        when(col("n") >= 2 && variance > 0, round(z, 6)).as("z"))
      .withColumn("anomaly",
        coalesce(abs(col("z")) > zThresh, lit(false)))
  }

  /** COHEN'S KAPPA between two per-id labelings — chance-corrected
    * agreement (κ = (p₀ − pₑ)/(1 − pₑ)), the standard score for
    * "does the cheap classifier agree with the expensive one / the
    * ground truth beyond chance?" — here applied to language-ID
    * predictions vs gold labels, but generic over any two label
    * frames (annotator pairs, rule-vs-model quality gates).
    *
    * Scale shape: one id equi-join, ONE confusion aggregate
    * (|labels|² rows — label spaces are small by construction), then
    * marginal products over that tiny frame. p₀, pₑ, κ are single
    * double divisions over exact integer sums, identically
    * parenthesized in the oracle.
    */
  def cohenKappa(a: DataFrame, b: DataFrame, idCol: String,
                 aLabel: String, bLabel: String): DataFrame = {
    val conf = a.select(col(idCol).as("id"), col(aLabel).as("la"))
      .join(b.select(col(idCol).as("id"), col(bLabel).as("lb")),
        Seq("id"))
      .groupBy(col("la"), col("lb")).agg(count(lit(1)).as("n"))
    val totals = conf.agg(sum(col("n")).as("nn"),
      sum(when(col("la") === col("lb"), col("n")).otherwise(0L))
        .as("agree"))
    val peNum = conf.groupBy(col("la")).agg(sum(col("n")).as("na"))
      .join(conf.groupBy(col("lb")).agg(sum(col("n")).as("nb")),
        col("la") === col("lb"))
      .agg(sum(col("na") * col("nb")).as("pe_num"))
    val nD = col("nn").cast("double")
    val po = col("agree").cast("double") / nD
    val pe = col("pe_num").cast("double") / (nD * nD)
    totals.crossJoin(broadcast(peNum))
      .select(col("nn").as("n"), col("agree"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  /** Grouped OLS TREND (slope + intercept of y over x per group) via
    * the closed-form normal equations on EXACT sums: n, Σx, Σy, Σxy,
    * Σx² accumulate as longs/decimals (order-free, overflow-safe at
    * warehouse scale via the decimal path), and only the final
    *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)
    *   intercept = (Σy − slope·Σx) / n
    * happens in doubles — a fixed handful of IEEE ops on identical
    * inputs, bit-stable cross-engine without any sorted-fold machinery.
    * This is the one-pass distributed regression shape: a naive
    * "collect points and fit" pulls n rows to the driver; this ships
    * five numbers per group through a map-side-combined aggregate.
    */
  def trendSlope(df: DataFrame, groupCol: String, xDate: Column,
                 yCol: Column, epoch: String = "1992-01-01"): DataFrame = {
    val x = datediff(xDate.cast("date"),
      lit(java.sql.Date.valueOf(epoch)))
    val g = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(x.cast("long")).as("sx"),
      sum(yCol).as("sy"),
      sum(yCol * x).as("sxy"),
      sum(x.cast("long") * x.cast("long")).as("sxx"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    // den = 0 ⇔ constant x (a single distinct day in the group): emit
    // explicit nulls rather than NaN — a vertical "trend" has no slope
    // (ADVICE r7).
    g.select(col(groupCol), col("n"),
      round(when(den =!= lit(0.0), num / den), 6).as("slope"),
      round(when(den =!= lit(0.0), (syD - (num / den) * sxD) / nD), 6)
        .as("intercept"))
  }

  /** JOIN-DEGREE profile — the skew diagnosis to run BEFORE a big
    * join: per join key the two side degrees dₐ, d_b, the key's output
    * contribution dₐ·d_b, and its share of the estimated join size
    * Σdₐ·d_b. The top-k rows by contribution answer "will this join
    * explode, and on which keys?" — the decision input for the salted
    * plan ([[graft.operators.SkewJoin]]) vs the plain one, computed
    * from two degree aggregates instead of running the join.
    *
    * Scale shape: one keyed count per side (map-side combined), an
    * equi-join of the two |keys|-sized degree frames, a 1-row
    * broadcast total (allowlisted), top-k via TakeOrderedAndProject.
    * Never touches the fact rows twice, never materializes the join.
    */
  def joinDegreeProfile(left: DataFrame, lKey: String,
                        right: DataFrame, rKey: String,
                        k: Int = 10): DataFrame = {
    val da = left.groupBy(col(lKey).as("key"))
      .agg(count(lit(1)).as("da"))
    val db = right.groupBy(col(rKey).as("key"))
      .agg(count(lit(1)).as("db"))
    val j = da.join(db, Seq("key"))
      .select(col("key"), col("da"), col("db"),
        (col("da") * col("db")).as("contrib"))
    val tot = j.agg(sum(col("contrib")).as("est_rows"))
    j.crossJoin(broadcast(tot))
      .select(col("key"), col("da"), col("db"), col("contrib"),
        col("est_rows"),
        round(col("contrib").cast("double") / col("est_rows"), 6)
          .as("share"))
      .orderBy(col("contrib").desc, col("key"))
      .limit(k)
  }

  /** Laplace-noised group counts — the ε-differential-privacy RELEASE
    * shape (Dwork et al. '06): count per quasi-identifier group plus
    * Laplace(Δ/ε) noise, sensitivity Δ = 1 for a counting query. The
    * noise is drawn by inverse CDF — noise = −(1/ε)·sgn(u)·ln(1−2|u|)
    * for u uniform on (−½, ½) — with u derived from the md5 fingerprint
    * of the group key, NOT a CSPRNG: a seeded draw keeps the release
    * reproducible and lets the DuckDB differential gate the mechanism's
    * arithmetic exactly. A production release under a real privacy
    * budget swaps the hash for calibrated secure randomness; the
    * mechanism column is unchanged. (The suppression alternative is
    * [[kAnonymize]]; this is the additive-noise one.)
    *
    * Scale shape: ONE groupBy over the QI columns, then a pure per-row
    * noise projection — nothing else moves. The +½ hash offset keeps
    * u strictly inside (−½, ½), so ln never sees 0.
    */
  def dpNoisyCounts(df: DataFrame, keyCols: Seq[String],
                    eps: Double = 1.0): DataFrame = {
    val u = (TextOps.fingerprint64(concat_ws("|",
        keyCols.map(c => col(c).cast("string")): _*)).cast("double")
      + lit(0.5)) / lit(1152921504606846976.0) - lit(0.5)
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("n"))
      .select(keyCols.map(col) ++ Seq(col("n"),
        round(col("n") - (lit(1.0) / lit(eps)) * signum(u) *
          log(lit(1.0) - lit(2.0) * abs(u)), 6)
          .as("noisy_n")): _*)
  }

  /** First-order Markov TRANSITION MATRIX over per-user event
    * sequences: for every ordered (from_type → to_type) step, the count
    * and the row-normalized probability — the behavioral-model /
    * next-event-prediction primitive (and, on token streams, exactly a
    * bigram LM's count stage — see [[graft.operators.LangModel]]).
    *
    * Scale shape: one `lead` window partitioned by user (the event log
    * shuffles once, on user_id — groups are per-user, never global),
    * one |types|² aggregate, and a |types|-row totals broadcast for the
    * normalization. The probability is a single long/long double
    * division rounded to 6 dp — bit-stable cross-engine.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = events
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = steps
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("tot"))
    counts.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
  }

  /** Merge OVERLAPPING (or touching) intervals per partition key into
    * coverage islands — the span-union primitive under coverage
    * reporting, excision windows, and outage/uptime math. Classic
    * running-max island detection: an interval opens a new island iff
    * its start exceeds the max end seen so far in its partition.
    *
    * Scale shape: two windows over the SAME (partition, start, end)
    * sort — Spark plans one shuffle + one sort, the flag and the
    * running flag-sum reuse it — then one keyed groupBy. Partitioned
    * by `partCol` throughout; never a global sort. Columns are plain
    * longs (epoch micros here) so every compare is integer-exact.
    */
  def mergeIntervals(df: DataFrame, partCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val before = Window.partitionBy(col(partCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val upto = Window.partitionBy(col(partCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    df
      .withColumn("new_island",
        (col(startCol) > coalesce(max(col(endCol)).over(before),
          lit(Long.MinValue))).cast("long"))
      .withColumn("island", sum(col("new_island")).over(upto))
      .groupBy(col(partCol), col("island"))
      .agg(min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** WINSORIZED robust statistics per group: clip `valCol` at the
    * group's p05/p95 ORDER STATISTICS, then report the clipped mean
    * beside the clip counts — the outlier-robust aggregate to read
    * when a plain mean is hostage to a few fat-finger rows.
    *
    * The cut points are exact order statistics picked by EXPLICIT
    * integer index k = ⌈p·n⌉ computed in integer arithmetic
    * ((p·100·n + 99) DIV 100) — not percentile_disc — so the Spark
    * side and any oracle twin select the IDENTICAL element with no
    * float-boundary or engine-interpolation ambiguity (0.05·n in
    * binary floating point can straddle an integer). Value ties make
    * the picked VALUE well-defined even though row_number among ties
    * is not.
    *
    * Scale shape: one keyed window sort per group (the honest exact-
    * percentile cost, same trade as [[quartiles]] — swap approx
    * quantiles in when cut-point exactness stops mattering), a
    * group-count-sized bounds frame broadcast back, one final keyed
    * aggregate with exact decimal sums; the single division to double
    * happens per group row.
    */
  def winsorize(df: DataFrame, groupCol: String, valCol: Column,
                pLo: Int = 5, pHi: Int = 95): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col("v"))
    val ranked = df.select(col(groupCol), valCol.as("v"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(
        Window.partitionBy(col(groupCol))))
    val bounds = ranked.groupBy(col(groupCol)).agg(
      max(when(col("rn") === expr(s"(nn * $pLo + 99) DIV 100"),
        col("v"))).as("lo"),
      max(when(col("rn") === expr(s"(nn * $pHi + 99) DIV 100"),
        col("v"))).as("hi"))
    val clipped = df.select(col(groupCol), valCol.as("v"))
      .join(broadcast(bounds), Seq(groupCol))
      .select(col(groupCol),
        when(col("v") < col("lo"), lit(1L)).otherwise(lit(0L))
          .as("is_lo"),
        when(col("v") > col("hi"), lit(1L)).otherwise(lit(0L))
          .as("is_hi"),
        when(col("v") < col("lo"), col("lo"))
          .when(col("v") > col("hi"), col("hi"))
          .otherwise(col("v")).as("cv"),
        col("lo"), col("hi"))
    clipped.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(col("is_lo")).as("n_clip_lo"),
      sum(col("is_hi")).as("n_clip_hi"),
      min(col("lo")).as("lo"), min(col("hi")).as("hi"),
      round(sum(col("cv")).cast("double") /
        count(lit(1)).cast("double"), 6).as("win_mean"))
  }

  /** TIME-DECAYED counts per group — recency weighting with
    * half-life semantics, engine-exact by construction: the weight of
    * an event `k` half-lives old is the DYADIC rational 2^−k, carried
    * as the integer 2^(20−k) (0 beyond 20 half-lives — those weights
    * are below 1e-6 anyway), so the aggregation is an EXACT integer
    * sum at any scale and any partition order; ONE division by 2^20
    * lands the result. No exp(), no float fold — the freshness-
    * weighting device a data-mixing recipe needs without the
    * cross-engine exp() parity risk.
    *
    * Reference time is the corpus max date (1-row broadcast), so the
    * result is a pure function of the data.
    */
  def decayCounts(events: DataFrame, groupCol: String = "event_type",
                  halfLifeDays: Int = 30): DataFrame = {
    val ref = events.agg(max(col("ts").cast("date")).as("r"))
    events.select(col(groupCol), col("ts").cast("date").as("d"))
      .crossJoin(broadcast(ref))
      .withColumn("hl",
        expr(s"datediff(r, d) DIV $halfLifeDays"))
      .withColumn("wfp",
        when(col("hl") <= 20, expr("CAST(1 AS BIGINT) << (20 - hl)"))
          .otherwise(lit(0L)))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("wfp")).cast("double") / (1L << 20).toDouble, 6)
          .as("decayed_count"))
  }

  /** PEARSON correlation of two per-row integer signals — the
    * redundancy read between quality signals (two signals at r ≈ 1
    * are one signal; a curation stack should pay for diverse ones).
    * Inputs must already be exact longs (fixed-point-snap doubles
    * upstream); all five correlation sums shuffle as exact integers,
    * the closed form (with its sqrt) runs once on the 1-row result.
    */
  def signalCorr(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val s = df.select(xCol.as("x"), yCol.as("y")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    s.select(col("n").as("n_rows"),
      round(when(vx * vy > 0, num / sqrt(vx * vy)), 6).as("r"))
  }

  /** JOIN-STRATEGY ADVISOR — the [[joinDegreeProfile]] statistics
    * folded into the decision a planner actually takes: broadcast the
    * small side, salt when one key owns too much of the estimated
    * output, plain shuffle otherwise. Thresholds are explicit inputs
    * (row-count broadcast limit; top-key output share in percent,
    * compared in INTEGER arithmetic so the verdict has no float
    * boundary). Statistics-only: never runs the join it advises on.
    */
  def joinAdvisor(left: DataFrame, lKey: String,
                  right: DataFrame, rKey: String,
                  broadcastRows: Long = 100000L,
                  saltSharePct: Int = 20): DataFrame = {
    val da = left.groupBy(col(lKey).as("key"))
      .agg(count(lit(1)).as("da"))
    val db = right.groupBy(col(rKey).as("key"))
      .agg(count(lit(1)).as("db"))
    val j = da.join(db, Seq("key"))
      .select(col("key"), (col("da") * col("db")).as("contrib"))
    val s = j.agg(sum(col("contrib")).as("est"),
        max(col("contrib")).as("top_contrib"))
      .crossJoin(broadcast(left.agg(count(lit(1)).as("n_left"))))
      .crossJoin(broadcast(right.agg(count(lit(1)).as("n_right"))))
    s.select(col("n_left"), col("n_right"),
      col("est").as("est_join_rows"), col("top_contrib"),
      when(col("n_right") <= broadcastRows, lit("broadcast_right"))
        .when(col("n_left") <= broadcastRows, lit("broadcast_left"))
        .when(col("top_contrib") * 100 >= col("est") * saltSharePct,
          lit("salted_shuffle"))
        .otherwise(lit("shuffle")).as("decision"))
  }

  /** Cross-source QUANTILE NORMALIZATION at decile granularity — the
    * classic "average the d-th order statistics across arrays" method
    * (Bolstad et al., microarray normalization), here the curation
    * device that makes per-source quality scores COMPARABLE before a
    * single global quality cut: a score's meaning is its rank within
    * its own source, and the normalized value is what that rank is
    * worth across the whole corpus.
    *
    * Per source, docs are split into `q` equal-count rank bins
    * (ntile over a TOTAL order — score then doc_id — so the binning
    * is engine-deterministic); the normalized value of bin d is
    * Bolstad's UNWEIGHTED mean of the per-source bin-d means (each
    * source one vote, regardless of size — a pooled mean would let
    * the largest source dominate the "cross-source" value, r9
    * advisor). Output per (source, bin): population, the source's own
    * bin mean, and the normalized value.
    *
    * Determinism: the per-source bin mean is snapped to 1e-9
    * fixed-point (one rounding), so the cross-source average is an
    * order-free integer sum over the handful of sources plus one
    * final division — the engine's standard no-cross-engine-float-
    * fold device.
    *
    * Scale shape: one keyed window per source (rank bins), two keyed
    * aggregates (per source-bin, per bin), one `q`-row broadcast
    * join. Integer-exact sums; the divisions happen on bin-count-
    * sized frames.
    */
  def quantileNormalize(docs: DataFrame, srcCol: String,
                        scoreCol: Column, idCol: Column,
                        q: Int = 10): DataFrame = {
    val binned = docs.select(col(srcCol).as("source"),
        scoreCol.as("score"), idCol.as("id"))
      .withColumn("bin", ntile(q).over(
        Window.partitionBy(col("source"))
          .orderBy(col("score"), col("id"))))
    val perSrc = binned.groupBy(col("source"), col("bin")).agg(
        count(lit(1)).as("n_docs"), sum(col("score")).as("s"))
      .withColumn("mean_fp",
        round(col("s").cast("double") / col("n_docs").cast("double")
          * 1e9).cast("long"))
    val global = perSrc.groupBy(col("bin")).agg(
      count(lit(1)).as("n_sources"), sum(col("mean_fp")).as("gfp"))
    perSrc.join(broadcast(global), Seq("bin"))
      .select(col("source"), col("bin"), col("n_docs"),
        round(col("s").cast("double") / col("n_docs").cast("double"), 6)
          .as("src_mean"),
        round(col("gfp").cast("double") / 1e9
          / col("n_sources").cast("double"), 6).as("norm_value"))
  }

  /** ONE-SIDED CUSUM change-point detection (Page '54) over daily
    * per-type value totals — the SEQUENTIAL drift monitor beside
    * [[rollingAnomaly]]'s pointwise z-score: a run of individually
    * unremarkable above-reference days ACCUMULATES until the alarm
    * fires, which is exactly the failure mode (slow ingest drift, a
    * gradually degrading source) a per-day threshold misses.
    *
    * The recursion S_t = max(0, S_{t-1} + x_t − k) is not a window
    * aggregate, but its closed form is: S_t = P_t − min_{j≤t} P_j
    * with P_t = Σ_{i≤t}(x_i − k) — a prefix sum and a running min
    * over the SAME per-type day sort (one shuffle, one sort, the
    * interval-merge window-reuse idiom). With reference k = the
    * type's own mean as a RATIONAL (Σx, n), everything scales by n:
    * P′_t = n·Σ_{i≤t}x_i − t·Σx — EXACT integer arithmetic end to
    * end (values in rounded cents), alarm at S′_t > h·n with
    * h = `threshXMean`·mean, i.e. S′_t > threshXMean·Σx. No floats
    * anywhere. At Σx·n beyond ~2⁶² the decimal monoid swaps in.
    *
    * The running min must include the recursion's P₀ = 0 seed:
    * S_t = P_t − min(0, min_{j≤t} P_j). Without the 0 term a series
    * whose scaled prefix stays positive (loud head, quiet tail) has
    * S_1 forced to 0 and every later S_t shifted down by P′_min > 0
    * — alarms Page's recursion fires are silently missed.
    *
    * Output: (event_type, day, day_total_cents, cusum_scaled, alarm).
    */
  def cusumDrift(events: DataFrame, threshXMean: Int = 2): DataFrame =
    cusumFinish(
      events.select(col("event_type"),
          to_date(col("ts")).as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("x")),
      threshXMean)

  /** Shared CUSUM readout over a daily frame (event_type, day, x) —
    * the closed form of Page's recursion used verbatim by both
    * [[cusumDrift]] and the streaming twin
    * [[graft.streaming.StreamingSketch.cusumFromHistograms]] (the
    * kmFinish/benfordFinish pattern: one copy of the arithmetic,
    * two entry points).
    */
  private[graft] def cusumFinish(daily: DataFrame,
                                 threshXMean: Int): DataFrame = {
    val stats = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("sumx"), count(lit(1)).as("n"))
    val ord = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    daily.join(broadcast(stats), Seq("event_type"))
      .withColumn("t", row_number().over(ord))
      .withColumn("p",
        sum(col("x")).over(cum) * col("n") - col("t") * col("sumx"))
      .withColumn("pmin", least(lit(0L), min(col("p")).over(cum)))
      .select(col("event_type"), col("day"),
        col("x").as("day_total_cents"),
        (col("p") - col("pmin")).as("cusum_scaled"),
        (col("p") - col("pmin") > lit(threshXMean.toLong) * col("sumx"))
          .as("alarm"))
  }

  /** Daily per-type cents totals with a dense per-type time index —
    * the series derivation shared by [[theilSen]] and [[acf]] (the
    * same daily rollup [[cusumDrift]] builds inline).
    */
  private def dailySeries(events: DataFrame): DataFrame =
    events.select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("day"))))

  /** THEIL-SEN robust trend (Theil '50, Sen '68): per type, the
    * MEDIAN of all pairwise slopes of the daily series — the
    * estimator a single corrupted day cannot drag, unlike
    * [[trendSlope]]'s OLS (its breakdown point is ~29% vs OLS's one
    * point). Slopes are exact-quotient doubles (identical IEEE
    * division in any engine); the median is rank-based with the
    * (slope, t1, t2) tie-break, floor/ceil ranks averaged.
    *
    * Scale shape: the pair join is per-type quadratic IN DAYS — the
    * series length is calendar-bounded (~10³ rows/type after the
    * daily rollup), so the pair frame is ~10⁶ rows/type worst case
    * regardless of event volume; the windows partition by type.
    */
  def theilSen(events: DataFrame): DataFrame =
    theilSenFinish(dailySeries(events))

  /** The Theil-Sen readout over an (event_type, x, t) daily frame —
    * shared by the batch operator and the streaming twin's stateless
    * finish (the mannKendallFinish pattern: one more estimator off
    * the persisted per-type day histogram).
    */
  private[graft] def theilSenFinish(daily: DataFrame): DataFrame = {
    val pairs = daily.as("a")
      .join(daily.as("b"),
        col("a.event_type") === col("b.event_type")
          && col("a.t") < col("b.t"))
      .select(col("a.event_type").as("event_type"),
        col("a.t").as("t1"), col("b.t").as("t2"),
        ((col("b.x") - col("a.x")).cast("double")
          / (col("b.t") - col("a.t")).cast("double") / lit(100.0))
          .as("slope"))
    val win = Window.partitionBy(col("event_type"))
    val ranked = pairs
      .withColumn("rk", row_number().over(
        win.orderBy(col("slope").asc, col("t1").asc, col("t2").asc)))
      .withColumn("c", count(lit(1)).over(win))
    ranked
      .filter(col("rk") === floor((col("c") + 1) / 2) ||
        col("rk") === ceil((col("c") + 1) / 2))
      .groupBy(col("event_type"))
      .agg(max(col("c")).as("n_pairs"), avg(col("slope")).as("m"))
      .select(col("event_type"), col("n_pairs"),
        round(col("m"), 6).as("sen_slope"))
  }

  /** BENFORD first-digit audit (Newcomb 1881 / Benford '38) over
    * order totals in exact integer cents: observed vs expected
    * log₁₀(1 + 1/d) share per leading digit, with the per-digit χ²
    * contribution — the classic anomalous-feed / fabricated-numbers
    * screen. The leading digit comes from the INTEGER cents rendered
    * as a string (no float log10 on the data path); the only floats
    * are the nine expected shares, computed from the same ln ratio in
    * both engines.
    *
    * Scale shape: one 9-cell aggregate with map-side partials + a
    * 1-row total broadcast. 9 rows out at any scale.
    */
  def benford(orders: DataFrame): DataFrame =
    benfordFinish(orders.select(
        substring(expr(
          "CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT) AS STRING)"),
          1, 1).cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs")))

  /** The Benford arithmetic over a (digit, n_obs) histogram — shared
    * verbatim by the batch operator and the streaming twin's
    * stateless readout.
    */
  private[graft] def benfordFinish(digits: DataFrame): DataFrame = {
    val tot = digits.agg(sum(col("n_obs")).as("n"))
    digits.crossJoin(broadcast(tot))
      .withColumn("e",
        log(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          / log(lit(10.0)))
      .select(col("digit"), col("n_obs"),
        round(col("n_obs").cast("double") / col("n").cast("double"), 6)
          .as("obs_share"),
        round(col("e"), 6).as("exp_share"),
        round((col("n_obs").cast("double")
            - col("n").cast("double") * col("e"))
          * (col("n_obs").cast("double")
            - col("n").cast("double") * col("e"))
          / (col("n").cast("double") * col("e")), 6).as("chi2_term"))
  }

  /** Lag-k AUTOCORRELATION of the daily per-type series, k = 1..
    * `maxLag` — the seasonality/persistence read beside the trend and
    * drift monitors. Deviations are snapped ONCE to integer dollars
    * (round((x − mean)/100) — the fixed-point device at a scale where
    * a year of 1e8-cent days keeps Σ d·d′ far from overflow), so both
    * the lag products and the denominator are exact integer sums; one
    * division per output row. Constant series (zero denominator)
    * emit null.
    *
    * Scale shape: the series is calendar-bounded, so the lag
    * self-join and both aggregates run on ~10³-row frames per type;
    * the dev frame is localCheckpoint'd — three consumers, one
    * events-scan.
    */
  def acf(events: DataFrame, maxLag: Int = 7): DataFrame =
    acfFinish(dailySeries(events), maxLag)

  /** The ACF readout over an (event_type, x, t) daily frame — shared
    * by the batch operator and the streaming twin's stateless finish.
    */
  private[graft] def acfFinish(daily: DataFrame,
                               maxLag: Int): DataFrame = {
    val stats = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val dev = daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("t"),
        round((col("x").cast("double")
          - col("s").cast("double") / col("n").cast("double"))
          / lit(100.0)).cast("long").as("d"))
      .localCheckpoint()
    val lags = dev
      .withColumn("lag", explode(sequence(lit(1), lit(maxLag))))
      .withColumn("t2", col("t") + col("lag"))
    val num = lags
      .join(dev.select(col("event_type"), col("t").as("t2"),
        col("d").as("d2")), Seq("event_type", "t2"))
      .groupBy(col("event_type"), col("lag"))
      .agg(sum(col("d") * col("d2")).as("num"),
        count(lit(1)).as("n_terms"))
    val den = dev.groupBy(col("event_type"))
      .agg(sum(col("d") * col("d")).as("den"))
    num.join(broadcast(den), Seq("event_type"))
      .select(col("event_type"), col("lag"), col("n_terms"),
        round(when(col("den") =!= 0L,
          col("num").cast("double") / col("den").cast("double")), 6)
          .as("acf"))
  }

  /** DAY-OF-WEEK SEASONALITY PROFILE per event type — the STL-lite
    * multiplicative index beside [[acf]]'s lag view: for each
    * weekday d, index = mean(x | dow = d) / mean(x), with the share
    * of total variance the 7 indexes explain (how much of the series
    * is "it's just Tuesday"). Exact arithmetic: both means are
    * integer rationals, so the index is ONE exact-quotient division
    * per row: (Σ_d x · n) / (n_d · Σ x); the variance split uses the
    * n-scaled integer deviation device ([[cusumDrift]]'s), so the
    * explained-share is one more exact-integer quotient.
    *
    * dow is pinned engine-neutrally as the epoch-day mod 7 (day 0 =
    * 1970-01-01, a Thursday) — locale-free, unlike dayofweek().
    *
    * Scale shape: the daily rollup bounds everything by the
    * calendar; two keyed aggregates; ≤ 7 rows per type out.
    */
  def seasonality(events: DataFrame): DataFrame =
    seasonalityFinish(
      events.select(col("event_type"), to_date(col("ts")).as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("cents")).as("x")))

  /** The seasonality readout over a (event_type, day, x) daily frame
    * — shared by the batch operator and the streaming twin (the
    * cusumFinish pattern: the per-(type, day) histogram is one
    * sufficient statistic feeding multiple estimators).
    */
  private[graft] def seasonalityFinish(dailyIn: DataFrame): DataFrame = {
    val daily = dailyIn
      .withColumn("dow", pmod(unix_date(col("day")).cast("long"),
        lit(7L)))
    val tot = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("x")).as("sd"), count(lit(1)).as("nd"))
    // Variance split in n-scaled integer space: dev_i = n·x_i − Σx;
    // between-group piece per dow = n_d·(n·x̄_d − Σx)² with
    // n·x̄_d − Σx = (n·Σ_d − n_d·Σx)/n_d — keep exact by comparing
    // n_d-scaled: Σ_d (n·Σ_d − n_d·Σx)²/n_d over Σ_i (n·x_i − Σx)².
    // Squared n-scaled deviations overflow BIGINT, and a double fold
    // is shuffle-order-dependent — sum them as exact DECIMAL(38,0)
    // (HUGEINT in the twin), one double conversion at the end.
    val dev = (col("n") * col("x") - col("sx")).cast("decimal(19,0)")
    val sst = daily.join(broadcast(tot), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(dev * dev).cast("double").as("sst"))
    val bg = (col("n") * col("sd") - col("nd") * col("sx"))
      .cast("decimal(19,0)")
    byDow.join(broadcast(tot), Seq("event_type"))
      .join(broadcast(sst), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("nd").as("n_days"),
        round((col("sd") * col("n")).cast("double")
          / (col("nd") * col("sx")).cast("double"), 6).as("dow_index"),
        round(when(col("sst") > 0.0,
          (bg * bg).cast("double")
            / col("nd").cast("double") / col("sst")), 6)
          .as("var_share"))
  }

  /** mSPRT ALWAYS-VALID sequential test (Johari et al. '17 / Howard
    * et al. — the "peeking is allowed" experiment readout): over the
    * cumulative daily view−purchase diff series, the mixture
    * likelihood ratio against θ₀ = 0 with a normal mixture prior
    * τ² = σ̂²,
    *
    *   Λ_t = √(σ̂²t/(σ̂²t + t²τ²)) · exp(t²τ²·x̄_t² / (2σ̂²t·(σ̂²t…)))
    *       = √(1/(1+t)) · exp(t·x̄_t²·/(2σ̂²·(1+1/t)))   (τ² = σ̂²)
    *
    * computed per day with the always-valid p_t = min(1, min_{s≤t}
    * 1/Λ_s) — monotone by construction, so "stop the first day p
    * crosses α" is a VALID rule no matter how often it is checked.
    * σ̂² is the full-series integer-deviation variance (a fixed
    * nuisance both engines derive from the same exact integers); the
    * Λ tree is shared double arithmetic; the running min is a window
    * over the same per-type day sort.
    *
    * Output per day: (day, n_days_so_far, cum_mean_cents, lambda,
    * p_always_valid, reject_at_5pct).
    */
  def msprt(events: DataFrame, typeX: String = "view",
            typeY: String = "purchase"): DataFrame = {
    val daily = events
      .filter(col("event_type").isin(typeX, typeY))
      .select(to_date(col("ts")).as("day"),
        col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === typeX, col("cents"))
          .otherwise(0L)).as("xv"),
        sum(when(col("event_type") === typeY, col("cents"))
          .otherwise(0L)).as("yv"))
      .select(col("day"), (col("xv") - col("yv")).as("d"))
      .localCheckpoint()
    val stats = daily.agg(count(lit(1)).as("n"), sum(col("d")).as("s"))
    // n-scaled integer variance: Σ(n·d − s)² / n³ (per-day, biased).
    // The squared deviations sum as exact DECIMAL(38,0) (HUGEINT in
    // the twin) — a double fold would be shuffle-order-dependent.
    val devM = (col("n") * col("d") - col("s")).cast("decimal(19,0)")
    val varN = daily.crossJoin(broadcast(stats))
      .agg(sum(devM * devM).cast("double").as("ssq"),
        max(col("n")).as("n"))
      .select((col("ssq")
        / (col("n") * col("n") * col("n")).cast("double")).as("sig2"))
    val ord = Window.orderBy(col("day"))
    val cum = ord.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    val run = daily
      .withColumn("t", row_number().over(ord))
      .withColumn("cs", sum(col("d")).over(cum))
      .crossJoin(broadcast(varN))
      .withColumn("xbar",
        col("cs").cast("double") / col("t").cast("double"))
      .withColumn("lambda",
        sqrt(lit(1.0) / (lit(1.0) + col("t").cast("double")))
          * exp(col("t").cast("double") * col("xbar") * col("xbar")
            / (lit(2.0) * col("sig2")
              * (lit(1.0) + lit(1.0) / col("t").cast("double")))))
      .withColumn("p_av",
        least(lit(1.0),
          lit(1.0) / max(col("lambda")).over(cum)))
    run.select(col("day"), col("t").as("n_days_so_far"),
      round(col("xbar"), 6).as("cum_mean_cents"),
      round(col("lambda"), 6).as("lambda"),
      round(col("p_av"), 6).as("p_always_valid"),
      (col("p_av") < 0.05).as("reject_at_5pct"))
  }

  /** SINKHORN OPTIMAL TRANSPORT (Cuturi '13, "Sinkhorn distances:
    * lightspeed computation of optimal transport") between two
    * segments' balance-band distributions — the full-metric upgrade
    * of [[tCloseness]]'s ordered 1-D EMD: entropy-regularized OT
    * converges by simple alternating scaling (u ← a/Kv, v ← b/Kᵀu),
    * and a FIXED number of scaling rounds is exactly the kind of
    * iteration both engines can replay verbatim. The readout is the
    * transport cost ⟨diag(u)·K·diag(v), C⟩ under the |i−j| band
    * metric after `iters` rounds.
    *
    * Determinism: masses are add-one-smoothed exact rationals (no
    * zeros — Sinkhorn divides by Kv), the kernel exp(−|i−j|/ε) is a
    * shared double tree, and every Σ over the band grid — the float
    * fold Sinkhorn is made of — runs as the SORTED-FOLD device
    * (collect the ≤B terms keyed by band, fold in band order), so no
    * aggregation-order hazard exists anywhere in the loop.
    *
    * Scale shape: after two keyed aggregates over the scan, the
    * whole iteration lives on band-bounded frames (B ≤ ~11 rows,
    * B² grid); scaling vectors checkpoint per round.
    */
  def sinkhorn(customers: DataFrame, segA: String = "BUILDING",
               segB: String = "MACHINERY", eps: Double = 1.0,
               iters: Int = 5): DataFrame = {
    def fold(term: Column, key: Column): Column =
      aggregate(sort_array(collect_list(struct(key.as("k"),
        term.as("t")))), lit(0.0), (acc, x) => acc + x.getField("t"))
    val banded = customers
      .filter(col("c_mktsegment").isin(segA, segB))
      .select(col("c_mktsegment").as("seg"),
        expr("(CAST(round(c_acctbal * 100, 0) AS BIGINT) + 100000)" +
          " DIV 100000").as("band"))
    val counts = banded.groupBy(col("band"))
      .agg(sum(when(col("seg") === segA, 1L).otherwise(0L)).as("ca"),
        sum(when(col("seg") === segB, 1L).otherwise(0L)).as("cb"))
    val tot = counts.agg(sum(col("ca")).as("na"),
      sum(col("cb")).as("nb"), count(lit(1)).as("bcnt"))
    val ab = counts.crossJoin(broadcast(tot))
      .select(col("band"), col("na"), col("nb"),
        ((col("ca") + 1L).cast("double")
          / (col("na") + col("bcnt")).cast("double")).as("a"),
        ((col("cb") + 1L).cast("double")
          / (col("nb") + col("bcnt")).cast("double")).as("b"))
      .localCheckpoint()
    val grid = ab.select(col("band").as("i"), col("a"))
      .crossJoin(broadcast(ab.select(col("band").as("j"), col("b"))))
      .select(col("i"), col("j"),
        abs(col("i") - col("j")).cast("double").as("c"),
        exp(-abs(col("i") - col("j")).cast("double") / lit(eps))
          .as("kk"))
      .localCheckpoint()
    var v = ab.select(col("band").as("j"), lit(1.0).as("v"))
      .localCheckpoint()
    var u = ab.select(col("band").as("i"), lit(1.0).as("u"))
    for (_ <- 1 to iters) {
      val kv = grid.join(v, Seq("j"))
        .groupBy(col("i"))
        .agg(fold(col("kk") * col("v"), col("j")).as("kv"))
      u = ab.select(col("band").as("i"), col("a"))
        .join(kv, Seq("i"))
        .select(col("i"), (col("a") / col("kv")).as("u"))
        .localCheckpoint()
      val ku = grid.join(u, Seq("i"))
        .groupBy(col("j"))
        .agg(fold(col("kk") * col("u"), col("i")).as("ku"))
      v = ab.select(col("band").as("j"), col("b"))
        .join(ku, Seq("j"))
        .select(col("j"), (col("b") / col("ku")).as("v"))
        .localCheckpoint()
    }
    grid.join(u, Seq("i")).join(v, Seq("j"))
      .select(col("i"), col("j"),
        (col("u") * col("kk") * col("v") * col("c")).as("t"),
        (col("i") * lit(100L) + col("j")).as("ij"))
      .agg(fold(col("t"), col("ij")).as("cost"))
      .crossJoin(broadcast(tot))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        lit(iters).as("iters"),
        round(col("cost"), 6).as("sinkhorn_cost"))
  }

  /** BENJAMINI–HOCHBERG FDR control ('95) over a FAMILY of per-nation
    * chi-square independence tests (segment × balance band) — the
    * multiple-testing correction the per-nation test family was
    * missing: at 25 simultaneous tests, α = 0.05 per test fabricates
    * ~1 discovery per run; BH's step-up (reject the k smallest
    * p-values where p₍ₖ₎ ≤ k·α/m) bounds the EXPECTED false-discovery
    * share instead.
    *
    * The p-value uses the closed-form even-df chi-square survival
    * S(x) = e^(−x/2)·Σ_{j<df/2}(x/2)^j/j! — exact for even df (here
    * df = (r−1)(c−1) with 5 segments × 3 bands = 8), NULL for the
    * odd-df degenerate nations rather than an approximation. Cell
    * terms are (n·obs − rt·ct)²/(n·rt·ct) from exact integer counts
    * (zero-obs cells enumerated via the row×col grid), snapped to
    * 1e-6 fixed point so the per-nation χ² is an order-free integer
    * sum. The BH comparison cross-multiplies: p·αDen·m ≤ k·αNum on
    * engine-identical doubles; the step-up k* and the rank window
    * run over the ≤|nations|-row frame (the allowlisted tiny global
    * window).
    */
  def bhFdr(customers: DataFrame, alphaNum: Long = 1L,
            alphaDen: Long = 20L): DataFrame = {
    val banded = customers.select(col("c_nationkey"),
        col("c_mktsegment").as("seg"),
        (expr("CAST(round(c_acctbal * 100, 0) AS BIGINT)") + 100000L)
          .as("off"))
      .withColumn("band", expr("off DIV 400000"))
    val cells = banded
      .groupBy(col("c_nationkey"), col("seg"), col("band"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy(col("c_nationkey"), col("seg"))
      .agg(sum(col("obs")).as("rt"))
    val colT = cells.groupBy(col("c_nationkey"), col("band"))
      .agg(sum(col("obs")).as("ct"))
    val tot = cells.groupBy(col("c_nationkey"))
      .agg(sum(col("obs")).as("n"))
    val grid = rowT.join(colT, Seq("c_nationkey"))
      .join(tot, Seq("c_nationkey"))
      .join(cells, Seq("c_nationkey", "seg", "band"), "left")
      .na.fill(0L, Seq("obs"))
      .withColumn("diff",
        (col("n") * col("obs") - col("rt") * col("ct")).cast("double"))
      .withColumn("tfp",
        round(lit(1e6) * col("diff") * col("diff")
          / (col("n").cast("double")
            * (col("rt") * col("ct")).cast("double"))).cast("long"))
    val chi = grid.groupBy(col("c_nationkey"), col("n"))
      .agg(countDistinct(col("seg")).as("r"),
        countDistinct(col("band")).as("c"),
        sum(col("tfp")).as("sfp"))
      .withColumn("df", (col("r") - 1L) * (col("c") - 1L))
      .withColumn("chi2", col("sfp").cast("double") / lit(1e6))
    val h = col("chi2") / lit(2.0)
    val p = when(col("df") % 2L === 0L && col("df") >= 2L,
      exp(-h) * (lit(1.0)
        + when(col("df") >= 4L, h).otherwise(lit(0.0))
        + when(col("df") >= 6L, h * h / lit(2.0)).otherwise(lit(0.0))
        + when(col("df") >= 8L, h * h * h / lit(6.0))
          .otherwise(lit(0.0))))
    val withP = chi.withColumn("p_raw", p)
    val mT = withP.agg(
      sum(when(col("p_raw").isNotNull, 1L).otherwise(0L)).as("mt"))
    val ranked = withP.filter(col("p_raw").isNotNull)
      .withColumn("k", row_number().over(
        Window.orderBy(col("p_raw").asc, col("c_nationkey").asc)))
      .crossJoin(broadcast(mT))
      .withColumn("ok",
        col("p_raw") * lit(alphaDen.toDouble) * col("mt").cast("double")
          <= col("k").cast("double") * lit(alphaNum.toDouble))
    val kstar = ranked.agg(
      coalesce(max(when(col("ok"), col("k"))), lit(0)).as("kstar"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("c_nationkey"), col("n"), col("df"),
        round(col("chi2"), 6).as("chi2"),
        round(col("p_raw"), 6).as("p_value"),
        col("k").as("k_rank"),
        (col("k") <= col("kstar")).as("rejected"))
  }

  /** SPLIT-CONFORMAL PREDICTION INTERVAL (Vovk et al. / Lei et al.
    * '18 — the distribution-free coverage guarantee every "model
    * score + error bar" pipeline should ship with): hash-split the
    * orders into train/calibration/test; fit the trivial per-priority
    * mean model on train; q̂ = the ⌈(n_cal+1)(1−α)⌉-th smallest
    * absolute calibration residual; report q̂ and the MEASURED test
    * coverage of ŷ ± q̂, which the theorem guarantees ≥ 1−α in
    * expectation REGARDLESS of the model's quality — the point is
    * the wrapper, not the model.
    *
    * Exactness: the model is a per-priority integer-cents rational
    * mean, so residuals scale by n_train: |n·y − Σy| is an exact
    * integer per row, comparable across rows of one priority. The
    * quantile is a rank pick at the EXACT ⌈(n+1)(1−α)⌉ boundary
    * (integer arithmetic: rank = n_cal + 1 − (n_cal + 1) DIV 20 for
    * α = 1/20 ... computed as ceil via integers) CLAMPED to n_cal:
    * when the slice is too small for the level ((n+1)·α < 1, i.e.
    * rank n+1) the conservative q̂ = max residual is reported rather
    * than silently dropping the priority. Coverage comparison is
    * integer-vs-integer. One division per output row.
    *
    * Scale shape: one conditional keyed aggregate (train stats), one
    * rank window per priority over calibration rows, one test-side
    * keyed count. |priorities| rows out.
    */
  def conformalInterval(orders: DataFrame, alphaNum: Long = 1L,
                        alphaDen: Long = 20L): DataFrame = {
    val base = orders.select(col("o_orderpriority").as("priority"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("y"),
      pmod(TextOps.fingerprint64(
        concat(col("o_orderkey").cast("string"), lit(":conf"))),
        lit(4L)).as("slice"))
    // slice 0-1 train, 2 calibration, 3 test.
    val train = base.filter(col("slice") <= 1L)
      .groupBy(col("priority"))
      .agg(sum(col("y")).as("sy"), count(lit(1)).as("nt"))
    val cal = base.filter(col("slice") === 2L)
      .join(train, Seq("priority"))
      .select(col("priority"), col("nt"),
        abs(col("nt") * col("y") - col("sy")).as("r"))
    val calN = cal.groupBy(col("priority"))
      .agg(count(lit(1)).as("nc"), max(col("nt")).as("nt2"))
    // rank = ceil((nc+1)*(1-a)) = nc + 1 - floor((nc+1)*aNum/aDen).
    val qhat = cal
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("priority")).orderBy(col("r").asc)))
      .join(calN, Seq("priority"))
      // Clamp the rank to nc: when (nc+1)*α floors to 0 (a
      // calibration slice too small for the level, nc < aDen/aNum − 1)
      // the raw rank nc+1 matches no calibration row and the priority
      // would silently vanish — emit the conservative qhat = max
      // residual instead, so degenerate small-n slices stay visible.
      .filter(col("rk") === least(col("nc"), col("nc") + 1L
        - expr(s"(nc + 1) * $alphaNum DIV $alphaDen")))
      .select(col("priority"), col("nc"), col("r").as("qr"))
    val test = base.filter(col("slice") === 3L)
      .join(train, Seq("priority"))
      .join(qhat, Seq("priority"))
      .groupBy(col("priority"), col("nc"), col("nt"), col("sy"),
        col("qr"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(abs(col("nt") * col("y") - col("sy")) <= col("qr"),
          1L).otherwise(0L)).as("n_covered"))
    test.select(col("priority"), col("nc").as("n_cal"), col("n_test"),
      round(col("sy").cast("double") / col("nt").cast("double")
        / lit(100.0), 6).as("yhat_dollars"),
      round(col("qr").cast("double") / col("nt").cast("double")
        / lit(100.0), 6).as("qhat_dollars"),
      round(col("n_covered").cast("double")
        / col("n_test").cast("double"), 6).as("coverage"))
  }

  /** CONFORMALIZED QUANTILE REGRESSION (Romano, Patterson & Candès
    * '19) — the heteroskedastic upgrade of [[conformalInterval]]:
    * instead of a symmetric mean ± q̂ band, fit per-priority
    * empirical [α/2, 1−α/2] quantiles on the train slice, measure
    * the SIGNED two-sided nonconformity E = max(q_lo − y, y − q_hi)
    * on calibration (negative deep inside the interval, so q̂ can
    * NARROW a too-wide band — the property the symmetric variant
    * lacks), pick q̂ at the clamped ⌈(n_cal+1)(1−α)⌉ rank, and
    * report the calibrated interval [q_lo − q̂, q_hi + q̂] with its
    * measured test coverage (guaranteed ≥ 1−α in expectation,
    * model-free).
    *
    * Exactness end to end: the same md5 hash split as the mean
    * variant (suffix ':cqr'); train quantiles are rank picks over
    * integer cents (lo rank = max(1, ⌈n_t·α/2⌉), hi = n_t+1−lo, by
    * integer ceil division); E is an exact integer; the q̂ rank uses
    * the same clamped integer formula as [[conformalInterval]]; the
    * coverage test is integer-vs-integer.
    *
    * Scale shape: one rank window per priority over each of train
    * and calibration, two keyed aggregates, one test-side keyed
    * count. |priorities| rows out.
    */
  def conformalQuantile(orders: DataFrame, alphaNum: Long = 1L,
                        alphaDen: Long = 10L): DataFrame = {
    val base = orders.select(col("o_orderpriority").as("priority"),
      expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("y"),
      pmod(TextOps.fingerprint64(
        concat(col("o_orderkey").cast("string"), lit(":cqr"))),
        lit(4L)).as("slice"))
    // slice 0-1 train, 2 calibration, 3 test — the mean variant's map.
    val train = base.filter(col("slice") <= 1L)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("priority")).orderBy(col("y").asc)))
    val tn = train.groupBy(col("priority")).agg(count(lit(1)).as("nt"))
    val bounds = train.join(tn, Seq("priority"))
      .withColumn("lo_rk", greatest(lit(1L),
        expr(s"(nt * $alphaNum + ${2 * alphaDen} - 1) " +
          s"DIV ${2 * alphaDen}")))
      .withColumn("hi_rk", col("nt") + lit(1L) - col("lo_rk"))
      .groupBy(col("priority"))
      .agg(max(when(col("rk") === col("lo_rk"), col("y"))).as("qlo"),
        max(when(col("rk") === col("hi_rk"), col("y"))).as("qhi"))
    val cal = base.filter(col("slice") === 2L)
      .join(bounds, Seq("priority"))
      .select(col("priority"),
        greatest(col("qlo") - col("y"), col("y") - col("qhi")).as("e"))
    val calN = cal.groupBy(col("priority")).agg(count(lit(1)).as("nc"))
    val qhat = cal
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("priority")).orderBy(col("e").asc)))
      .join(calN, Seq("priority"))
      // the same small-slice clamp as conformalInterval
      .filter(col("rk") === least(col("nc"), col("nc") + 1L
        - expr(s"(nc + 1) * $alphaNum DIV $alphaDen")))
      .select(col("priority"), col("nc"), col("e").as("qhat"))
    val test = base.filter(col("slice") === 3L)
      .join(bounds, Seq("priority"))
      .join(qhat, Seq("priority"))
      .groupBy(col("priority"), col("nc"), col("qlo"), col("qhi"),
        col("qhat"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("y") >= col("qlo") - col("qhat")
            && col("y") <= col("qhi") + col("qhat"),
          1L).otherwise(0L)).as("n_covered"))
    test.select(col("priority"), col("nc").as("n_cal"), col("n_test"),
      round(col("qlo").cast("double") / lit(100.0), 6)
        .as("qlo_dollars"),
      round(col("qhi").cast("double") / lit(100.0), 6)
        .as("qhi_dollars"),
      round(col("qhat").cast("double") / lit(100.0), 6)
        .as("qhat_dollars"),
      round(col("n_covered").cast("double")
        / col("n_test").cast("double"), 6).as("coverage"))
  }

  /** PAIRED SIGN-FLIP PERMUTATION TEST (Fisher's randomization test,
    * the exact-inference fallback when nothing is normal): is the
    * daily view−purchase value gap real, or would random ± signs on
    * the daily differences produce a gap this large? Under the null
    * (exchangeable signs), each of the B sign patterns is equally
    * likely; p = (1 + #{b: |Σ s_b·d| ≥ |Σ d|}) / (B + 1) — the
    * add-one form that never returns p = 0.
    *
    * Determinism end to end: diffs are exact integer cents; each
    * (day, replicate) sign is the content-hash lottery (±1 from a
    * 60-bit md5 parity — the [[bootstrapCI]] device with signs in
    * place of Poisson weights); flipped sums are integer; the
    * extremity comparison is integer; p is one exact-rational
    * division rounded once. No floats anywhere before the readout.
    *
    * Scale shape: the daily rollup bounds the frame by the calendar;
    * the replicate explosion is B per day; one keyed aggregate per
    * replicate, one 1-row readout.
    */
  def signFlipTest(events: DataFrame, typeX: String = "view",
                   typeY: String = "purchase", b: Int = 64): DataFrame =
    signFlipFinish(
      events
        .filter(col("event_type").isin(typeX, typeY))
        .select(col("event_type"), to_date(col("ts")).as("day"),
          round(col("value") * 100, 0).cast("long").as("cents"))
        .groupBy(col("day"))
        .agg(sum(when(col("event_type") === typeX, col("cents"))
            .otherwise(0L)).as("x"),
          sum(when(col("event_type") === typeY, col("cents"))
            .otherwise(0L)).as("y"))
        .select(col("day"), (col("x") - col("y")).as("d")),
      b)

  /** The sign-flip readout over a (day, d) daily-diff frame — shared
    * by the batch operator and the streaming twin (the
    * cusumFinish/seasonalityFinish pattern).
    */
  private[graft] def signFlipFinish(dailyIn: DataFrame,
                                    b: Int): DataFrame = {
    val daily = dailyIn.localCheckpoint()
    val obs = daily.agg(count(lit(1)).as("n_days"),
      sum(col("d")).as("obs"))
    val reps = daily
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("s",
        lit(2L) * pmod(TextOps.fingerprint64(
          concat(col("day").cast("string"), lit(":pt"),
            col("b").cast("string"))), lit(2L)) - 1L)
      .groupBy(col("b")).agg(sum(col("s") * col("d")).as("fsum"))
    reps.crossJoin(broadcast(obs))
      .groupBy(col("n_days"), col("obs"))
      .agg(sum(when(abs(col("fsum")) >= abs(col("obs")), 1L)
        .otherwise(0L)).as("n_extreme"))
      .select(col("n_days"), col("obs").as("obs_diff_cents"),
        col("n_extreme"),
        round((col("n_extreme") + 1L).cast("double")
          / lit((b + 1).toDouble), 6).as("p_value"))
  }

  /** LJUNG-BOX portmanteau test (Ljung & Box '78) per event type —
    * the "is this series white noise AT ALL" gate over [[acf]]'s
    * lag-1..m autocorrelations: Q = n(n+2)·Σ_k r_k²/(n−k), compared
    * against the χ²(m) 5 % critical value. The one-number read that
    * says whether the per-lag acf table is worth looking at.
    *
    * Built literally ON the [[acf]] output (rounded r_k — both
    * engines consume the identical rounded table): each lag's term
    * r²/(n−k) = r²/n_terms is one double tree snapped to 1e-12 fixed
    * point, so the Σ over lags is an order-free integer sum; n
    * recovers exactly as n_terms + lag. Any null r_k (constant
    * series) nulls the whole statistic rather than silently
    * under-summing.
    */
  def ljungBox(events: DataFrame, maxLag: Int = 7,
               crit: Double = 14.067140): DataFrame = {
    val a = acf(events, maxLag)
    val terms = a.withColumn("n", col("n_terms") + col("lag"))
      .withColumn("termfp",
        round(lit(1e12) * col("acf") * col("acf")
          / col("n_terms").cast("double")).cast("long"))
    terms.groupBy(col("event_type"))
      .agg(max(col("n")).as("n_days"), count(lit(1)).as("m_lags"),
        sum(col("termfp")).as("sfp"),
        sum(when(col("acf").isNull, 1L).otherwise(0L)).as("n_null"))
      .select(col("event_type"), col("n_days"), col("m_lags"),
        round(when(col("n_null") === 0L,
          col("n_days").cast("double") * (col("n_days") + 2L)
            .cast("double") * (col("sfp").cast("double") / lit(1e12))),
          6).as("q_stat"),
        when(col("n_null") === 0L,
          round(col("n_days").cast("double") * (col("n_days") + 2L)
            .cast("double") * (col("sfp").cast("double") / lit(1e12)),
            6) > lit(crit)).as("significant"))
  }

  /** Lagged CROSS-correlation between two event types' daily series
    * (lead-lag analysis: does today's `typeX` volume predict
    * `typeY` volume k days out?) — the bivariate companion to
    * [[acf]], sharing its integer-dollar deviation snap so both the
    * lag products and the two denominators are exact integer sums.
    * Lags run −maxLag..+maxLag (negative = Y leads X), aligned on
    * CALENDAR days, not per-type row indexes, so a day missing from
    * one series simply drops out of that lag's n_terms.
    * r_k = Σ dx_t·dy_{t+k} / √(Σdx²·Σdy²); constant series → null.
    *
    * Scale shape: calendar-bounded frames throughout (the events
    * scan collapses to ≤ |days| rows per type before any join); the
    * lag explosion is 2·maxLag+1 per day.
    */
  def ccf(events: DataFrame, typeX: String = "view",
          typeY: String = "purchase", maxLag: Int = 7): DataFrame = {
    val daily = events
      .filter(col("event_type").isin(typeX, typeY))
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val stats = daily.groupBy(col("event_type"))
      .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
    val dev = daily.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("day"),
        round((col("x").cast("double")
          - col("s").cast("double") / col("n").cast("double"))
          / lit(100.0)).cast("long").as("d"))
      .localCheckpoint()
    val dx = dev.filter(col("event_type") === typeX)
      .select(col("day"), col("d"))
    val dy = dev.filter(col("event_type") === typeY)
      .select(col("day").as("day2"), col("d").as("d2"))
    val num = dx
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("day2", date_add(col("day"), col("lag")))
      .join(dy, Seq("day2"))
      .groupBy(col("lag"))
      .agg(sum(col("d") * col("d2")).as("num"),
        count(lit(1)).as("n_terms"))
    val den = dx.agg(sum(col("d") * col("d")).as("sxx"))
      .crossJoin(dy.agg(sum(col("d2") * col("d2")).as("syy")))
    num.crossJoin(broadcast(den))
      .select(col("lag"), col("n_terms"),
        round(when(col("sxx") > 0L && col("syy") > 0L,
          col("num").cast("double")
            / sqrt(col("sxx").cast("double")
              * col("syy").cast("double"))), 6).as("ccf"))
  }

  /** SIMPLE EXPONENTIAL SMOOTHING (Brown '56) of the daily per-type
    * cents series — the first member of the forecasting family beside
    * the trend/drift monitors: L_t = α·x_t + (1−α)·L_{t−1}, seeded
    * L_1 = x_1, with the in-sample one-step error power
    * SSE = Σ_{t≥2} (x_t − L_{t−1})². The level IS the h-step
    * forecast, and RMSE = √(SSE/(n−1)) is the honest backtest number
    * a mixing/capacity planner reads next to it.
    *
    * Determinism: the recursion is ORDER-DEPENDENT by definition, so
    * it folds with the sorted-fold device (collect_list + sort_array
    * + aggregate over the t-ordered series) — the exact same IEEE
    * sequence in both engines (DuckDB's list_reduce over the same
    * ORDER BY list, first-element seed == the L_1 = x_1 seed). α and
    * 1−α are both SOURCE LITERALS (0.3 / 0.7) — computing 1−α at
    * runtime would give a different double than parsing "0.7".
    *
    * Scale shape: the daily rollup bounds the series by the calendar
    * (~10³ doubles/type); one keyed collect + an O(n) fold per type.
    */
  def sesForecast(events: DataFrame): DataFrame =
    sesFinish(dailySeries(events))

  private[graft] def sesFinish(daily: DataFrame): DataFrame =
    sesKeyed(daily, Seq("event_type"))

  /** The SES fold generalized over an explicit SEGMENT KEY list (r13
    * VERDICT #6 — the mannKendallKeyed delegation discipline): keys =
    * [event_type] reproduces the global plan bit-for-bit; the
    * per-nation variant adds the segment in front, which keys the
    * collect and fold by segment — still one calendar-bounded sorted
    * array per group, no new plan shapes.
    */
  private[graft] def sesKeyed(daily: DataFrame,
                              keys: Seq[String]): DataFrame = {
    val states = transform(
      sort_array(collect_list(struct(col("t"), col("x")))),
      e => struct(e.getField("x").cast("double").as("level"),
        lit(0.0).as("sse")))
    daily.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), states.as("st"))
      .withColumn("f", aggregate(
        slice(col("st"), lit(2), greatest(size(col("st")) - 1, lit(0))),
        element_at(col("st"), 1),
        (acc, e) => struct(
          (lit(0.3) * e.getField("level")
            + lit(0.7) * acc.getField("level")).as("level"),
          (acc.getField("sse")
            + (e.getField("level") - acc.getField("level"))
            * (e.getField("level") - acc.getField("level"))).as("sse"))))
      .select(keys.map(col) ++ Seq(col("n").as("n_days"),
        round(col("f.level"), 6).as("level"),
        round(when(col("n") > 1L,
          sqrt(col("f.sse") / (col("n") - 1L).cast("double"))), 6)
          .as("rmse")): _*)
  }

  /** PER-NATION SES (r13 VERDICT #6): the same sorted-fold smoothing
    * computed independently per customer nation — the broadcast
    * nation join and per-(nation, type) daily rollup shared with
    * [[mannKendallByNation]], then [[sesKeyed]] with the segment in
    * front.
    */
  def sesByNation(events: DataFrame, customers: DataFrame): DataFrame =
    sesKeyed(dailySeriesByNation(events, customers),
      Seq("nation", "event_type"))

  /** HOLT'S LINEAR TREND smoothing (Holt '57) — the level+trend
    * member of the forecasting family: with forecast f = L + T,
    * L' = α·x + (1−α)·f and T' = β·(L'−L) + (1−β)·T, seeded
    * L_1 = x_1, T_1 = 0; SSE over the one-step errors x − f. The
    * 1-step-ahead forecast is L + T at the series end. Same
    * sorted-fold determinism contract as [[sesForecast]]; α = 0.3,
    * β = 0.2 and their complements are source literals in BOTH
    * engines.
    */
  def holtForecast(events: DataFrame): DataFrame =
    holtFinish(dailySeries(events))

  private[graft] def holtFinish(daily: DataFrame): DataFrame =
    holtKeyed(daily, Seq("event_type"))

  /** The Holt fold over an explicit SEGMENT KEY list — see
    * [[sesKeyed]]; keys = [event_type] IS the global plan.
    */
  private[graft] def holtKeyed(daily: DataFrame,
                               keys: Seq[String]): DataFrame = {
    val states = transform(
      sort_array(collect_list(struct(col("t"), col("x")))),
      e => struct(e.getField("x").cast("double").as("level"),
        lit(0.0).as("trend"), lit(0.0).as("sse")))
    def f(acc: Column) = acc.getField("level") + acc.getField("trend")
    def newLevel(acc: Column, e: Column) =
      lit(0.3) * e.getField("level") + lit(0.7) * f(acc)
    daily.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), states.as("st"))
      .withColumn("f", aggregate(
        slice(col("st"), lit(2), greatest(size(col("st")) - 1, lit(0))),
        element_at(col("st"), 1),
        (acc, e) => struct(
          newLevel(acc, e).as("level"),
          (lit(0.2) * (newLevel(acc, e) - acc.getField("level"))
            + lit(0.8) * acc.getField("trend")).as("trend"),
          (acc.getField("sse")
            + (e.getField("level") - f(acc))
            * (e.getField("level") - f(acc))).as("sse"))))
      .select(keys.map(col) ++ Seq(col("n").as("n_days"),
        round(col("f.level"), 6).as("level"),
        round(col("f.trend"), 6).as("trend"),
        round(col("f.level") + col("f.trend"), 6).as("forecast_next"),
        round(when(col("n") > 1L,
          sqrt(col("f.sse") / (col("n") - 1L).cast("double"))), 6)
          .as("rmse")): _*)
  }

  /** PER-NATION Holt — see [[sesByNation]]. */
  def holtByNation(events: DataFrame, customers: DataFrame): DataFrame =
    holtKeyed(dailySeriesByNation(events, customers),
      Seq("nation", "event_type"))

  /** TWO-PROPORTION Z-TEST — the CONVERSION-RATE member of the
    * experiment family ([[welchTTest]] tests means, [[srmCheck]]
    * tests allocation; this tests the binary outcome itself):
    * converted = the customer placed ≥ 1 order on/after `splitDate`,
    * arms from the ':prop'-suffixed md5 lottery, pooled-variance
    * z = (p₁ − p₂) / √(p̂(1−p̂)(1/n₁ + 1/n₂)) against the two-sided
    * 5% cut. All counts exact integers; one shared double tree.
    * Degenerate (p̂ ∈ {0, 1} or an empty arm) → null z, false.
    *
    * Scale shape: one keyed semi-join aggregate to |customers| rows,
    * one 4-cell fold. 1 row out.
    */
  def propZTest(customers: DataFrame, orders: DataFrame,
                splitDate: String = "1996-01-01"): DataFrame = {
    val conv = orders
      .filter(to_date(col("o_orderdate")) >= lit(splitDate).cast("date"))
      .select(col("o_custkey")).distinct()
      .withColumn("converted", lit(1L))
    val units = customers.select(col("c_custkey"))
      .join(conv, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("converted"), lit(0L)).as("cv"),
        pmod(TextOps.fingerprint64(
          concat(col("c_custkey").cast("string"), lit(":prop"))),
          lit(2L)).as("arm"))
    propZTestFinish(units)
  }

  /** Stateless finish for [[propZTest]] over a (cv, arm) unit frame —
    * factored out (r14) so the streaming twin's per-unit conversion
    * state replays the identical z arithmetic verbatim.
    */
  def propZTestFinish(units: DataFrame): DataFrame = {
    val g = units.agg(
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n2"),
      sum(when(col("arm") === 1L, col("cv")).otherwise(0L)).as("c1"),
      sum(when(col("arm") === 0L, col("cv")).otherwise(0L)).as("c2"))
    def d(c: Column) = c.cast("double")
    // Empty-arm guard (r13 ADVICE): a 0-denominator rate reads null,
    // not NaN — z/significant were already gated by `ok` below.
    val p1 = when(col("n1") > 0L, d(col("c1")) / d(col("n1")))
    val p2 = when(col("n2") > 0L, d(col("c2")) / d(col("n2")))
    val pp = d(col("c1") + col("c2")) / d(col("n1") + col("n2"))
    val se = sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / d(col("n1")) + lit(1.0) / d(col("n2"))))
    val ok = col("n1") > 0L && col("n2") > 0L &&
      pp > 0.0 && pp < 1.0
    g.select(col("n1").as("n_treat"), col("n2").as("n_control"),
      col("c1").as("conv_treat"), col("c2").as("conv_control"),
      round(p1, 6).as("rate_treat"), round(p2, 6).as("rate_control"),
      round(when(ok, (p1 - p2) / se), 6).as("z"),
      coalesce(when(ok, abs((p1 - p2) / se) > lit(1.959964)),
        lit(false)).as("significant"))
  }

  /** McNEMAR'S TEST (McNemar '47), continuity-corrected — the PAIRED
    * binary member of the experiment family: [[propZTest]] compares
    * two INDEPENDENT arms' conversion; McNemar asks whether the SAME
    * units flipped state across the split date (pre-only vs
    * post-only customers — the discordant pairs b and c; concordant
    * units carry no information):
    *
    *   χ² = (max(|b − c| − 1, 0))² / (b + c)   against the 1-df cut.
    *
    * Determinism: b and c are exact integer counts; the corrected
    * numerator squares in LONGs; one double division. b + c = 0 →
    * null χ², false.
    *
    * Scale shape: one keyed aggregate to |customers| rows, one 2-cell
    * fold. 1 row out.
    */
  def mcnemar(customers: DataFrame, orders: DataFrame,
              splitDate: String = "1996-01-01"): DataFrame = {
    val cut = lit(splitDate).cast("date")
    val per = orders.select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"))
      .groupBy(col("o_custkey"))
      .agg(max(when(col("d") < cut, 1L).otherwise(0L)).as("pre"),
        max(when(col("d") >= cut, 1L).otherwise(0L)).as("post"))
    val units = customers.select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("pre"), lit(0L)).as("pre"),
        coalesce(col("post"), lit(0L)).as("post"))
    mcnemarFinish(units)
  }

  /** Stateless finish for [[mcnemar]] over a (pre, post) flag frame —
    * factored out (r14) for the streaming twin (see
    * [[propZTestFinish]]).
    */
  def mcnemarFinish(units: DataFrame): DataFrame = {
    val g = units.agg(count(lit(1)).as("n_units"),
      sum(when(col("pre") === 1L && col("post") === 0L, 1L)
        .otherwise(0L)).as("b"),
      sum(when(col("pre") === 0L && col("post") === 1L, 1L)
        .otherwise(0L)).as("c"))
    val d = greatest(abs(col("b") - col("c")) - 1L, lit(0L))
    val chi2 = (d * d).cast("double") / (col("b") + col("c")).cast("double")
    g.select(col("n_units"), col("b").as("pre_only"),
      col("c").as("post_only"),
      round(when(col("b") + col("c") > 0L, chi2), 6).as("chi2"),
      coalesce(when(col("b") + col("c") > 0L, chi2 > lit(3.841459)),
        lit(false)).as("significant"))
  }

  /** PETTITT changepoint test (Pettitt '79) per event type — the
    * rank-based single-changepoint location beside [[cusumDrift]]'s
    * sequential alarm: K = max_t |U_t| with U_t = Σ_{i≤t}Σ_{j>t}
    * sgn(x_j − x_i), located WITHOUT assuming a distribution.
    *
    * The O(n²) double sum collapses by ranks: with doubled midranks
    * r₂ ([[mannWhitney]]'s device), V_t = Σ_k sgn(x_t − x_k) =
    * r₂_t − (n+1) EXACTLY (ties included), and U_t = −Σ_{s≤t} V_s —
    * one rank window + one cumulative window per type, all integer.
    * Σ r₂ = n(n+1) guarantees U_n = 0, so the split search runs over
    * t < n. The only floats are the approximate significance
    * p ≈ 2·exp(−6K²/(n³+n²)) and its 0.05 comparison, computed from
    * the same exact integers in both engines. The changepoint day is
    * the EARLIEST day attaining K (exact integer tie-break);
    * constant series (K = 0) emit a null changepoint.
    *
    * Scale shape: the daily rollup bounds every frame by the
    * calendar; windows partition by type.
    */
  def pettitt(events: DataFrame): DataFrame =
    pettittFinish(dailySeries(events))

  /** The Pettitt readout over an (event_type, day, x, t) daily frame
    * — shared by the batch operator and the streaming twin's
    * stateless finish (cp_day needs the calendar day, not just t).
    */
  private[graft] def pettittFinish(daily: DataFrame): DataFrame = {
    val wT = Window.partitionBy(col("event_type"))
    val r2 = lit(2L) * rank().over(wT.orderBy(col("x"))) +
      count(lit(1)).over(
        Window.partitionBy(col("event_type"), col("x"))) - 1L
    val u = daily
      .withColumn("n", count(lit(1)).over(wT))
      .withColumn("v", r2 - col("n") - 1L)
      .withColumn("u",
        -sum(col("v")).over(wT.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("t") < col("n"))
      .localCheckpoint()
    val k = u.groupBy(col("event_type"))
      .agg(max(abs(col("u"))).as("k_stat"), max(col("n")).as("n"))
    val cp = u.join(k, Seq("event_type"))
      .filter(abs(col("u")) === col("k_stat"))
      .groupBy(col("event_type"))
      .agg(min(col("day")).as("cp"))
    val nD = col("n").cast("double")
    val p = lit(2.0) * exp(lit(-6.0) * col("k_stat").cast("double")
      * col("k_stat").cast("double") / (nD * nD * nD + nD * nD))
    k.join(cp, Seq("event_type"))
      .select(col("event_type"), col("n").as("n_days"), col("k_stat"),
        when(col("k_stat") > 0L, col("cp")).as("cp_day"),
        round(least(p, lit(1.0)), 6).as("p_approx"),
        (least(p, lit(1.0)) < 0.05).as("significant"))
  }

  /** Cumulative Poisson(1) CDF cut points (e⁻¹·Σ 1/k!) shared by the
    * Spark side and the DuckDB twin — the inverse-CDF lottery that
    * turns one uniform per (row, replicate) into a bootstrap weight.
    */
  val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
    0.9999167588507119)

  /** POISSON-BOOTSTRAP confidence interval (Chamandy et al. '12,
    * "Estimating uncertainty for massive data streams" — the bootstrap
    * that scales: resampling n-out-of-n needs coordinated global
    * sampling, but Poisson(1) weights are independent per (row,
    * replicate), so each mapper weights its rows locally and the B
    * replicate means reduce map-side like any aggregate). Per source:
    * the exact mean of an integer metric plus a [lo, hi] band from the
    * ranked replicate means.
    *
    * Determinism: the weight is a pure function of a 60-bit content
    * hash of (key, replicate) — the [[graft.operators.Sampling]]
    * lottery device — through the shared [[PoissonCdf]] cut points;
    * replicate sums are integer; the only floats are one IEEE division
    * per (source, replicate) cell and the rank ordering over those
    * exact quotients (tie-broken by replicate id), identical in any
    * engine. The band rule is rank-based: lo = the `loRank`-th
    * smallest replicate mean, hi = the `loRank`-th largest (loRank 2
    * of B = 64 ≈ a central ~95 % band).
    *
    * Scale shape: the ×B explode never shuffles — partial aggregation
    * collapses it to ≤ |sources|·B cells per map partition; the
    * windows partition by source over exactly B rows. Nothing
    * data-sized crosses the wire after the first partial aggregate.
    */
  def bootstrapCI(docs: DataFrame, srcCol: String, keyCol: Column,
                  metric: Column, b: Int = 64, loRank: Int = 2)
      : DataFrame = {
    val d = docs.select(col(srcCol).as("source"),
      keyCol.cast("string").as("k"), metric.cast("long").as("x"))
    val u = TextOps.fingerprint64(
        concat(col("k"), lit(":bs"), col("b").cast("string")))
      .cast("double") / lit(1152921504606846976.0)
    val w = PoissonCdf.zipWithIndex
      .foldRight(lit(PoissonCdf.size.toLong)) { case ((c, i), acc) =>
        when(col("u") < c, i.toLong).otherwise(acc)
      }
    val cells = d
      .withColumn("b", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u", u).withColumn("w", w)
      .groupBy(col("source"), col("b"))
      .agg(sum(col("w")).as("n"), sum(col("w") * col("x")).as("s"))
      .filter(col("n") > 0)
      .withColumn("m", col("s").cast("double") / col("n").cast("double"))
    val asc = Window.partitionBy(col("source"))
      .orderBy(col("m").asc, col("b").asc)
    val desc = Window.partitionBy(col("source"))
      .orderBy(col("m").desc, col("b").desc)
    val ranked = cells.withColumn("rk", row_number().over(asc))
      .withColumn("rkd", row_number().over(desc))
    val base = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"))
    base
      .join(ranked.filter(col("rk") === loRank)
        .select(col("source"), col("m").as("mlo")), Seq("source"))
      .join(ranked.filter(col("rkd") === loRank)
        .select(col("source"), col("m").as("mhi")), Seq("source"))
      .select(col("source"), col("n_docs"),
        round(col("sx").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_metric"),
        round(col("mlo"), 6).as("ci_lo"),
        round(col("mhi"), 6).as("ci_hi"))
  }

  /** KAPLAN-MEIER survival estimate (Kaplan & Meier '58) over
    * right-censored order-completion durations: per priority class,
    * S(t) = Π_{t'≤t} (1 − d_t'/n_t') where d is completions at
    * duration t' and n the at-risk count — the censoring-aware answer
    * to "how long until an order completes" that a plain duration
    * histogram gets wrong (open orders at the as-of date are evidence
    * of survival, not missing data). An order's duration runs from
    * o_orderdate to its last shipment max(l_shipdate); completions
    * after `asOf` are censored at the as-of date.
    *
    * Determinism: the survival product is a cumulative PRODUCT — the
    * classic cross-engine float fold. The ln device applies: each
    * event row's ln(1 − d/n) is rounded ONCE to a 1e6 fixed-point
    * long (the d = n "everyone dies" row takes a −1e12 sentinel whose
    * exp underflows to 0 in both engines), the cumulative sum is
    * integer window arithmetic, and one exp per output row finishes.
    *
    * Scale shape: one keyed max over lineitem, one keyed count, then
    * every window partitions by priority over the distinct-duration
    * frame — bounded by the duration range in DAYS, not by data size.
    */
  def kaplanMeier(orders: DataFrame, lineitem: DataFrame,
                  asOf: String = "1998-06-01"): DataFrame =
    kmFinish(kmDurations(orders, lineitem, asOf)
      .groupBy(col("priority"), col("t"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c")))

  /** The duration/censor split under [[kaplanMeier]]: (priority, t,
    * ev) per order — the row shape the streaming twin ingests.
    */
  def kmDurations(orders: DataFrame, lineitem: DataFrame,
                  asOf: String = "1998-06-01"): DataFrame = {
    val cutoff = lit(asOf).cast("date")
    val comp = lineitem.groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("completion"))
    orders.select(col("o_orderkey"),
        col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("odate"))
      .filter(col("odate") <= cutoff)
      .join(comp, col("o_orderkey") === col("l_orderkey"))
      .select(col("priority"),
        when(col("completion") <= cutoff,
          datediff(col("completion"), col("odate")))
          .otherwise(datediff(cutoff, col("odate")))
          .cast("long").as("t"),
        when(col("completion") <= cutoff, 1L).otherwise(0L).as("ev"))
  }

  /** The KM estimator finish over a (priority, t, d, c) distinct-
    * duration frame — shared verbatim by the batch operator and the
    * streaming twin's stateless readout (n_total = Σ(d + c), so no
    * second input is needed).
    */
  private[graft] def kmFinish(times: DataFrame): DataFrame = {
    val cum = Window.partitionBy(col("priority")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val risk = kmRisk(times)
    val terms = risk.withColumn("lnterm",
      when(col("d") === 0L, lit(0L))
        .when(col("d") === col("n_risk"), lit(-1000000000000L))
        .otherwise(round(log((col("n_risk") - col("d")).cast("double")
          / col("n_risk").cast("double")) * 1e6).cast("long")))
    terms.withColumn("lnsum", sum(col("lnterm")).over(cum))
      .filter(col("d") > 0)
      .select(col("priority"), col("t").as("t_days"), col("n_risk"),
        col("d").as("n_events"), col("c").as("n_censored"),
        round(exp(col("lnsum").cast("double") / lit(1e6)), 6)
          .as("survival"))
  }

  /** The shared at-risk chain under [[kmFinish]] and [[naFinish]]:
    * per-priority totals broadcast back, removed-so-far cumulative
    * window, n_risk = n_total − removed.
    */
  private def kmRisk(times: DataFrame): DataFrame = {
    val tot = times.groupBy(col("priority"))
      .agg(sum(col("d") + col("c")).as("n_total"))
    val cum = Window.partitionBy(col("priority")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    times.join(broadcast(tot), Seq("priority"))
      .withColumn("removed",
        sum(col("d") + col("c")).over(cum) - col("d") - col("c"))
      .withColumn("n_risk", col("n_total") - col("removed"))
  }

  /** NELSON-AALEN cumulative hazard (Nelson '72, Aalen '78) over the
    * same right-censored durations as [[kaplanMeier]] — the additive
    * twin of KM's multiplicative survival: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ.
    * Where KM answers "what share survives past t", the hazard slope
    * answers "is the completion RATE rising or falling with age" —
    * the readout that separates wear-out from burn-in, and the one
    * that stays estimable when KM's product hits a d = n plateau.
    * Also reports the Fleming-Harrington survival exp(−H), the
    * small-sample-friendlier alternative to the KM product.
    *
    * Determinism: each dᵢ/nᵢ term is one exact-integer-ratio IEEE
    * division rounded ONCE to a 1e6 fixed-point long; the cumulative
    * sum is integer window arithmetic; one division (and one exp)
    * per output row finishes — the kmFinish ln device with d/n in
    * place of ln(1 − d/n).
    */
  def nelsonAalen(orders: DataFrame, lineitem: DataFrame,
                  asOf: String = "1998-06-01"): DataFrame =
    naFinish(kmDurations(orders, lineitem, asOf)
      .groupBy(col("priority"), col("t"))
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c")))

  /** The NA estimator finish over a (priority, t, d, c) frame —
    * shared by the batch operator and the streaming twin's stateless
    * readout (same contract as [[kmFinish]], same [[kmRisk]] chain).
    */
  private[graft] def naFinish(times: DataFrame): DataFrame = {
    val cum = Window.partitionBy(col("priority")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kmRisk(times)
      .withColumn("hterm",
        round(col("d").cast("double") / col("n_risk").cast("double")
          * 1e6).cast("long"))
      .withColumn("hsum", sum(col("hterm")).over(cum))
      .filter(col("d") > 0)
      .select(col("priority"), col("t").as("t_days"), col("n_risk"),
        col("d").as("n_events"), col("c").as("n_censored"),
        round(col("hsum").cast("double") / lit(1e6), 6)
          .as("cum_hazard"),
        round(exp(-col("hsum").cast("double") / lit(1e6)), 6)
          .as("fh_survival"))
  }

  /** MANN-KENDALL TREND TEST (Mann '45, Kendall '48) per event type
    * — the SIGNIFICANCE companion [[theilSen]] lacks: is the daily
    * series' monotone trend real? S = Σ_{i<j} sign(x_j − x_i) over
    * the day-ordered series, Var(S) = [n(n−1)(2n+5) −
    * Σ_ties t(t−1)(2t+5)]/18 (the standard tie correction), and the
    * continuity-corrected z = (S∓1)/√Var against the two-sided 5%
    * normal cut. The canonical pairing: Theil-Sen GIVES the robust
    * slope, Mann-Kendall SAYS whether to believe it — both over the
    * same exact integer-cents daily rollup.
    *
    * Determinism: S and the tie sum are exact integers; Var is ONE
    * double division by 18; z is one more division; all thresholds
    * are pinned literals. Degenerate Var = 0 (all days tied, or
    * n < 2) → null z, false significance.
    *
    * Scale shape: [[theilSen]]'s argument verbatim — the pair join
    * runs per type over the CALENDAR-bounded daily frame (≤ |days|²
    * rows per type, never data-sized); one keyed aggregate each for
    * S, ties, and n.
    */
  def mannKendall(events: DataFrame): DataFrame =
    mannKendallFinish(dailySeries(events))

  /** The MK readout over a (event_type, x, t) daily frame — shared
    * by the batch operator and the streaming twin's stateless finish
    * (the cusumFinish pattern: one more estimator off the persisted
    * per-type day histogram).
    */
  private[graft] def mannKendallFinish(daily: DataFrame): DataFrame =
    mannKendallKeyed(daily, Seq("event_type"))

  /** The MK readout generalized over an explicit SEGMENT KEY list
    * (VERDICT r12 #4): the per-type form is keys = [event_type]; the
    * per-nation catalog variant adds the segment in front, which
    * PARTITIONS every window and pair join by segment — the day-index
    * panel is still calendar-bounded per segment, and no global
    * window remains anywhere in the keyed plan.
    */
  private[graft] def mannKendallKeyed(daily: DataFrame,
                                      keys: Seq[String]): DataFrame = {
    val s = daily.as("a")
      .join(daily.as("b"),
        keys.map(k => col(s"a.$k") === col(s"b.$k"))
          .reduce(_ && _) && col("a.t") < col("b.t"))
      .groupBy(keys.map(k => col(s"a.$k").as(k)): _*)
      .agg(sum(signum((col("b.x") - col("a.x")).cast("double"))
        .cast("long")).as("s_stat"))
    val nD = daily.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
    val ties = daily.groupBy(keys.map(col) :+ col("x"): _*)
      .agg(count(lit(1)).as("tc"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("tc") * (col("tc") - 1L)
        * (lit(2L) * col("tc") + 5L)).as("tsum"))
    val varS = (
      (col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L)
        - col("tsum")).cast("double") / lit(18.0))
    val z = when(col("var_s") > 0.0,
      when(col("s_stat") > 0L,
        (col("s_stat") - 1L).cast("double") / sqrt(col("var_s")))
        .when(col("s_stat") < 0L,
          (col("s_stat") + 1L).cast("double") / sqrt(col("var_s")))
        .otherwise(lit(0.0)))
    nD.join(ties, keys)
      .join(s, keys, "left") // 1-day segment: no pairs, S = 0
      .withColumn("s_stat", coalesce(col("s_stat"), lit(0L)))
      .withColumn("var_s", varS)
      .withColumn("z", z)
      .select(keys.map(col) ++ Seq(col("n").as("n_days"), col("s_stat"),
        round(col("var_s"), 6).as("var_s"),
        round(col("z"), 6).as("z"),
        coalesce(abs(col("z")) > lit(1.959964), lit(false))
          .as("significant")): _*)
  }

  /** PER-NATION Mann-Kendall (VERDICT r12 #4, the per-segment form):
    * the same exact-integer trend test computed independently per
    * customer nation — events key to customers by user_id, the
    * nation dim rides a broadcast join, and every window/pair join
    * partitions by (nation, event_type). The segmented panel is
    * ≤ |nations|·|types|·|days|² — still calendar-bounded.
    */
  def mannKendallByNation(events: DataFrame,
                          customers: DataFrame): DataFrame =
    mannKendallKeyed(dailySeriesByNation(events, customers),
      Seq("nation", "event_type"))

  /** Daily per-(nation, type) cents totals with a dense per-segment
    * time index — [[dailySeries]] with the nation segment in front,
    * shared by every per-nation sequential stat (MK, SES, Holt).
    */
  private def dailySeriesByNation(events: DataFrame,
                                  customers: DataFrame): DataFrame =
    withNation(events, customers)
      .select(col("nation"), col("event_type"),
        to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .groupBy(col("nation"), col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("nation"), col("event_type"))
          .orderBy(col("day"))))

  /** Events keyed to the customer nation — the shared segment join
    * under the per-nation sequential stats (broadcast dim, exactly
    * the D4 FK-resolution shape).
    */
  private def withNation(events: DataFrame,
                         customers: DataFrame): DataFrame =
    events.join(broadcast(customers.select(col("c_custkey"),
        col("c_nationkey").cast("long").as("nation"))),
      col("user_id") === col("c_custkey"))

  /** DIFFERENCE-IN-DIFFERENCES, panel form (the Card–Krueger '94
    * design) — the experiment family's quasi-experimental member
    * beside [[welchTTest]]/[[cuped]]/[[mde]]: per-customer pre/post
    * spend around `splitDate`, a hash arm split, and the effect
    * estimated on the per-unit CHANGE D_i = post_i − pre_i:
    * DiD = D̄_T − D̄_C, which nets out both the common time shock
    * (the post-period level change every unit shares) and every
    * time-invariant unit effect — the parallel-trends design. With
    * the same units observed in both periods this IS the Welch test
    * on differenced outcomes (the efficient panel form; the 2×2
    * cell-variance form would ignore the within-unit pairing), so
    * the t readout reuses [[welchTTest]]'s closed form against the
    * large-sample 1.959964 cut.
    *
    * Determinism: per-customer pre/post are exact integer dollars;
    * all six moments fold exactly (DECIMAL(38,0) for ΣD²); the four
    * cell means, DiD, SE and t are one shared double tree. The hash
    * lottery is the ':did'-suffixed md5 device, so a null split on
    * unshifted data reads DiD ≈ 0 / not significant.
    *
    * Scale shape: one keyed aggregate to |customers| rows, one
    * 6-moment global fold. 1 row out.
    */
  def diffInDiff(customers: DataFrame, orders: DataFrame,
                 splitDate: String = "1996-01-01"): DataFrame = {
    val cut = lit(splitDate).cast("date")
    val per = orders.select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        expr("CAST(round(o_totalprice, 0) AS BIGINT)").as("v"))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("d") >= cut, col("v")).otherwise(0L))
          .as("post"),
        sum(when(col("d") < cut, col("v")).otherwise(0L)).as("pre"))
    val units = customers.select(col("c_custkey"))
      .join(per, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("post"), lit(0L)).as("post"),
        coalesce(col("pre"), lit(0L)).as("pre"),
        pmod(TextOps.fingerprint64(
          concat(col("c_custkey").cast("string"), lit(":did"))),
          lit(2L)).as("arm"))
    didFinish(units)
  }

  /** The DiD readout over a (pre, post, arm) per-unit frame — shared
    * by the batch operator and the streaming twin's stateless finish
    * (per-unit pre/post integer sums are mergeable state; the Welch
    * surface is a pure function of the finished unit table).
    */
  private[graft] def didFinish(unitsIn: DataFrame): DataFrame = {
    val units = unitsIn
      .withColumn("dif", col("post") - col("pre"))
    def cell(arm: Long, c: Column) = sum(when(col("arm") === arm, c)
      .otherwise(lit(0L)))
    val g = units.agg(
      sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("nt"),
      sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("nc"),
      cell(1L, col("pre")).as("pre_t"), cell(0L, col("pre")).as("pre_c"),
      cell(1L, col("post")).as("post_t"),
      cell(0L, col("post")).as("post_c"),
      sum(when(col("arm") === 1L,
        (col("dif") * col("dif")).cast("decimal(38,0)"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("qt"),
      sum(when(col("arm") === 0L,
        (col("dif") * col("dif")).cast("decimal(38,0)"))
        .otherwise(lit(0L).cast("decimal(38,0)"))).as("qc"))
    def mean(s: Column, n: Column) = s.cast("double") / n.cast("double")
    val dT = col("post_t") - col("pre_t")
    val dC = col("post_c") - col("pre_c")
    val did = mean(dT, col("nt")) - mean(dC, col("nc"))
    def va(q: Column, s: Column, n: Column) = greatest(
      (q.cast("double")
        - (s.cast("double") * s.cast("double")) / n.cast("double"))
        / (n.cast("double") - lit(1.0)), lit(0.0))
    val se2 = (va(col("qt"), dT, col("nt")) / col("nt").cast("double")
      + va(col("qc"), dC, col("nc")) / col("nc").cast("double"))
    val ok = col("nt") > 1L && col("nc") > 1L && se2 =!= lit(0.0)
    g.select(col("nt").as("n_treat"), col("nc").as("n_control"),
      round(mean(col("pre_t"), col("nt")), 6).as("pre_mean_t"),
      round(mean(col("pre_c"), col("nc")), 6).as("pre_mean_c"),
      round(mean(col("post_t"), col("nt")), 6).as("post_mean_t"),
      round(mean(col("post_c"), col("nc")), 6).as("post_mean_c"),
      round(did, 6).as("did_dollars"),
      round(when(ok, did / sqrt(se2)), 6).as("t_stat"),
      coalesce(when(ok, abs(did / sqrt(se2)) > lit(1.959964)),
        lit(false)).as("significant"))
  }

  /** GRANGER CAUSALITY, lag-1, both directions (Granger '69) — the
    * PREDICTIVE member of the lead-lag family: [[ccf]] asks whether
    * the two daily series CO-MOVE at a lag; Granger asks whether
    * yesterday's X improves the prediction of today's Y BEYOND
    * yesterday's Y itself — the nested-model comparison
    *
    *   restricted:   y_t ~ β0 + β1·y_{t−1}            (RSS₀)
    *   unrestricted: y_t ~ β0 + β1·y_{t−1} + β2·x_{t−1}  (RSS₁)
    *   F = (RSS₀ − RSS₁)·(n − 3) / RSS₁
    *
    * judged against the asymptotic χ²(1) 5% cut 3.841459 (the Wald
    * form — with one restriction the F statistic is asymptotically
    * χ²(1); the pinned constant keeps the decision engine-exact
    * where an exact F(1, n−3) quantile would need the incomplete
    * beta). Both directions are emitted — Granger is directional,
    * and the view↔purchase pair is exactly the case where X→Y holds
    * while Y→X does not.
    *
    * Determinism: the lag frame is an equality self-join on the day
    * index; every Gram moment is an exact DECIMAL(38,0)/HUGEINT sum
    * of integer-cents products cast to double ONCE ([[olsMulti]]'s
    * device); the 3×3 Cramer solve, the 2×2 restricted solve, both
    * RSS and F are one shared double tree. Degenerate designs
    * (singular Gram, RSS₁ ≤ 0) → null F, false significance.
    *
    * Scale shape: the events scan collapses to the calendar-bounded
    * day pivot before anything else; the lag join is keyed on the
    * day index; two 10-moment aggregates. 2 rows out.
    */
  def granger(events: DataFrame, typeX: String = "view",
              typeY: String = "purchase"): DataFrame =
    grangerFinish(xyDaily(events, typeX, typeY), typeX, typeY)

  /** The shared TWO-SERIES calendar pivot under [[granger]] and
    * [[kendallTau]] (and their streaming twins' stateless finishes):
    * the (day, x, y) joined daily cents frame over days where BOTH
    * types fired — the cusumFinish split discipline, one copy of the
    * pivot arithmetic.
    */
  private[graft] def xyDaily(events: DataFrame, typeX: String,
                             typeY: String): DataFrame =
    xyDailyKeyed(events, typeX, typeY, Nil)

  /** [[xyDaily]] generalized over a SEGMENT KEY list already present
    * on the event rows (VERDICT r12 #4): the pivot groups by
    * (keys, day) and keeps only (segment, day) cells where both
    * types fired.
    */
  private[graft] def xyDailyKeyed(events: DataFrame, typeX: String,
                                  typeY: String,
                                  keys: Seq[String]): DataFrame =
    events
      .filter(col("event_type").isin(typeX, typeY))
      .select(keys.map(col) ++ Seq(to_date(col("ts")).as("day"),
        col("event_type"),
        round(col("value") * 100, 0).cast("long").as("cents")): _*)
      .groupBy(keys.map(col) :+ col("day"): _*)
      .agg(sum(when(col("event_type") === typeX, col("cents"))
          .otherwise(0L)).as("x"),
        sum(when(col("event_type") === typeY, col("cents"))
          .otherwise(0L)).as("y"),
        max(when(col("event_type") === typeX, 1L).otherwise(0L))
          .as("hx"),
        max(when(col("event_type") === typeY, 1L).otherwise(0L))
          .as("hy"))
      .filter(col("hx") === 1L && col("hy") === 1L)
      .select(keys.map(col) ++ Seq(col("day"), col("x"), col("y")): _*)

  /** The Granger readout over a (day, x, y) joined daily frame —
    * shared by the batch operator and the streaming twin (the
    * mannKendallFinish pattern: one more estimator off the persisted
    * per-type day histogram).
    */
  private[graft] def grangerFinish(dailyXY: DataFrame, typeX: String,
                                   typeY: String): DataFrame =
    grangerKeyed(dailyXY, typeX, typeY, Nil)

  /** PER-NATION lag-1 Granger (VERDICT r12 #4): both directions per
    * customer nation — the keyed form of [[granger]], with the day
    * index window PARTITIONED by nation (the global form's one
    * allowlisted calendar window disappears), the lag join keyed on
    * (nation, t), and one 14-moment aggregate per nation.
    */
  def grangerByNation(events: DataFrame, customers: DataFrame,
                      typeX: String = "view",
                      typeY: String = "purchase"): DataFrame =
    grangerKeyed(
      xyDailyKeyed(withNation(events, customers), typeX, typeY,
        Seq("nation")),
      typeX, typeY, Seq("nation"))

  /** The Granger readout generalized over an explicit SEGMENT KEY
    * list — keys empty reproduces the global plan bit-for-bit
    * (groupBy() IS the global aggregate; an empty partition list IS
    * the global window).
    */
  private[graft] def grangerKeyed(dailyXY: DataFrame, typeX: String,
                                  typeY: String,
                                  keys: Seq[String]): DataFrame = {
    val daily = dailyXY
      .withColumn("t", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(col("day"))))
    val lagf = daily.as("c")
      .join(daily.select(keys.map(col) ++ Seq((col("t") + 1).as("t"),
        col("x").as("xl"), col("y").as("yl")): _*),
        keys :+ "t")
      .select(keys.map(col) ++ Seq(col("x"), col("y"), col("xl"),
        col("yl")): _*)
    def d38(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    // ONE 14-moment pass, checkpointed to a 1-row frame: both
    // directions share the lag moments (the two designs are the same
    // Gram matrix with target/feature roles swapped), and the
    // checkpoint severs the union branches from the windowed
    // self-join lineage — unioning two per-direction aggregates over
    // that lineage MISBOUND attributes between the legs (observed: a
    // negative F, i.e. RSS0 < RSS1, which is algebraically
    // impossible; the single-leg plan was correct).
    val g = lagf.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"),
      d38(col("yl")).as("l1"), d38(col("xl")).as("l2"),
      d38(col("yl") * col("yl")).as("l11"),
      d38(col("yl") * col("xl")).as("l12"),
      d38(col("xl") * col("xl")).as("l22"),
      d38(col("y")).as("ty"), d38(col("x")).as("tx"),
      d38(col("yl") * col("y")).as("y1"),
      d38(col("xl") * col("y")).as("y2"),
      d38(col("xl") * col("x")).as("x1"),
      d38(col("yl") * col("x")).as("x2"),
      d38(col("y") * col("y")).as("qy"),
      d38(col("x") * col("x")).as("qx"))
      .localCheckpoint()
    def det3(a11: Column, a12: Column, a13: Column,
             a21: Column, a22: Column, a23: Column,
             a31: Column, a32: Column, a33: Column): Column =
      a11 * (a22 * a33 - a23 * a32) - a12 * (a21 * a33 - a23 * a31) +
        a13 * (a21 * a32 - a22 * a31)
    def dir(label: String, s1: Column, s2: Column, s11: Column,
            s12: Column, s22: Column, sy: Column, s1y: Column,
            s2y: Column, syy: Column): DataFrame = {
      val nD = col("n").cast("double")
      val det = det3(nD, s1, s2, s1, s11, s12, s2, s12, s22)
      val b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
      val b1 = det3(nD, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
      val b2 = det3(nD, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
      val rss1 = syy - (b0 * sy + b1 * s1y + b2 * s2y)
      val den0 = nD * s11 - s1 * s1
      val a1 = (nD * s1y - s1 * sy) / den0
      val a0 = (sy - a1 * s1) / nD
      val rss0 = syy - (a0 * sy + a1 * s1y)
      val f = (rss0 - rss1) * (nD - lit(3.0)) / rss1
      val ok = det =!= 0.0 && den0 =!= 0.0 && rss1 > 0.0
      g.select(keys.map(col) ++ Seq(
        lit(label).as("direction"), col("n").as("n_obs"),
        round(when(ok, f), 6).as("f_stat"),
        coalesce(when(ok, f > lit(3.841459)), lit(false))
          .as("significant")): _*)
    }
    dir(s"$typeX->$typeY", col("l1"), col("l2"), col("l11"),
        col("l12"), col("l22"), col("ty"), col("y1"), col("y2"),
        col("qy"))
      .unionByName(dir(s"$typeY->$typeX", col("l2"), col("l1"),
        col("l22"), col("l12"), col("l11"), col("tx"), col("x1"),
        col("x2"), col("qx")))
  }

  /** KENDALL τ-b RANK CORRELATION (Kendall '38; the τ-b tie
    * normalization) between the view and purchase daily cents series
    * aligned on calendar days — the CONCORDANCE member of the
    * dependence family ([[spearman]] = linear-on-ranks per nation,
    * [[ccf]] = lagged product-moment; τ asks only "do the two series
    * move the same DIRECTION day over day", the most
    * outlier-immune of the three):
    *
    *   S   = Σ_{i<j} sign(x_i − x_j)·sign(y_i − y_j)
    *   τ_b = S / √((n0 − n1)(n0 − n2)),  n0 = n(n−1)/2,
    *         n1/n2 = Σ_ties t(t−1)/2 per side
    *
    * with the full tie-corrected normal variance for the z readout
    * (the [[mannKendall]] variance plus the Kendall cross-terms):
    * Var(S) = (v0 − vt − vu)/18 + ΣtΣu-products /(2n(n−1)) and
    * /(9n(n−1)(n−2)).
    *
    * Determinism: S, n0, n1, n2 and every tie sum are exact integers
    * from one pair join + two tie aggregates; τ_b and z are single
    * double trees over those integers. Degenerate (either side all
    * tied, or n < 2) → null τ and z.
    *
    * Scale shape: the [[theilSen]] argument — the pair join runs
    * over the CALENDAR-bounded joined daily frame (≤ |days|² rows,
    * never data-sized); three keyed aggregates.
    */
  def kendallTau(events: DataFrame, typeX: String = "view",
                 typeY: String = "purchase"): DataFrame =
    kendallTauFinish(xyDaily(events, typeX, typeY))

  /** The τ-b readout over a (day, x, y) joined daily frame — shared
    * by the batch operator and the streaming twin (the
    * mannKendallFinish pattern).
    */
  private[graft] def kendallTauFinish(daily: DataFrame): DataFrame =
    kendallTauKeyed(daily, Nil)

  /** The τ-b readout generalized over an explicit SEGMENT KEY list
    * (VERDICT r12 #4). Global (keys empty) keeps the allowlisted
    * calendar-bounded broadcast nested-loop panel and 1-row
    * crossJoins; keyed segments turn the panel into a KEYED equi-join
    * on the segment (day inequality inside each segment's
    * calendar-bounded group) and the combine into ordinary key joins
    * — no global window, no broadcast nested loop, nothing for the
    * plan-audit allowlist.
    */
  private[graft] def kendallTauKeyed(daily: DataFrame,
                                     keys: Seq[String]): DataFrame = {
    // Calendar-bounded all-pairs: both sides are ≤ |days| rows per
    // segment, so the global form's broadcast nested-loop is the
    // q_intrinsic_dim bounded-panel shape (allowlisted), never
    // data-sized; the keyed form is a plain segment equi-join.
    val sTerm = sum((signum((col("a.x") - col("b.x")).cast("double"))
      * signum((col("a.y") - col("b.y")).cast("double")))
      .cast("long")).as("s")
    val pairs = if (keys.isEmpty)
      daily.as("a")
        .join(broadcast(daily.as("b")), col("a.day") < col("b.day"))
        .agg(sTerm, count(lit(1)).as("n0"))
    else
      daily.as("a").join(daily.as("b"),
          keys.map(k => col(s"a.$k") === col(s"b.$k"))
            .reduce(_ && _) && col("a.day") < col("b.day"))
        .groupBy(keys.map(k => col(s"a.$k").as(k)): _*)
        .agg(sTerm, count(lit(1)).as("n0"))
    def tieSums(c: String) = daily.groupBy(keys.map(col) :+ col(c): _*)
      .agg(count(lit(1)).as("tc"))
      .groupBy(keys.map(col): _*)
      .agg(sum(expr("tc * (tc - 1) DIV 2")).as(s"n_$c"),
        sum(col("tc") * (col("tc") - 1L)
          * (lit(2L) * col("tc") + 5L)).as(s"v_$c"),
        sum(col("tc") * (col("tc") - 1L)).as(s"p1_$c"),
        sum(col("tc") * (col("tc") - 1L) * (col("tc") - 2L))
          .as(s"p2_$c"))
    val n = daily.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val nD = col("n").cast("double")
    // n < 3 degenerate segments (reachable once keyed): the tie
    // cross-terms divide by n(n-1)(n-2) = 0 and engines disagree on
    // NaN ordering — pin var_s to 0.0 there (z null, not significant)
    // IDENTICALLY in the DuckDB twins.
    val varS = when(col("n") >= 3L,
      ((col("n") * (col("n") - 1L) * (lit(2L) * col("n") + 5L)
        - col("v_x") - col("v_y")).cast("double") / lit(18.0))
      + (col("p1_x") * col("p1_y")).cast("double")
        / (lit(2.0) * nD * (nD - 1.0))
      + (col("p2_x") * col("p2_y")).cast("double")
        / (lit(9.0) * nD * (nD - 1.0) * (nD - 2.0))).otherwise(lit(0.0))
    val den = sqrt((col("n0") - col("n_x")).cast("double")
      * (col("n0") - col("n_y")).cast("double"))
    val joined = if (keys.isEmpty)
      pairs.crossJoin(broadcast(tieSums("x")))
        .crossJoin(broadcast(tieSums("y")))
        .crossJoin(broadcast(n))
    else
      // 1-day segments have no pairs: left join, (s, n0) -> (null, 0)
      // exactly as the global aggregate over an empty panel reads.
      n.join(tieSums("x"), keys).join(tieSums("y"), keys)
        .join(pairs, keys, "left")
        .withColumn("n0", coalesce(col("n0"), lit(0L)))
    joined
      .withColumn("var_s", varS)
      .select(keys.map(col) ++ Seq(
        col("n").as("n_days"), col("s").as("s_stat"),
        round(when(den > 0.0, col("s").cast("double") / den), 6)
          .as("tau_b"),
        round(when(col("var_s") > 0.0,
          col("s").cast("double") / sqrt(col("var_s"))), 6).as("z"),
        coalesce(when(col("var_s") > 0.0,
          abs(col("s").cast("double") / sqrt(col("var_s")))
            > lit(1.959964)), lit(false)).as("significant")): _*)
  }

  /** PER-NATION Kendall τ-b (VERDICT r12 #4): the view↔purchase
    * concordance computed independently per customer nation over the
    * segment-keyed day pivot — the keyed form of [[kendallTau]],
    * every join and window partitioned by nation.
    */
  def kendallTauByNation(events: DataFrame, customers: DataFrame,
                         typeX: String = "view",
                         typeY: String = "purchase"): DataFrame =
    kendallTauKeyed(
      xyDailyKeyed(withNation(events, customers), typeX, typeY,
        Seq("nation")),
      Seq("nation"))

  /** TWO-SAMPLE LOG-RANK TEST (Mantel '66 / Peto) — the standard
    * "are these two survival curves the same" readout completing the
    * [[kaplanMeier]]/[[nelsonAalen]] family: group A = orders at
    * `groupA` priority, B = the rest, over the same right-censored
    * completion durations. At each event time, A's expected deaths
    * under the null are E1 = d·n1/n (the hypergeometric mean) with
    * variance V = d·n1·n2·(n−d) / (n²·(n−1)); the statistic
    * χ² = (O1 − ΣE1)² / ΣV against the 1-df 5% cut.
    *
    * Determinism: d/n/n1/n2 are exact integers (the [[kmRisk]]
    * device per group over ONE shared event-time frame, so both
    * at-risk counts are defined at every time); E1 and V are per-row
    * double trees; their sums over event times fold VALUE-SORTED by
    * t (the sinkhorn sorted-fold device) — no aggregation-order
    * hazard; O1 is an exact integer.
    *
    * Scale shape: the duration scan collapses to ≤ |distinct
    * durations| rows before anything else (duration-bounded, the
    * calendar argument); the cumulative windows are global over that
    * bounded frame; the fold collects ≤ that many structs; 1 row out
    * with the 1-row totals broadcast.
    */
  def logRank(orders: DataFrame, lineitem: DataFrame,
              asOf: String = "1998-06-01",
              groupA: String = "1-URGENT"): DataFrame = {
    val risk = logRankRisk(kmDurations(orders, lineitem, asOf), groupA)
    val e1 = (col("d") * col("n1")).cast("double") / col("n").cast("double")
    val v = when(col("n") > 1L,
      (col("d") * col("n1")).cast("double") * col("n2").cast("double")
        * (col("n") - col("d")).cast("double")
        / (col("n").cast("double") * col("n").cast("double")
          * (col("n") - 1L).cast("double"))).otherwise(lit(0.0))
    val agg0 = risk.agg(
      max(col("n1tot")).as("n1"), max(col("n2tot")).as("n2"),
      sum(col("d1")).as("o1"),
      tSortedFold(e1).as("e1"), tSortedFold(v).as("vsum"))
    agg0.select(col("n1"), col("n2"), col("o1").as("observed_a"),
      round(col("e1"), 6).as("expected_a"),
      round(when(col("vsum") > 0.0,
        (col("o1").cast("double") - col("e1"))
          * (col("o1").cast("double") - col("e1")) / col("vsum")), 6)
        .as("chi2"),
      coalesce(when(col("vsum") > 0.0,
        (col("o1").cast("double") - col("e1"))
          * (col("o1").cast("double") - col("e1")) / col("vsum")
          > lit(3.841459)), lit(false)).as("significant"))
  }

  /** The shared per-event-time RISK frame under [[logRank]] and
    * [[coxHazardRatio]]: (t, d1, d2, c1, c2, n1, n2, d, n, n1tot,
    * n2tot) — group A vs rest deaths/censorings per time, both
    * groups' at-risk counts via the cumulative device, event times
    * only. Duration-bounded (≤ |distinct t| rows).
    */
  private[graft] def logRankRisk(durs: DataFrame,
                                 groupA: String): DataFrame = {
    val times = durs
      .select((col("priority") === groupA).as("ga"), col("t"),
        col("ev"))
      .groupBy(col("t"))
      .agg(sum(when(col("ga"), col("ev")).otherwise(0L)).as("d1"),
        sum(when(col("ga"), lit(1L) - col("ev")).otherwise(0L)).as("c1"),
        sum(when(!col("ga"), col("ev")).otherwise(0L)).as("d2"),
        sum(when(!col("ga"), lit(1L) - col("ev")).otherwise(0L)).as("c2"))
    val tot = times.agg(sum(col("d1") + col("c1")).as("n1tot"),
      sum(col("d2") + col("c2")).as("n2tot"))
    val cum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    times.crossJoin(broadcast(tot))
      .withColumn("n1", col("n1tot")
        - (sum(col("d1") + col("c1")).over(cum) - col("d1") - col("c1")))
      .withColumn("n2", col("n2tot")
        - (sum(col("d2") + col("c2")).over(cum) - col("d2") - col("c2")))
      .filter(col("d1") + col("d2") > 0L)
      .withColumn("d", col("d1") + col("d2"))
      .withColumn("n", col("n1") + col("n2"))
  }

  /** The t-ORDERED float fold shared by [[logRank]] and
    * [[coxHazardRatio]] (the sinkhorn sorted-fold device): per-time
    * double terms collect to ≤ |times| structs, sort by t, fold with
    * a 0.0 seed — no shuffle-order hazard, identical IEEE sequence to
    * the twins' t-ordered list_reduce.
    */
  private def tSortedFold(term: Column): Column =
    aggregate(sort_array(collect_list(struct(col("t").as("k"),
      term.as("v")))), lit(0.0), (acc, x) => acc + x.getField("v"))

  /** COX PROPORTIONAL-HAZARDS RATIO, single binary covariate
    * (Cox '72; Breslow tie handling) — the REGRESSION member
    * completing the survival family: [[kaplanMeier]] draws the
    * curves, [[logRank]] tests "same?", this estimates HOW MUCH the
    * `groupA` hazard differs: h_A(t) = e^β · h_B(t), fit by Newton
    * on the Breslow partial likelihood. With a binary covariate the
    * per-event-time sufficient statistics are just the [[logRankRisk]]
    * counts: with w(t) = n1·e^β / (n2 + n1·e^β),
    *   U(β) = Σ_t (d1 − d·w),  I(β) = Σ_t d·w·(1−w),
    *   β ← β + U/I,   seeded β = 0 (where U = O1 − E1, the log-rank
    * numerator — the score test IS the log-rank connection).
    * `iters` fixed Newton steps + one final (U, I) evaluation give
    * se = 1/√I, z = β·√I and the Wald readout; hr = e^β.
    *
    * Determinism: the risk counts are exact integers; e^β is SNAPPED
    * to 6 dp each iteration (the kmFinish fixed-point discipline —
    * the one cross-engine libm call feeds a rounded rational, so the
    * U/I trees are identical doubles); U and I fold t-SORTED. β is a
    * data-dependent scalar carried as a 1-row broadcast, never a
    * driver value. Degenerate (no events, or I ≤ 0) → null β/z.
    *
    * Scale shape: the duration-bounded risk frame materializes once
    * (localCheckpoint); each Newton step is ONE aggregate over it
    * with a 1-row broadcast of the previous β. `iters`+1 tiny jobs.
    */
  def coxHazardRatio(orders: DataFrame, lineitem: DataFrame,
                     asOf: String = "1998-06-01",
                     groupA: String = "1-URGENT",
                     iters: Int = 3): DataFrame = {
    val risk = logRankRisk(kmDurations(orders, lineitem, asOf), groupA)
      .localCheckpoint()
    val w = ((col("n1").cast("double") * col("ebv"))
      / (col("n2").cast("double") + col("n1").cast("double") * col("ebv")))
    def uTerm = col("d1").cast("double") - col("d").cast("double") * w
    def iTerm = col("d").cast("double") * w * (lit(1.0) - w)
    def step(beta: DataFrame): DataFrame =
      risk.crossJoin(broadcast(
          beta.select(col("beta"),
            round(exp(col("beta")), 6).as("ebv"))))
        .agg(max(col("beta")).as("b0"),
          tSortedFold(uTerm).as("u"), tSortedFold(iTerm).as("i"))
    val spark = orders.sparkSession
    var beta = spark.range(1).select(lit(0.0).as("beta"))
    for (_ <- 1 to iters)
      beta = step(beta).select(
        (col("b0") + when(col("i") > 0.0, col("u") / col("i"))
          .otherwise(lit(0.0))).as("beta"))
    val counts = risk.agg(sum(col("d")).as("n_events"),
      sum(col("d1")).as("events_a"))
    step(beta).crossJoin(broadcast(counts))
      .select(col("n_events"), col("events_a"),
        round(when(col("i") > 0.0, col("b0")), 6).as("beta"),
        round(when(col("i") > 0.0, exp(col("b0"))), 6)
          .as("hazard_ratio"),
        round(when(col("i") > 0.0,
          lit(1.0) / sqrt(col("i"))), 6).as("se"),
        round(when(col("i") > 0.0,
          col("b0") * sqrt(col("i"))), 6).as("z"),
        coalesce(when(col("i") > 0.0,
          abs(col("b0") * sqrt(col("i"))) > lit(1.959964)),
          lit(false)).as("significant"))
  }

  /** MEDIAN-OF-MEANS robust location estimate per source: hash rows
    * into `k` fixed buckets (the content-hash lottery again), take
    * each bucket's exact integer mean, report the median bucket mean
    * beside the plain mean — the estimator whose deviation bound
    * survives heavy tails that wreck the sample mean, at the cost of
    * one extra (source, bucket)-keyed aggregate.
    *
    * The median over the ≤ k bucket means is rank-based on the exact
    * quotients (tie-break bucket id): ranks ⌊(c+1)/2⌋ and ⌈(c+1)/2⌉
    * of the c populated buckets, averaged — one IEEE mean of two
    * doubles, engine-identical.
    *
    * Scale shape: the bucket aggregate map-side-combines to
    * ≤ |sources|·k cells; the median window partitions by source over
    * ≤ k rows.
    */
  def medianOfMeans(docs: DataFrame, srcCol: String, keyCol: Column,
                    metric: Column, k: Int = 32): DataFrame = {
    val d = docs.select(col(srcCol).as("source"),
      keyCol.cast("string").as("key"), metric.cast("long").as("x"))
    val cells = d
      .withColumn("bkt", graft.operators.Sampling.hashBucket(
        concat(col("key"), lit(":mom")), k))
      .groupBy(col("source"), col("bkt"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .withColumn("m", col("s").cast("double") / col("n").cast("double"))
    val win = Window.partitionBy(col("source"))
    val ranked = cells
      .withColumn("rk", row_number().over(
        win.orderBy(col("m").asc, col("bkt").asc)))
      .withColumn("c", count(lit(1)).over(win))
    val med = ranked
      .filter(col("rk") === floor((col("c") + 1) / 2) ||
        col("rk") === ceil((col("c") + 1) / 2))
      .groupBy(col("source"))
      .agg(avg(col("m")).as("mom"), max(col("c")).as("n_buckets"))
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"))
      .join(med, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_buckets"),
        round(col("sx").cast("double") / col("n_docs").cast("double"), 6)
          .as("mean_metric"),
        round(col("mom"), 6).as("mom_metric"))
  }
}
