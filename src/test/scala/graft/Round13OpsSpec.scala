package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.Analytics

/** r13 per-segment sequential stats (VERDICT r12 #4): the keyed forms
  * must (a) collapse to the global operators when all events sit in
  * one segment — the strongest arithmetic-parity check, every moment
  * and tie sum equal — and (b) recover a planted per-segment trend
  * divergence the global form averages away.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic events for `users`, one row per (user, day, type). */
  private def mkEvents(rows: Seq[(Long, Int, String, Double)]): DataFrame =
    rows.toDF("user_id", "d", "event_type", "value")
      .select(col("user_id"), col("event_type"), col("value"),
        to_timestamp(concat(lit("2024-03-"),
          lpad((col("d") + 1).cast("string"), 2, "0"),
          lit(" 12:00:00"))).as("ts"))

  private def mkCustomers(nations: Map[Long, Long]): DataFrame =
    nations.toSeq.toDF("c_custkey", "c_nationkey")

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  // Seeded two-type value series over 14 days for 3 users, varied
  // enough for non-degenerate MK/tau/Granger designs.
  private val rnd = new scala.util.Random(131)
  private val oneNationRows: Seq[(Long, Int, String, Double)] =
    for (u <- 1L to 3L; d <- 0 until 14; t <- Seq("view", "purchase"))
      yield (u, d, t, (rnd.nextInt(900) + 100) / 100.0)

  test("single-segment parity: byNation == global + nation column") {
    val events = mkEvents(oneNationRows)
    val customers = mkCustomers(Map(1L -> 7L, 2L -> 7L, 3L -> 7L))
    assert(sorted(Analytics.mannKendallByNation(events, customers)
      .drop("nation")) === sorted(Analytics.mannKendall(events)))
    assert(sorted(Analytics.kendallTauByNation(events, customers)
      .drop("nation")) === sorted(Analytics.kendallTau(events)))
    assert(sorted(Analytics.grangerByNation(events, customers)
      .drop("nation")) === sorted(Analytics.granger(events)))
  }

  test("planted divergent segments: rising nation significant, flat " +
    "nation tied-out, and the global average hides the split") {
    // Nation 1 (user 1): purchase cents rise 1,2,...,10 by day.
    // Nation 2 (user 2): constant 5 every day (all tied).
    val rows =
      (0 until 10).map(d => (1L, d, "purchase", (d + 1) / 100.0)) ++
        (0 until 10).map(d => (2L, d, "purchase", 0.05))
    val events = mkEvents(rows)
    val customers = mkCustomers(Map(1L -> 1L, 2L -> 2L))
    val mk = Analytics.mannKendallByNation(events, customers)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("s_stat"), r.getAs[Double]("var_s"),
          r.getAs[Boolean]("significant"))).toMap
    // Rising: S = C(10,2) = 45, no ties: Var = 10*9*25/18 = 125,
    // z = 44/sqrt(125) = 3.935 > 1.96.
    assert(mk(1L) === ((45L, 125.0, true)))
    // Flat: all days tied, variance fully tie-corrected to 0.
    assert(mk(2L) === ((0L, 0.0, false)))
    // The global (unsegmented) series mixes both nations per day:
    // x_d = (d+1) + 5 cents still rises, so the split is invisible.
    val global = Analytics.mannKendall(events).collect().head
    assert(global.getAs[Long]("s_stat") === 45L)
  }

  test("keyed tau recovers per-segment concordance sign") {
    // Nation 1: y moves WITH x; nation 2: y moves AGAINST x.
    val rows =
      (0 until 8).flatMap(d => Seq(
        (1L, d, "view", (d + 1) / 100.0),
        (1L, d, "purchase", (2 * d + 2) / 100.0),
        (2L, d, "view", (d + 1) / 100.0),
        (2L, d, "purchase", (16 - 2 * d) / 100.0)))
    val events = mkEvents(rows)
    val customers = mkCustomers(Map(1L -> 1L, 2L -> 2L))
    val tau = Analytics.kendallTauByNation(events, customers)
      .collect().map(r => r.getLong(0) ->
        r.getAs[Double]("tau_b")).toMap
    assert(tau(1L) === 1.0)
    assert(tau(2L) === -1.0)
  }

  test("logRank fully-censored input: expected_a folds to 0.0, chi2 " +
    "null, not significant (r12 ADVICE degenerate parity)") {
    // asOf before every order date: zero uncensored events, so the
    // risk frame is empty and the 0.0-seeded folds must read 0.0 —
    // the DuckDB twin's list_reduce is COALESCEd to the same value.
    val sf = "/root/testdata/sf0.001"
    val row = Analytics.logRank(
      graft.queries.Tables.orders(spark, sf),
      graft.queries.Tables.lineitem(spark, sf),
      asOf = "1990-01-01").collect().head
    assert(row.getAs[Double]("expected_a") === 0.0)
    assert(row.getAs[java.lang.Double]("chi2") === null)
    assert(row.getAs[Boolean]("significant") === false)
  }

  test("SES: constant series keeps its level with zero error; a step " +
    "series converges toward the new level") {
    // Constant 500 cents for 10 days: L stays 5.00 dollars-in-cents
    // exactly (0.3*x + 0.7*x = x in IEEE for equal x), SSE = 0.
    val const = mkEvents((0 until 10).map(d => (1L, d, "view", 5.0)))
    val c = Analytics.sesForecast(const).collect().head
    assert(c.getAs[Long]("n_days") === 10L)
    assert(c.getAs[Double]("level") === 500.0)
    assert(c.getAs[Double]("rmse") === 0.0)
    // Step 100 -> 1000 cents at day 5: the level must sit strictly
    // between the halves and strictly above the pre-step level.
    val step = mkEvents((0 until 5).map(d => (1L, d, "view", 1.0)) ++
      (5 until 10).map(d => (1L, d, "view", 10.0)))
    val sRow = Analytics.sesForecast(step).collect().head
    val lvl = sRow.getAs[Double]("level")
    assert(lvl > 100.0 && lvl < 1000.0 && lvl > 800.0,
      s"level $lvl should have converged most of the way")
  }

  test("Holt: an exact linear series is tracked with positive trend " +
    "and the 1-step forecast overshoots the level") {
    // x_d = 100*(d+1) cents, 12 days: trend must be positive and the
    // forecast = level + trend strictly above the level.
    val lin = mkEvents((0 until 12).map(d =>
      (1L, d, "view", (d + 1) * 1.0)))
    val r = Analytics.holtForecast(lin).collect().head
    assert(r.getAs[Double]("trend") > 0.0)
    assert(r.getAs[Double]("forecast_next") >
      r.getAs[Double]("level"))
    // Constant series: zero trend, zero error, forecast == level.
    val const = mkEvents((0 until 8).map(d => (1L, d, "view", 5.0)))
    val c = Analytics.holtForecast(const).collect().head
    assert(c.getAs[Double]("trend") === 0.0)
    assert(c.getAs[Double]("rmse") === 0.0)
    assert(c.getAs[Double]("forecast_next") === c.getAs[Double]("level"))
  }

  test("propZTest: identical arms read z ~ 0 / not significant and " +
    "the cells partition the population") {
    val sf = "/root/testdata/sf0.001"
    val customers = graft.queries.Tables.customer(spark, sf)
    val orders = graft.queries.Tables.orders(spark, sf)
    val r = Analytics.propZTest(customers, orders).collect().head
    val n = r.getAs[Long]("n_treat") + r.getAs[Long]("n_control")
    assert(n === customers.count())
    assert(r.getAs[Long]("conv_treat") <= r.getAs[Long]("n_treat"))
    assert(r.getAs[Long]("conv_control") <= r.getAs[Long]("n_control"))
    // A null lottery on unshifted data: the arms differ only by the
    // hash split, so |z| must sit far from the reject cut.
    val z = Option(r.getAs[java.lang.Double]("z")).map(_.toDouble)
    assert(z.isEmpty || math.abs(z.get) < 1.959964,
      s"null split flagged significant: $z")
  }

  test("coxHazardRatio: finite fit on real durations, near-exact " +
    "label-swap antisymmetry, se/z consistency") {
    val sf = "/root/testdata/sf0.001"
    val orders = graft.queries.Tables.orders(spark, sf)
    val li = graft.queries.Tables.lineitem(spark, sf)
    val r = Analytics.coxHazardRatio(orders, li).collect().head
    val beta = r.getAs[Double]("beta")
    val hr = r.getAs[Double]("hazard_ratio")
    val se = r.getAs[Double]("se")
    val z = r.getAs[Double]("z")
    assert(r.getAs[Long]("n_events") > 0L)
    assert(math.abs(hr - math.exp(beta)) < 1e-5)
    assert(se > 0.0)
    assert(math.abs(z - beta / se) < 1e-4)
    // Swapping the covariate labels (group A = "the rest") mirrors
    // the partial likelihood: beta -> -beta up to the 6-dp e^beta
    // snap (groupA buckets every non-urgent priority when the flag
    // is defined as != — emulate by fitting each other priority...
    // instead use the exact complement: priority equality vs the
    // 4 remaining priorities is not a binary swap, so fit the SAME
    // model with A and B exchanged via a relabeled orders frame).
    val swapped = orders.withColumn("o_orderpriority",
      when(col("o_orderpriority") === "1-URGENT", lit("other"))
        .otherwise(lit("1-URGENT")))
    val r2 = Analytics.coxHazardRatio(swapped, li).collect().head
    assert(math.abs(r2.getAs[Double]("beta") + beta) < 1e-4,
      s"swap: ${r2.getAs[Double]("beta")} vs ${-beta}")
  }

  test("coxHazardRatio score test at beta=0 agrees with the log-rank " +
    "direction (planted faster completion for group A)") {
    // Group A (urgent) orders complete in 1-5 days, others in 20-40:
    // the urgent hazard is higher, so beta must come out positive
    // and significant.
    import spark.implicits._
    val n = 120
    val orders = (1 to n).map { i =>
      (i.toLong, if (i % 2 == 0) "1-URGENT" else "3-MEDIUM",
        "1995-01-%02d".format(i % 20 + 1))
    }.toDF("o_orderkey", "o_orderpriority", "o_orderdate")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_timestamp(col("o_orderdate")).as("o_orderdate"))
    val li = (1 to n).map { i =>
      val lag = if (i % 2 == 0) 1 + i % 5 else 20 + i % 20
      (i.toLong, "1995-%02d-%02d".format(2 + (i % 20 + lag) / 28,
        (i % 20 + lag) % 28 + 1))
    }.toDF("l_orderkey", "l_shipdate")
      .select(col("l_orderkey"),
        to_timestamp(col("l_shipdate")).as("l_shipdate"))
    val r = Analytics.coxHazardRatio(orders, li, asOf = "1996-01-01")
      .collect().head
    assert(r.getAs[Double]("beta") > 0.5, s"beta ${r.get(2)}")
    assert(r.getAs[Boolean]("significant"))
  }

  test("nbAuc: a perfectly separable corpus reads AUC = 1 per class") {
    val docs = (0L until 20L).map { i =>
      if (i % 2 == 0) (i, "en", "hello world common")
      else (i, "fr", "bonjour monde common")
    }.toDF("doc_id", "lang", "text")
    val out = graft.operators.TextClassify.nbAuc(docs)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Double]("auc"), r.getAs[Double]("gini"))).toMap
    // test slice = doc_id % 5 == 0 -> docs 0,5,10,15 (2 en, 2 fr).
    assert(out("en") === ((2L, 2L, 1.0, 1.0)))
    assert(out("fr") === ((2L, 2L, 1.0, 1.0)))
  }

  test("mcnemar: hand-counted discordant cells and corrected chi2") {
    val customers = (1L to 6L).toDF("c_custkey")
    // pre-only: 1, 2, 6 (b = 3); post-only: 3 (c = 1); both: 4;
    // neither: 5. chi2 = (|3-1|-1)^2 / 4 = 0.25, not significant.
    val orders = Seq(
      (1L, "1995-05-01"), (2L, "1995-06-01"), (6L, "1995-07-01"),
      (3L, "1996-02-01"), (4L, "1995-03-01"), (4L, "1997-01-01"))
      .toDF("o_custkey", "o_orderdate")
      .select(col("o_custkey"),
        to_timestamp(col("o_orderdate")).as("o_orderdate"))
    val r = Analytics.mcnemar(customers, orders).collect().head
    assert(r.getAs[Long]("n_units") === 6L)
    assert(r.getAs[Long]("pre_only") === 3L)
    assert(r.getAs[Long]("post_only") === 1L)
    assert(r.getAs[Double]("chi2") === 0.25)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("energyDistance: separated clusters read large positive " +
    "energy; label swap is symmetric; identical populations near 0") {
    def vecs(rows: Seq[(Long, Seq[Float], Int)]) =
      rows.toDF("vec_id", "embedding", "label")
    val rnd = new scala.util.Random(17)
    def jitter(base: Seq[Float]) =
      base.map(v => v + (rnd.nextInt(100) - 50) / 1000.0f)
    // Cluster A near (5, 0), cluster B near (0, 5): cross distance
    // ~7.07, within ~0.05 -> energy ~ 2*7 - tiny.
    val sep = vecs(
      (0L until 20L).map(i => (i, jitter(Seq(5f, 0f)), 0)) ++
      (20L until 40L).map(i => (i, jitter(Seq(0f, 5f)), 1)))
    val r = graft.operators.Similarity.energyDistance(sep)
      .collect().head
    assert(r.getAs[Long]("n_a") === 20L)
    assert(r.getAs[Double]("energy") > 10.0)
    // Symmetry: swapping the two labels leaves energy unchanged.
    val swapped = vecs(
      (0L until 20L).map(i => (i, jitter(Seq(5f, 0f)), 1)) ++
      (20L until 40L).map(i => (i, jitter(Seq(0f, 5f)), 0)))
    // (fresh jitter — compare SAME frame with labels flipped instead)
    val flipped = sep.withColumn("label",
      lit(1) - col("label"))
    val r2 = graft.operators.Similarity.energyDistance(flipped)
      .collect().head
    assert(r2.getAs[Double]("energy") === r.getAs[Double]("energy"))
    assert(swapped.count() === 40L) // keep the fresh frame used
    // Same-distribution: both labels drawn from one cluster.
    val same = vecs((0L until 40L).map(i =>
      (i, jitter(Seq(1f, 1f)), (i % 2).toInt)))
    val r3 = graft.operators.Similarity.energyDistance(same)
      .collect().head
    assert(math.abs(r3.getAs[Double]("energy")) < 0.05,
      s"same-dist energy ${r3.getAs[Double]("energy")}")
  }

  test("silhouette: tight well-separated labels score near 1, mixed " +
    "labels near 0, singleton labels exactly 0") {
    def vecs(rows: Seq[(Long, Seq[Float], Int)]) =
      rows.toDF("vec_id", "embedding", "label")
    val rnd = new scala.util.Random(23)
    def jitter(base: Seq[Float]) =
      base.map(v => v + (rnd.nextInt(100) - 50) / 1000.0f)
    val sep = vecs(
      (0L until 15L).map(i => (i, jitter(Seq(5f, 0f)), 0)) ++
      (15L until 30L).map(i => (i, jitter(Seq(0f, 5f)), 1)) ++
      Seq((30L, Seq(9f, 9f), 7))) // singleton label
    val out = graft.operators.Similarity.silhouette(sep)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_points"),
          r.getAs[Double]("mean_silhouette"))).toMap
    assert(out(0L)._2 > 0.9 && out(1L)._2 > 0.9, s"sep: $out")
    assert(out(7L) === ((1L, 0.0)))
    // Mixed: both labels drawn from ONE cluster -> near 0 (can go
    // slightly negative from jitter).
    val mixed = vecs((0L until 30L).map(i =>
      (i, jitter(Seq(1f, 1f)), (i % 2).toInt)))
    val m = graft.operators.Similarity.silhouette(mixed)
      .collect().map(r => math.abs(r.getAs[Double]("mean_silhouette")))
    assert(m.forall(_ < 0.25), s"mixed: ${m.toSeq}")
  }

  test("keyed granger emits both directions per segment and nulls " +
    "degenerate designs") {
    // Nation 1: 14 varied days (well-posed design); nation 2: two
    // joined days -> one lag row -> singular Gram -> null F, false.
    val rows = oneNationRows ++
      (0 until 2).flatMap(d => Seq(
        (9L, d, "view", 0.50), (9L, d, "purchase", 0.70)))
    val events = mkEvents(rows)
    val customers = mkCustomers(
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 2L))
    val g = Analytics.grangerByNation(events, customers)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (Option(r.getAs[java.lang.Double]("f_stat")),
          r.getAs[Boolean]("significant"))).toMap
    assert(g.keySet === Set((1L, "view->purchase"),
      (1L, "purchase->view"), (2L, "view->purchase"),
      (2L, "purchase->view")))
    assert(g((2L, "view->purchase")) === ((None, false)))
    assert(g((2L, "purchase->view")) === ((None, false)))
  }
}
