package graft

import org.apache.spark.sql.functions._

/** r11 operators: hand-computed anchors for the new analytics. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  test("nelsonAalen: hand-computed hazard on 4 orders with one " +
    "censored; censored-only times emit no row") {
    val orders = Seq(
      (1L, "P", "2020-01-01"), (2L, "P", "2020-01-01"),
      (3L, "P", "2020-01-01"), (4L, "P", "2020-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, "2020-01-03"), (2L, "2020-01-03"), (3L, "2020-01-05"),
      (4L, "2020-01-20")) // completes after as-of → censored at t=9
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.query.Analytics
      .nelsonAalen(orders, li, asOf = "2020-01-10")
      .orderBy(col("t_days")).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("t_days"),
        r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
        r.getAs[Double]("cum_hazard"), r.getAs[Double]("fh_survival")))
    // t=2: n=4, d=2 → H=0.5, exp(-0.5)=0.606531;
    // t=4: n=2, d=1 → H=1.0, exp(-1)=0.367879; t=9 censored only.
    assert(got.toSeq == Seq(
      ("P", 2L, 4L, 2L, 0.5, 0.606531),
      ("P", 4L, 2L, 1L, 1.0, 0.367879)), got.toSeq.toString)
  }

  private def srmRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("arm")).collect().map(r =>
      (r.getAs[Long]("arm"), r.getAs[Long]("n_obs"),
        r.getAs[Double]("expected"),
        Option(r.getAs[java.lang.Double]("contribution")).map(_.toDouble),
        Option(r.getAs[java.lang.Double]("chi2")).map(_.toDouble),
        Option(r.getAs[java.lang.Boolean]("alarm")).map(_.booleanValue)))

  test("srmCheck: planted 80/20 under a 50/50 design fires the alarm " +
    "with hand-computed chi-square; balanced split stays quiet") {
    val biased = ((1 to 80).map(i => (i.toLong, 0L))
      ++ (81 to 100).map(i => (i.toLong, 1L))).toDF("unit", "arm")
    // diff = 2*80-100 = 60 each side -> 3600/200 = 18 per arm, chi2 36.
    val got = srmRows(
      graft.query.Analytics.srmCheck(biased, "arm", Seq(1, 1)))
    assert(got.toSeq == Seq(
      (-1L, 100L, 100.0, None, Some(36.0), Some(true)),
      (0L, 80L, 50.0, Some(18.0), None, None),
      (1L, 20L, 50.0, Some(18.0), None, None)), got.toSeq.toString)

    val fair = ((1 to 50).map(i => (i.toLong, 0L))
      ++ (51 to 100).map(i => (i.toLong, 1L))).toDF("unit", "arm")
    val quiet = srmRows(
      graft.query.Analytics.srmCheck(fair, "arm", Seq(1, 1)))
    assert(quiet.head == ((-1L, 100L, 100.0, None, Some(0.0),
      Some(false))), quiet.toSeq.toString)
  }

  test("srmCheck: an arm nobody reached still appears with its " +
    "expected count (the catastrophic-SRM shape)") {
    val allA = (1 to 10).map(i => (i.toLong, 0L)).toDF("unit", "arm")
    val got = srmRows(
      graft.query.Analytics.srmCheck(allA, "arm", Seq(1, 1)))
    assert(got.toSeq == Seq(
      (-1L, 10L, 10.0, None, Some(10.0), Some(true)),
      (0L, 10L, 5.0, Some(5.0), None, None),
      (1L, 0L, 5.0, Some(5.0), None, None)), got.toSeq.toString)
  }

  test("ebShrinkage: the small group pools harder than the big ones " +
    "and shrunk means sit between raw and grand") {
    def grp(nation: Long, n: Int, lo: Double, hi: Double, k0: Long) =
      (1 to n).map(i => (k0 + i, nation,
        if (i % 2 == 0) lo else hi))
    val customers = (grp(1L, 4, 480.0, 520.0, 100L)
      ++ grp(2L, 100, 80.0, 120.0, 1000L)
      ++ grp(3L, 100, 180.0, 220.0, 2000L))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val got = graft.query.Analytics.ebShrinkage(customers)
      .collect().map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Double]("raw_mean_dollars"),
          r.getAs[Double]("weight"),
          r.getAs[Double]("shrunk_mean_dollars"))).toMap
    assert(got(1L)._1 == 500.0 && got(2L)._1 == 100.0
      && got(3L)._1 == 200.0, got.toString)
    assert(got(1L)._2 < got(2L)._2,
      s"small group must pool harder: $got")
    val gmean = (4 * 500.0 + 100 * 100.0 + 100 * 200.0) / 204.0
    assert(got(1L)._3 < 500.0 && got(1L)._3 > gmean,
      s"shrunk mean between raw and grand: $got vs $gmean")
    assert(got.values.forall(v => v._2 > 0.0 && v._2 < 1.0))
  }

  test("ltvCohorts: hand-computed cumulative curve; gap months skip " +
    "a row but the cumulative carries") {
    // Cohort 2024-01 (two customers): Jan spends 10+20, Feb 30 (one
    // customer), Apr 40. Ages 0,1,3; avg cum = 15, 30, 50.
    val rows = Seq(
      (1L, "2024-01-05", 10.0), (2L, "2024-01-20", 20.0),
      (1L, "2024-02-10", 30.0), (2L, "2024-04-01", 40.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = graft.query.Analytics.ltvCohorts(rows)
      .collect().map(r => r.getAs[Long]("age_months") ->
        (r.getAs[Long]("n_customers"),
          r.getAs[Double]("avg_ltv_dollars"))).toMap
    assert(got == Map(0L -> ((2L, 15.0)), 1L -> ((2L, 30.0)),
      3L -> ((2L, 50.0))), got.toString)
  }

  test("olsMulti: an exactly linear design recovers the planted " +
    "coefficients with r2 = 1") {
    // y_cents = 10 + 2*x1 + 3*x2 exactly.
    val rows = Seq((1, 1), (2, 1), (1, 2), (3, 2), (2, 3), (4, 1))
      .map { case (x1, x2) =>
        (x1.toDouble, x2 / 100.0, (10 + 2 * x1 + 3 * x2) / 100.0)
      }.toDF("l_quantity", "l_discount", "l_extendedprice")
    val r = graft.query.Analytics.olsMulti(rows).collect().head
    assert(r.getAs[Double]("beta0_dollars") == 0.1, r.toString)
    assert(r.getAs[Double]("beta1_per_qty") == 0.02)
    assert(r.getAs[Double]("beta2_per_pct") == 0.03)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("sinkhorn: identical band distributions cost ~0, a 4-band " +
    "shift costs ~4, and the readout is deterministic") {
    def cust(seg: String, bal: Double, k0: Long) =
      (1 to 40).map(i => (k0 + i, seg, bal))
    val same = (cust("X", 1000.0, 100L) ++ cust("Y", 1000.0, 200L))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val c0 = graft.query.Analytics.sinkhorn(same, "X", "Y")
      .collect().head
    assert(c0.getAs[Long]("n_a") == 40L && c0.getAs[Long]("n_b") == 40L)
    assert(c0.getAs[Double]("sinkhorn_cost") < 0.2, c0.toString)

    val shifted = (cust("X", 1000.0, 100L) ++ cust("Y", 5000.0, 200L))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val c1 = graft.query.Analytics.sinkhorn(shifted, "X", "Y")
      .collect().head
    assert(c1.getAs[Double]("sinkhorn_cost") > 1.0, c1.toString)
    assert(c1.getAs[Double]("sinkhorn_cost")
      > c0.getAs[Double]("sinkhorn_cost"))
    val c1b = graft.query.Analytics.sinkhorn(shifted, "X", "Y")
      .collect().head
    assert(c1b.getAs[Double]("sinkhorn_cost")
      == c1.getAs[Double]("sinkhorn_cost"), "deterministic replay")
  }

  test("mde: constant outcomes give a zero MDE; a two-point spread " +
    "matches the hand-computed closed form") {
    val customers = (1 to 4).map(i => Tuple1(i.toLong))
      .toDF("c_custkey")
    val flat = (1 to 4).map(i => (i.toLong, "1997-01-01", 100.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r = graft.query.Analytics.mde(customers, flat).collect().head
    assert(r.getAs[Double]("sigma") == 0.0)
    assert(r.getAs[Double]("mde_abs") == 0.0)

    // y = (0, 0, 200, 200): mean 100, sigma 100 ->
    // mde = 2.801586 * 2 * 100 / 2 = 280.1586, rel 2.801586.
    val spread = Seq((3L, "1997-01-01", 200.0), (4L, "1997-01-01", 200.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val r2 = graft.query.Analytics.mde(customers, spread).collect().head
    assert(r2.getAs[Double]("mean_spend") == 100.0)
    assert(r2.getAs[Double]("sigma") == 100.0)
    assert(r2.getAs[Double]("mde_abs") == 280.1586, r2.toString)
    assert(r2.getAs[Double]("mde_rel") == 2.801586)
  }

  test("cdcChunkStats: exact duplicates dedup to half the volume; a " +
    "single mid-doc edit only perturbs its local chunks") {
    val rnd = new scala.util.Random(42)
    val words = (1 to 400).map(_ => s"w${rnd.nextInt(5000)}")
    val base = words.mkString(" ")
    val dup = Seq((1L, base, "dup"), (2L, base, "dup"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.Dedup.cdcChunkStats(dup)
      .collect().head
    assert(r.getAs[Long]("n_chunks") == 2L * r.getAs[Long]("n_distinct"))
    assert(r.getAs[Double]("dedup_share") == 0.5, r.toString)
    assert(r.getAs[Long]("total_tokens") == 800L)

    val edited = words.updated(200, "EDITED").mkString(" ")
    val near = Seq((1L, base, "near"), (2L, edited, "near"))
      .toDF("doc_id", "text", "source")
    val r2 = graft.operators.Dedup.cdcChunkStats(near)
      .collect().head
    assert(r2.getAs[Double]("dedup_share") > 0.3,
      s"content-defined boundaries localize the edit: $r2")

    val tiny = Seq((1L, "a b", "tiny")).toDF("doc_id", "text", "source")
    val r3 = graft.operators.Dedup.cdcChunkStats(tiny).collect().head
    assert(r3.getAs[Long]("n_chunks") == 1L)
    assert(r3.getAs[Long]("total_tokens") == 2L)
  }

  test("diameterTwoSweep: center seed on a path graph finds the true " +
    "diameter from the farthest end") {
    val p = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val r = graft.operators.Graph.diameterTwoSweep(
      e, Seq(3L).toDF("node")).collect().head
    assert(r.getAs[Long]("far_node") == 1L, r.toString)
    assert(r.getAs[Int]("ecc_seed_lb") == 2)
    assert(r.getAs[Int]("diameter_lb") == 4)
    assert(r.getAs[Long]("n_reached") == 5L)
  }

  test("isotonicFit: a violating bin pair pools to its weighted mean; " +
    "monotone input is a fixed point") {
    // accuracies (0.5, 0.8, 0.6, 0.9) with n=10 each: PAVA pools bins
    // 1,2 -> 0.7; minimax must produce (0.5, 0.7, 0.7, 0.9).
    val bins = Seq((0, 10L, 5L, 0.5), (1, 10L, 8L, 0.8),
      (2, 10L, 6L, 0.6), (3, 10L, 9L, 0.9))
      .toDF("bin", "n_docs", "n_correct", "accuracy")
    val got = graft.operators.TextClassify.isotonicFit(bins)
      .collect().map(r => r.getAs[Int]("bin") ->
        r.getAs[Double]("calibrated")).toMap
    assert(got == Map(0 -> 0.5, 1 -> 0.7, 2 -> 0.7, 3 -> 0.9),
      got.toString)

    val mono = Seq((0, 10L, 2L, 0.2), (1, 10L, 5L, 0.5),
      (2, 10L, 9L, 0.9)).toDF("bin", "n_docs", "n_correct", "accuracy")
    val got2 = graft.operators.TextClassify.isotonicFit(mono)
      .collect().map(r => r.getAs[Int]("bin") ->
        r.getAs[Double]("calibrated")).toMap
    assert(got2 == Map(0 -> 0.2, 1 -> 0.5, 2 -> 0.9), got2.toString)
  }

  test("seasonality: a perfectly weekly series yields exact indexes " +
    "and variance shares summing to 1") {
    // Two identical weeks: value = (dow+1) dollars, dow = epoch%7.
    val rows = (0 until 14).map { i =>
      val d = java.time.LocalDate.of(2024, 1, 1).plusDays(i)
      val dow = java.lang.Math.floorMod(d.toEpochDay, 7L)
      ("a", java.sql.Timestamp.valueOf(d.atStartOfDay()),
        (dow + 1).toDouble)
    }
    val got = graft.query.Analytics.seasonality(
        rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[Long]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("dow_index"),
          r.getAs[Double]("var_share"))).toMap
    assert(got.size == 7 && got.values.forall(_._1 == 2L))
    // index(dow k) = (k+1)/4; var_share = (k-3)^2/28.
    assert(got(6L)._2 == 1.75, got.toString)
    assert(got(6L)._3 == BigDecimal(9.0 / 28.0).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-5,
      got.toString)
  }

  test("msprt: null diffs never reject; a persistent gap drives the " +
    "always-valid p below 0.05 and p is monotone") {
    def ev(t: String, d: Int, v: Double) =
      (t, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), v)
    // Alternating small noise around zero -> no rejection ever.
    val nullish = (1 to 24).flatMap(d => Seq(
      ev("view", d, if (d % 2 == 0) 5.0 else 4.0),
      ev("purchase", d, if (d % 2 == 0) 4.0 else 5.0)))
    val r0 = graft.query.Analytics.msprt(
        nullish.toDF("event_type", "ts", "value")).collect()
    assert(r0.forall(!_.getAs[Boolean]("reject_at_5pct")), "no reject")

    // Persistent +3.00 gap with mild variation -> eventual rejection.
    val gap = (1 to 24).flatMap(d => Seq(
      ev("view", d, 8.0 + (d % 3)), ev("purchase", d, 5.0)))
    val r1 = graft.query.Analytics.msprt(
        gap.toDF("event_type", "ts", "value"))
      .orderBy(col("day")).collect()
    val ps = r1.map(_.getAs[Double]("p_always_valid"))
    assert(ps.zip(ps.tail).forall { case (a, b) => b <= a },
      s"always-valid p must be monotone: ${ps.toSeq}")
    assert(ps.last < 0.05, s"persistent gap should reject: ${ps.toSeq}")
  }

  test("conformalInterval: constant outcomes give qhat = 0 and exact " +
    "full coverage; noisy outcomes stay near the 95% guarantee") {
    val const = (1 to 400).map(i => (i.toLong, "P", 100.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r = graft.query.Analytics.conformalInterval(const)
      .collect().head
    assert(r.getAs[Double]("qhat_dollars") == 0.0)
    assert(r.getAs[Double]("yhat_dollars") == 100.0)
    assert(r.getAs[Double]("coverage") == 1.0)

    val noisy = (1 to 2000).map(i =>
      (i.toLong, "P", 100.0 + (i % 37) * 3.0))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val r2 = graft.query.Analytics.conformalInterval(noisy)
      .collect().head
    assert(r2.getAs[Double]("coverage") >= 0.85,
      s"split-conformal guarantee grossly violated: $r2")
    assert(r2.getAs[Double]("qhat_dollars") > 0.0)
  }

  test("bhFdr: a dependent nation is rejected, uniform nations get " +
    "p = 1 and survive the step-up") {
    def block(nation: Long, k0: Long, dependent: Boolean) = {
      val segs = Seq("A", "B", "C", "D", "E")
      val bals = Seq(0.0, 3000.0, 7000.0)
      if (dependent)
        segs.zipWithIndex.flatMap { case (s, i) =>
          (1 to 20).map(j =>
            (k0 + i * 100 + j, nation, s, bals(i % 3)))
        }
      else
        segs.zipWithIndex.flatMap { case (s, i) =>
          bals.zipWithIndex.flatMap { case (b, bi) =>
            (1 to 4).map(j => (k0 + i * 100 + bi * 10 + j, nation, s, b))
          }
        }
    }
    val customers = (block(0L, 10000L, dependent = true)
      ++ block(1L, 20000L, dependent = false)
      ++ block(2L, 30000L, dependent = false))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.query.Analytics.bhFdr(customers)
      .collect().map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("df"), r.getAs[Double]("p_value"),
          r.getAs[Boolean]("rejected"))).toMap
    assert(got(0L)._1 == 8L && got(0L)._2 < 0.001 && got(0L)._3,
      got.toString)
    assert(got(1L) == ((8L, 1.0, false)), got.toString)
    assert(got(2L) == ((8L, 1.0, false)))
  }

  test("rakeKeyphrases: stopword-delimited runs with hand-computed " +
    "degree/frequency scores") {
    val docs = Seq((1L, "deep learning the deep learning"),
      (2L, "learning a model")).toDF("doc_id", "text")
    val got = graft.operators.Retrieval.rakeKeyphrases(docs)
      .collect().map(r => (r.getAs[String]("phrase"),
        r.getAs[Long]("n_words"), r.getAs[Long]("n_occurrences"),
        r.getAs[Double]("score")))
    // deep: deg 4 / freq 2 = 2.0; learning: deg 5 / freq 3 = 1.666667;
    // model: 1.0. "deep learning" = 3.666667 (fixed-point sum).
    assert(got.toSeq == Seq(
      ("deep learning", 2L, 2L, 3.666667),
      ("learning", 1L, 1L, 1.666667),
      ("model", 1L, 1L, 1.0)), got.toSeq.toString)
  }

  test("twoNNDimension: hand-computed 3-point line; exact duplicates " +
    "are excluded and counted") {
    // Points 0, 1, 3 on a line: ln mu = ln3, ln2, 0.5*ln(9/4);
    // fixed-point sum 1098612+693147+405465 = 2197224.
    val vecs = Seq(
      (0L, Array(0f, 0f, 0f)), (2L, Array(1f, 0f, 0f)),
      (4L, Array(3f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val r = graft.operators.Similarity.twoNNDimension(vecs)
      .collect().head
    assert(r.getAs[Long]("n_panel") == 3L)
    assert(r.getAs[Long]("n_used") == 3L)
    assert(r.getAs[Double]("sum_ln_mu") == 2.197224)
    val exp = BigDecimal(3.0 / 2.197224)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("intrinsic_dim") == exp, r.toString)

    val dup = vecs.unionByName(
      Seq((6L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding"))
    val r2 = graft.operators.Similarity.twoNNDimension(dup)
      .collect().head
    assert(r2.getAs[Long]("n_dup_dropped") == 2L,
      "both members of the duplicate pair have r1 = 0")
  }

  test("chi2Features: a label-exclusive token tops its label with " +
    "the hand-computed chi2") {
    // 10 A-docs all contain "zebra"; 10 B-docs never do; everyone
    // shares "the". a=10, g=10, n_c=10, N=20 for (A, zebra):
    // ad-bc = 10*10-0 = 100; chi2 = 20*10000/(10*10*10*10) = 20.
    val docs = ((1 to 10).map(i =>
      (i.toLong, s"the zebra w$i", "A")) ++
      (11 to 20).map(i => (i.toLong, s"the w$i", "B")))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.TextClassify.chi2Features(docs, minDf = 5)
      .collect().map(r => (r.getAs[String]("label"),
        r.getAs[String]("token"), r.getAs[Int]("rnk"),
        r.getAs[Double]("chi2")))
    val topA = got.filter(t => t._1 == "A" && t._3 == 1).head
    assert(topA._2 == "zebra" && topA._4 == 20.0, got.toSeq.toString)
    // "the" is present everywhere -> independence, chi2 = 0.
    assert(got.filter(_._2 == "the").forall(_._4 == 0.0),
      got.toSeq.toString)
  }

  test("signFlipTest: zero daily diffs give p = 1; a large one-sided " +
    "gap is extreme against the sign lottery") {
    def ev(t: String, d: Int, v: Double) =
      (t, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), v)
    val same = (1 to 20).flatMap(d =>
      Seq(ev("view", d, 7.0), ev("purchase", d, 7.0)))
    val r0 = graft.query.Analytics.signFlipTest(
      same.toDF("event_type", "ts", "value")).collect().head
    assert(r0.getAs[Long]("obs_diff_cents") == 0L)
    assert(r0.getAs[Long]("n_extreme") == 64L)
    assert(r0.getAs[Double]("p_value") == 1.0)

    val gap = (1 to 20).flatMap(d =>
      Seq(ev("view", d, 10.0), ev("purchase", d, 1.0)))
    val r1 = graft.query.Analytics.signFlipTest(
      gap.toDF("event_type", "ts", "value")).collect().head
    assert(r1.getAs[Long]("obs_diff_cents") == 20L * 900L)
    val ne = r1.getAs[Long]("n_extreme")
    assert(r1.getAs[Double]("p_value") ==
      BigDecimal((ne + 1.0) / 65.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(ne < 8L, s"a constant +900 diff should be extreme: $ne")
  }

  test("ljungBox: a strong trend is significant, a constant series " +
    "emits null") {
    val rows = (1 to 30).map { d =>
      ("up", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        d * 10.0)
    } ++ (1 to 30).map { d =>
      ("flat", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        5.0)
    }
    val got = graft.query.Analytics.ljungBox(
        rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("m_lags"),
          Option(r.getAs[java.lang.Double]("q_stat")).map(_.toDouble),
          Option(r.getAs[java.lang.Boolean]("significant"))
            .map(_.booleanValue))).toMap
    assert(got("up")._1 == 30L && got("up")._2 == 7L)
    assert(got("up")._3.exists(_ > 14.067140), got.toString)
    assert(got("up")._4 == Some(true))
    assert(got("flat")._3 == None && got("flat")._4 == None,
      got.toString)
  }

  test("kTruss: a K4 with a pendant triangle keeps only the K4 at " +
    "k=4 (support 2 everywhere); k=3 keeps all triangle edges") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("a", "b")
    val t4 = graft.operators.Graph.kTruss(e, k = 4)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) ->
        r.getAs[Long]("support")).toMap
    assert(t4.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L)), t4.toString)
    assert(t4.values.forall(_ == 2L), t4.toString)
    val t3 = graft.operators.Graph.kTruss(e, k = 3)
    assert(t3.count() == 9L, "every edge sits in >= 1 triangle")
  }

  test("textRank: the bridging hub word outranks leaf words; pairs " +
    "come from adjacency only") {
    val docs = Seq((1L, "hub alpha"), (2L, "hub beta"),
      (3L, "hub gamma"), (4L, "solo solo"), (5L, "x y"))
      .toDF("doc_id", "text")
    val got = graft.operators.Retrieval.textRank(docs)
      .collect().map(r => r.getAs[String]("token") ->
        r.getAs[Double]("pr"))
    assert(got.head._1 == "hub", got.toSeq.toString)
    // "solo solo" yields only a self-pair, filtered: solo is not a node.
    assert(!got.map(_._1).contains("solo"), got.toSeq.toString)
    assert(got.forall(_._2 > 0.0))
  }

  test("associationRules: directions split correctly — B->A is " +
    "certain while A->B is 0.5; lift and support hand-computed") {
    // 5 baskets {1,2,3} + 5 baskets {1}: item 1 in 10, items 2,3 in 5.
    val rows = (1 to 5).flatMap(b =>
      Seq((b.toLong, 1L), (b.toLong, 2L), (b.toLong, 3L))) ++
      (6 to 10).map(b => (b.toLong, 1L))
    val got = graft.operators.Itemsets.associationRules(
        rows.toDF("bk", "it"), "bk", "it", minItemSupport = 1)
      .collect().map(r => (r.getAs[Long]("ante"), r.getAs[Long]("cons"),
        r.getAs[Double]("support"), r.getAs[Double]("confidence"),
        r.getAs[Double]("lift")))
    assert(got.toSeq == Seq(
      (2L, 1L, 0.5, 1.0, 1.0), (2L, 3L, 0.5, 1.0, 2.0),
      (3L, 1L, 0.5, 1.0, 1.0), (3L, 2L, 0.5, 1.0, 2.0),
      (1L, 2L, 0.5, 0.5, 1.0), (1L, 3L, 0.5, 0.5, 1.0)),
      got.toSeq.toString)
  }

  test("qlDirichletTopK: the doc holding both query terms outranks " +
    "the single-term doc; the single-term score matches the formula") {
    val docs = Seq((1L, "apple banana"), (100L, "apple apple cherry"))
      .toDF("doc_id", "text")
    val got = graft.operators.Retrieval.qlDirichletTopK(docs)
      .collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("rnk"),
        r.getAs[java.math.BigDecimal]("score").doubleValue))
    assert(got.length == 2)
    assert(got.find(_._3 == 1).get._2 == 100L, got.toSeq.toString)
    // doc 1, query {apple, cherry}: one matching term (apple, tf 1,
    // cf 3, |C| 5, dl 2): ln(1 + 1*5/(300*3)) + 2*ln(300/302).
    val exp = BigDecimal(
      (0.0 + math.log(1.0 + (1.0 * 5.0) / (300.0 * 3.0)))
        + 2.0 * math.log(300.0 / 302.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.find(_._2 == 1L).get._4 == exp, got.toSeq.toString)
  }

  test("ccf: a purchase series that is the view series shifted by " +
    "2 days peaks at exactly lag 2 with r = 1") {
    val days = (1 to 11).map(i => f"2024-01-$i%02d")
    val view = days.zipWithIndex.map { case (d, i) =>
      ("view", java.sql.Timestamp.valueOf(s"$d 00:00:00"),
        10.0 + 2 * i)
    }
    val purch = days.zipWithIndex.map { case (d, i) =>
      ("purchase",
        java.sql.Timestamp.valueOf(f"2024-01-${i + 3}%02d 00:00:00"),
        10.0 + 2 * i)
    }
    val got = graft.query.Analytics.ccf(
        (view ++ purch).toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_terms"),
          Option(r.getAs[java.lang.Double]("ccf")).map(_.toDouble)))
      .toMap
    assert(got(2) == ((11L, Some(1.0))), got.toString)
    assert(got.forall { case (l, (_, c)) =>
      l == 2 || c.forall(_ < 1.0) }, s"lag 2 is the unique peak: $got")
  }

  test("pettitt: a planted level shift is located at the exact day " +
    "with the hand-computed K; a constant series emits null") {
    val rows = (1 to 14).map { d =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        if (d <= 7) 1.0 else 9.0)
    } ++ (1 to 14).map { d =>
      ("b", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), 5.0)
    }
    val got = graft.query.Analytics.pettitt(
        rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("k_stat"),
          Option(r.getAs[java.sql.Date]("cp_day")).map(_.toString),
          r.getAs[Double]("p_approx"),
          r.getAs[Boolean]("significant"))).toMap
    // r2 = 8 (low half) / 22 (high half), V = -/+7, U peaks at 49
    // on day 7; p = 2 exp(-6*49^2/(14^3+14^2)).
    val p = BigDecimal(2.0 * math.exp(-6.0 * 49 * 49 / (2744.0 + 196.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((14L, 49L, Some("2024-01-07"), p, true)),
      got.toString)
    assert(got("b") == ((14L, 0L, None, 1.0, false)))
  }

  test("boruvkaTrace: hand-traced square-with-diagonal graph finds " +
    "the unique MST and goes quiet after convergence") {
    // 1-2(w1), 2-3(w2), 3-4(w3), 1-4(w4), 1-3(w5): MST {12,23,34}=6.
    val e = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L),
      (1L, 4L, 4L), (1L, 3L, 5L)).toDF("src", "dst", "w")
    val got = graft.operators.Graph.boruvkaTrace(e, rounds = 4)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_new_edges"), r.getAs[Long]("new_weight")))
    // Round 1: every singleton grabs its lightest edge -> all 3 MST
    // edges land at once; hooking parents are 1<-2, 2<-3, 3<-4 and
    // two pointer-doubling jumps collapse the length-4 chain to one
    // group, so rounds 2-4 are fully quiet.
    assert(got.toSeq == Seq(
      (1L, 4L, 3L, 6L), (2L, 1L, 0L, 0L),
      (3L, 1L, 0L, 0L), (4L, 1L, 0L, 0L)), got.toSeq.toString)
  }

  test("boruvkaTrace: two disconnected components converge to two " +
    "label groups and a spanning forest") {
    val e = Seq((1L, 2L, 5L), (2L, 3L, 7L), (10L, 11L, 1L))
      .toDF("src", "dst", "w")
    val got = graft.operators.Graph.boruvkaTrace(e, rounds = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_new_edges"), r.getAs[Long]("new_weight")))
    assert(got.map(_._3).sum == 3L, "forest has |V| - #components edges")
    assert(got.map(_._4).sum == 13L)
    assert(got.last._2 == 2L, s"two components stay two groups: $got")
    assert(got.last._3 == 0L)
  }

  test("tCloseness: a band-skewed QI group breaches the 0.15 EMD " +
    "threshold; balanced groups match the hand-computed t") {
    // bands: acctbal 0 -> 1, 1000 -> 2, 2000 -> 3.
    def g(nation: Long, bals: Seq[Double], k0: Long) =
      bals.zipWithIndex.map { case (b, i) => (k0 + i, nation, "X", b) }
    val customers = (
      g(0L, Seq(0.0, 0.0, 1000.0, 1000.0, 2000.0, 2000.0), 100L) ++
      g(1L, Seq.fill(6)(2000.0), 200L) ++
      g(2L, Seq.fill(10)(0.0) ++ Seq.fill(10)(1000.0)
        ++ Seq.fill(10)(2000.0), 300L))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.query.Analytics.tCloseness(customers)
      .collect().map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("t_emd"),
          r.getAs[Boolean]("breach"))).toMap
    // Global bands (12,12,18), N=42, m=3.
    assert(got(0L) == ((6L, 0.071429, false)), got.toString)
    assert(got(1L) == ((6L, 0.428571, true)))
    assert(got(2L) == ((30L, 0.071429, false)))
  }

  test("spearman: monotone spend gives rho=1, anti-monotone -1, " +
    "all-tied spend emits null") {
    val customers = (
      (1 to 5).map(i => (i.toLong, 0L, i.toDouble)) ++
      (1 to 5).map(i => (10L + i, 1L, i.toDouble)) ++
      (1 to 3).map(i => (20L + i, 2L, i.toDouble)))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = (
      (1 to 5).map(i => (i.toLong, (i * i * 10).toDouble)) ++
      (1 to 5).map(i => (10L + i, ((6 - i) * 7).toDouble)))
      .toDF("o_custkey", "o_totalprice")
    val got = graft.query.Analytics.spearman(customers, orders)
      .collect().map(r => r.getAs[Long]("c_nationkey") ->
        Option(r.getAs[java.lang.Double]("rho")).map(_.toDouble))
      .toMap
    assert(got(0L) == Some(1.0), got.toString)
    assert(got(1L) == Some(-1.0))
    assert(got(2L) == None, "constant spend has no rank variance")
  }

  test("srmAssignments: cumulative cutoffs honor 9/1 weights and " +
    "assignment is deterministic per user") {
    val ev = (1 to 500).map(u => (u.toLong, "view")).toDF(
      "user_id", "event_type")
    val a = graft.query.Analytics.srmAssignments(ev, Seq(9, 1))
    assert(a.count() == 500L)
    val byArm = a.groupBy("arm").count().collect()
      .map(r => r.getAs[Long]("arm") -> r.getAs[Long]("count")).toMap
    // the lottery is ~uniform: arm 0 should carry the bulk.
    assert(byArm(0L) > 400L && byArm.getOrElse(1L, 0L) > 10L, byArm.toString)
    val again = graft.query.Analytics.srmAssignments(ev, Seq(9, 1))
    assert(a.except(again).count() == 0L)
  }
}
