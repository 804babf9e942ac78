package graft

import org.apache.spark.sql.functions._

/** r12 operators and regression anchors. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def trace(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_new_edges"), r.getAs[Long]("new_weight")))
      .toSeq

  test("boruvkaTrace: tied-weight 4-cycle — two mutually-merging " +
    "groups pick the SAME canonical cross edge, no cycle enters") {
    // Round 1 pairs up A={1,4} (w=-10) and B={2,3} (w=-10); round 2
    // offers two TIED cross edges {1,3} and {2,4} (both w=-5). The
    // orientation-dependent (w, src, dst) key gave A min (−5,1,3)
    // but B min (−5,2,4) — both entered and closed a 4-cycle. The
    // canonical (w, least, greatest) key makes both groups pick
    // {1,3}: spanning tree of exactly 3 edges, weight −25.
    val e = Seq((1L, 4L, -10L), (2L, 3L, -10L),
      (1L, 3L, -5L), (2L, 4L, -5L)).toDF("src", "dst", "w")
    val got = trace(graft.operators.Graph.boruvkaTrace(e, rounds = 4))
    assert(got.map(_._3).sum == 3L,
      s"spanning tree must have |V|-1 = 3 edges, got $got")
    assert(got.map(_._4).sum == -25L, got.toString)
    assert(got == Seq(
      (1L, 4L, 2L, -20L), (2L, 2L, 1L, -5L),
      (3L, 1L, 0L, 0L), (4L, 1L, 0L, 0L)), got.toString)
  }

  test("boruvkaTrace: hybrid driver finish is trace-identical to the " +
    "pure distributed path on a random tied-weight graph") {
    // localGroupCap = 0 forces every round distributed; the default
    // switches to the driver emulation immediately at this size. The
    // traces must agree row for row — same picks, same partial
    // contraction, same dedup — or the twin contract is broken.
    val rnd = new scala.util.Random(42)
    val edges = (1 to 160).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (a, b, (rnd.nextInt(4) + 1).toLong) // heavy weight ties
    }.filter(e => e._1 != e._2).toDF("src", "dst", "w")
    val dist = trace(graft.operators.Graph.boruvkaTrace(
      edges, rounds = 6, localGroupCap = 0L))
    val hyb = trace(graft.operators.Graph.boruvkaTrace(
      edges, rounds = 6))
    assert(dist == hyb, s"\ndistributed: $dist\nhybrid:      $hyb")
  }

  test("distinctivePhrases: a phrase exclusive to the en slice gets " +
    "positive log-odds, an exclusive non-en phrase negative; counts " +
    "and the hand-computed z match") {
    // 4 docs: "spark shuffle" twice in en only; "flink state" twice
    // in de only; "join" everywhere (background mass). Stopword 'the'
    // splits runs.
    val docs = Seq(
      (1L, "spark shuffle the join", "en"),
      (2L, "spark shuffle the join", "en"),
      (3L, "flink state the join", "de"),
      (4L, "flink state the join", "de"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.Retrieval.distinctivePhrases(docs, k = 10)
      .collect().map(r => r.getAs[String]("phrase") ->
        (r.getAs[Long]("n_en"), r.getAs[Long]("n_other"),
          r.getAs[Double]("log_odds"), r.getAs[Double]("z_score")))
      .toMap
    // candidate runs per doc: ("spark shuffle", "join") / ("flink
    // state", "join") → n_a = n_b = 4 phrase instances.
    assert(got("spark shuffle")._1 == 2L && got("spark shuffle")._2 == 0L)
    assert(got("flink state")._1 == 0L && got("flink state")._2 == 2L)
    assert(got("join")._1 == 2L && got("join")._2 == 2L)
    assert(got("spark shuffle")._3 > 0.0 && got("flink state")._3 < 0.0)
    // symmetric corpus: the two exclusive phrases mirror each other
    assert(got("spark shuffle")._4 == -got("flink state")._4, got.toString)
    // hand-computed: alpha0=100, n=8, y=2 → aw=25; ya=2, na=4:
    // delta = ln(27/(104-27)) - ln(25/(104-25)); z = delta/sqrt(1/27+1/25)
    val delta = math.log(27.0 / 77.0) - math.log(25.0 / 79.0)
    val z = delta / math.sqrt(1.0 / 27.0 + 1.0 / 25.0)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("spark shuffle")._3 == r6(delta), got.toString)
    assert(got("spark shuffle")._4 == r6(z), got.toString)
    // the balanced background phrase is exactly non-distinctive
    assert(got("join")._3 == 0.0 && got("join")._4 == 0.0)
  }

  test("conformalQuantile: matches an independent Scala " +
    "re-computation of the rank-pick quantiles, signed residual " +
    "quantile, and coverage on a 400-order frame") {
    val orders = (1 to 400).map(i =>
      (i.toLong, "P", 100.0 + (i * 17 % 250)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val got = graft.query.Analytics.conformalQuantile(orders)
      .collect().head
    // Re-derive the hash slices through the same expression, then
    // fold the whole CQR pipeline in plain Scala.
    val sl = orders.select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)").as("y"),
        pmod(graft.functions.TextOps.fingerprint64(
          concat(col("o_orderkey").cast("string"), lit(":cqr"))),
          lit(4L)).as("slice"))
      .collect().map(r => (r.getAs[Long]("y"), r.getAs[Long]("slice")))
    val train = sl.filter(_._2 <= 1L).map(_._1).sorted
    val nt = train.length
    val loRk = math.max(1, (nt * 1 + 19) / 20)
    val qlo = train(loRk - 1); val qhi = train(nt + 1 - loRk - 1)
    val calE = sl.filter(_._2 == 2L)
      .map { case (y, _) => math.max(qlo - y, y - qhi) }.sorted
    val nc = calE.length
    val qRk = math.min(nc, nc + 1 - (nc + 1) * 1 / 10)
    val qhat = calE(qRk.toInt - 1)
    val testY = sl.filter(_._2 == 3L).map(_._1)
    val covered = testY.count(y => y >= qlo - qhat && y <= qhi + qhat)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n_cal") == nc.toLong)
    assert(got.getAs[Long]("n_test") == testY.length.toLong)
    assert(got.getAs[Double]("qlo_dollars") == r6(qlo / 100.0))
    assert(got.getAs[Double]("qhi_dollars") == r6(qhi / 100.0))
    assert(got.getAs[Double]("qhat_dollars") == r6(qhat / 100.0))
    assert(got.getAs[Double]("coverage")
      == r6(covered.toDouble / testY.length))
  }

  test("conformalInterval: a calibration slice too small for the " +
    "level no longer vanishes — clamped to the max residual") {
    // 24 orders → calibration slice ~6 rows << 19, so the raw rank
    // nc+1 matched nothing before the clamp and priority P vanished.
    val orders = (1 to 24).map(i =>
      (i.toLong, "P", 100.0 + i)).toDF(
      "o_orderkey", "o_orderpriority", "o_totalprice")
    val got = graft.query.Analytics.conformalInterval(orders).collect()
    assert(got.length == 1,
      s"small-n priority must survive with conservative qhat: " +
        s"${got.toSeq}")
    assert(got.head.getAs[Double]("qhat_dollars") >= 0.0)
  }

  test("mannKendall: a strictly increasing 5-day series gives " +
    "S = 10, Var = 50/3, z = 9/sqrt(50/3); a flat series gives " +
    "null z and no significance") {
    val rows = (1 to 5).map(i => ("up", s"2024-01-0$i", i * 10.0)) ++
      (1 to 5).map(i => ("flat", s"2024-01-0$i", 7.0))
    val got = graft.query.Analytics
      .mannKendall(rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("s_stat"),
          r.getAs[Double]("var_s"),
          Option(r.getAs[java.lang.Double]("z")).map(_.toDouble),
          r.getAs[Boolean]("significant"))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // no ties: Var = 5·4·15/18 = 50/3; z = (10−1)/sqrt(50/3).
    assert(got("up") == ((5L, 10L, r6(50.0 / 3.0),
      Some(r6(9.0 / math.sqrt(50.0 / 3.0))), true)), got.toString)
    // all tied: tie sum equals the main term, Var = 0 → null z.
    assert(got("flat") == ((5L, 0L, 0.0, None, false)), got.toString)
  }

  test("logRank: identical groups give chi2 = 0; separated groups " +
    "match the hand-computed 49/17 hypergeometric statistic") {
    def fr(rows: Seq[(Long, String, String)],
           ship: Seq[(Long, String)]) = (
      rows.toDF("o_orderkey", "o_orderpriority", "o_orderdate"),
      ship.toDF("l_orderkey", "l_shipdate"))
    val (o1, l1) = fr(
      Seq((1L, "1-URGENT", "1998-05-01"), (2L, "1-URGENT", "1998-05-01"),
        (3L, "3-MEDIUM", "1998-05-01"), (4L, "3-MEDIUM", "1998-05-01")),
      Seq((1L, "1998-05-03"), (2L, "1998-05-05"),
        (3L, "1998-05-03"), (4L, "1998-05-05")))
    val same = graft.query.Analytics.logRank(o1, l1).collect().head
    assert(same.getAs[Double]("chi2") == 0.0, same.toString)
    assert(!same.getAs[Boolean]("significant"))
    // A completes at t = 1, 2; B at t = 9, 10:
    // E1 = 1·2/4 + 1·1/3 = 5/6; V = 12/48 + 4/18 = 17/36;
    // chi2 = (2 − 5/6)² / (17/36) = 49/17.
    val (o2, l2) = fr(
      Seq((1L, "1-URGENT", "1998-05-01"), (2L, "1-URGENT", "1998-05-01"),
        (3L, "3-MEDIUM", "1998-05-01"), (4L, "3-MEDIUM", "1998-05-01")),
      Seq((1L, "1998-05-02"), (2L, "1998-05-03"),
        (3L, "1998-05-10"), (4L, "1998-05-11")))
    val sep = graft.query.Analytics.logRank(o2, l2).collect().head
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(sep.getAs[Long]("n1") == 2L && sep.getAs[Long]("n2") == 2L)
    assert(sep.getAs[Long]("observed_a") == 2L)
    assert(sep.getAs[Double]("expected_a") == r6(5.0 / 6.0), sep.toString)
    assert(sep.getAs[Double]("chi2") == r6(49.0 / 17.0), sep.toString)
    assert(!sep.getAs[Boolean]("significant"))
  }

  test("kendallTau: one discordant pair out of six gives tau = 2/3 " +
    "with the exact no-ties variance; an all-tied side degenerates " +
    "to null tau and z") {
    def ev(ys: Seq[Double]) = (1 to 4).flatMap { d =>
      Seq(("view", s"2024-01-0$d", d * 0.10),
        ("purchase", s"2024-01-0$d", ys(d - 1)))
    }.toDF("event_type", "ts", "value")
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // x strictly increasing; y = [1,2,4,3] cents/100: only the
    // (day3, day4) pair is discordant → S = 5 − 1 = 4, n0 = 6,
    // no ties: tau = 2/3, Var = 4·3·13/18 = 26/3, z = 4/sqrt(26/3).
    val got = graft.query.Analytics
      .kendallTau(ev(Seq(0.01, 0.02, 0.04, 0.03))).collect().head
    assert(got.getAs[Long]("n_days") == 4L)
    assert(got.getAs[Long]("s_stat") == 4L, got.toString)
    assert(got.getAs[Double]("tau_b") == r6(4.0 / 6.0), got.toString)
    assert(got.getAs[Double]("z") == r6(4.0 / math.sqrt(26.0 / 3.0)),
      got.toString)
    assert(!got.getAs[Boolean]("significant"))
    // all-tied y: the tau denominator and the variance both hit 0.
    val tied = graft.query.Analytics
      .kendallTau(ev(Seq(0.05, 0.05, 0.05, 0.05))).collect().head
    assert(tied.getAs[Long]("s_stat") == 0L, tied.toString)
    assert(tied.isNullAt(tied.fieldIndex("tau_b")), tied.toString)
    assert(tied.isNullAt(tied.fieldIndex("z")))
    assert(!tied.getAs[Boolean]("significant"))
  }

  test("granger: a planted x->y lag-1 dependence is detected in the " +
    "causal direction only, with an overwhelming F") {
    // x iid (seeded); y_t = x_{t-1} +/- 1 cent: the unrestricted
    // model fits y almost perfectly (RSS1 = sum of +/-1 cent noise),
    // so F is enormous for view->purchase; x is unpredictable from
    // y's lag (= x two steps back) beyond its own lag, so the
    // reverse F stays small.
    val rnd = new scala.util.Random(11)
    val xs = Vector.fill(60)(10.0 + rnd.nextInt(1000) / 100.0)
    val d0 = java.time.LocalDate.parse("2024-01-01")
    val rows = (0 until 60).flatMap { t =>
      val day = d0.plusDays(t.toLong).toString
      val y = if (t == 0) 5.0
        else xs(t - 1) + (if (t % 2 == 0) 0.01 else -0.01)
      Seq(("view", day, xs(t)), ("purchase", day, y))
    }.toDF("event_type", "ts", "value")
    val got = graft.query.Analytics.granger(rows).collect()
      .map(r => r.getAs[String]("direction") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("f_stat"),
          r.getAs[Boolean]("significant"))).toMap
    assert(got("view->purchase")._1 == 59L)
    assert(got("view->purchase")._3,
      s"planted direction must be significant: $got")
    assert(got("view->purchase")._2 > 100.0, got.toString)
    assert(!got("purchase->view")._3,
      s"reverse direction must not be significant: $got")
    assert(got("view->purchase")._2 > got("purchase->view")._2)
  }

  test("diffInDiff: a planted 50-dollar treatment effect on the " +
    "hash-selected arm is recovered exactly against an independent " +
    "Scala re-computation; the null frame is not significant") {
    val custs = (1 to 200).map(i => Tuple1(i.toLong))
      .toDF("c_custkey")
    // Re-derive each customer's hash arm through the same expression.
    val arms = custs.select(col("c_custkey"),
        pmod(graft.functions.TextOps.fingerprint64(
          concat(col("c_custkey").cast("string"), lit(":did"))),
          lit(2L)).as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def orders(effect: Long) = (1 to 200).flatMap { i =>
      val k = i.toLong
      val pre = 100.0 + (i % 7)
      val lift = if (arms(k) == 1L) effect.toDouble else 0.0
      Seq((k * 2, k, "1995-06-01", pre),
        (k * 2 + 1, k, "1996-06-01", pre + (i % 3) + lift))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .select(col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"))
    val got = graft.query.Analytics
      .diffInDiff(custs, orders(50L)).collect().head
    // independent recomputation over the same integer dollars
    val diffs = (1 to 200).map { i =>
      val lift = if (arms(i.toLong) == 1L) 50L else 0L
      arms(i.toLong) -> ((i % 3).toLong + lift)
    }
    def stats(a: Long) = {
      val d = diffs.filter(_._1 == a).map(_._2)
      val n = d.length.toDouble
      val m = d.sum.toDouble / n
      val v = (d.map(x => x.toDouble * x).sum - d.sum.toDouble
        * d.sum / n) / (n - 1.0)
      (n, m, v)
    }
    val (nt, mt, vt) = stats(1L); val (nc, mc, vc) = stats(0L)
    val did = mt - mc
    val t = did / math.sqrt(vt / nt + vc / nc)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n_treat") == nt.toLong)
    assert(got.getAs[Double]("did_dollars") == r6(did), got.toString)
    assert(math.abs(got.getAs[Double]("t_stat") - r6(t)) <= 1e-6,
      s"${got.getAs[Double]("t_stat")} vs $t")
    assert(got.getAs[Boolean]("significant"))
    val nul = graft.query.Analytics
      .diffInDiff(custs, orders(0L)).collect().head
    assert(!nul.getAs[Boolean]("significant"), nul.toString)
    assert(math.abs(nul.getAs[Double]("did_dollars")) < 1.0)
  }

  test("kTruss: k <= 2 is rejected (the triangle peel cannot " +
    "represent the keep-everything truss)") {
    val e = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.operators.Graph.kTruss(e, k = 2)
    }
  }

  test("boruvkaTrace: all-tied K4 stays a forest (3 edges, not 4+)") {
    // Every edge weight equal: the worst tie storm. A correct pick
    // rule yields a spanning tree; the orientation bug inflated it.
    val e = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b, 7L))
      .toDF("src", "dst", "w")
    val got = trace(graft.operators.Graph.boruvkaTrace(e, rounds = 4))
    assert(got.map(_._3).sum == 3L, got.toString)
    assert(got.map(_._4).sum == 21L, got.toString)
    assert(got.last._2 == 1L && got.last._3 == 0L, got.toString)
  }
}
