package graft

import org.apache.spark.sql.functions._

/** Seeded-random invariant checks for the round-10 statistics and
  * graph operators — the algebraic identities the hand-computed
  * cases can't cover (monotonicity, complements, conservation).
  */
class Round10InvariantSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: survival is non-increasing in t within every " +
    "priority and stays in (0, 1]") {
    val rnd = new scala.util.Random(42)
    val orders = (1L to 300L).map { k =>
      (k, s"P${k % 3}", "2020-01-%02d".format(1 + rnd.nextInt(20)))
    }.toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = (1L to 300L).map { k =>
      (k, "2020-01-%02d".format(5 + new scala.util.Random(77 * k)
        .nextInt(25)))
    }.toDF("l_orderkey", "l_shipdate")
    val rows = graft.query.Analytics
      .kaplanMeier(orders, li, asOf = "2020-01-25")
      .orderBy(col("priority"), col("t_days")).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("t_days"),
        r.getAs[Double]("survival")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (p, rs) =>
      val s = rs.sortBy(_._2).map(_._3)
      assert(s.forall(v => v > 0.0 && v <= 1.0), s"$p range: ${s.toSeq}")
      assert(s.zip(s.tail).forall { case (a, b) => b <= a },
        s"$p monotone: ${s.toSeq}")
    }
  }

  test("mannWhitney: swapping the groups complements U " +
    "(U_A + U_B = na*nb) and negates z") {
    val fwd = graft.query.Analytics.mannWhitney(
        graft.queries.Tables.customer(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Double]("u_a"), r.getAs[Double]("z"))).toMap
    val rev = graft.query.Analytics.mannWhitney(
        graft.queries.Tables.customer(spark, "/root/testdata/sf0.001"),
        groupA = "MACHINERY", groupB = "BUILDING")
      .collect().map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Double]("u_a"), r.getAs[Double]("z"))).toMap
    assert(fwd.nonEmpty)
    fwd.foreach { case (nation, (na, nb, ua, z)) =>
      val (ub, zb) = rev(nation)
      assert(ua + ub == na.toDouble * nb,
        s"nation $nation: $ua + $ub != $na*$nb")
      assert(math.abs(z + zb) < 1e-5, s"nation $nation: $z vs $zb")
    }
  }

  test("unimax: every allocation respects its cap, the budget is " +
    "never exceeded, and an uncapped row means the budget is spent") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 60L).map { i =>
      (i, (1 to (5 + rnd.nextInt(200))).map(j => s"w$j").mkString(" "),
        s"src${i % 9}")
    }.toDF("doc_id", "text", "source")
    val rows = graft.operators.Mixing.unimax(docs).collect()
      .map(r => (r.getAs[Boolean]("capped"), r.getAs[Long]("cap"),
        r.getAs[Double]("alloc_tokens"),
        r.getAs[Double]("epochs_used")))
    val totalTokens = rows.map(_._2 / 4).sum
    val budget = totalTokens / 2
    val spent = rows.map(_._3).sum
    assert(rows.forall { case (_, cap, a, _) => a <= cap + 1e-6 })
    assert(rows.forall(_._4 <= 4.0 + 1e-6), "epoch cap holds")
    assert(spent <= budget + 1e-3, s"$spent vs $budget")
    if (rows.exists(!_._1))
      assert(math.abs(spent - budget) < 1e-3,
        s"uncapped present -> budget exhausted: $spent vs $budget")
  }

  test("adamicAdar: reported pairs are never existing edges and " +
    "scores are positive") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 400).map { _ =>
      val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct.toDF("a", "b")
    val edgeSet = edges.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.operators.Graph.adamicAdar(edges, k = 500).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val p = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      assert(!edgeSet.contains(p), s"edge leaked: $p")
      assert(r.getAs[Long]("n_common") >= 1L)
      assert(r.getAs[Double]("aa_score") > 0.0)
    }
  }
}
