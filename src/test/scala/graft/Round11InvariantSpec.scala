package graft

import org.apache.spark.sql.functions._
import graft.query.Analytics

/** Seeded-random algebraic identities for the r11 operators — the
  * class of property the DuckDB differential cannot express (it
  * checks engine agreement, not mathematical structure).
  */
class Round11InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1107)

  test("pettitt: negating the series flips U but preserves K, the " +
    "changepoint day, and p") {
    val rows = (1 to 40).map { d =>
      ("a", java.sql.Timestamp.valueOf(f"2024-${1 + (d - 1) / 28}%02d-" +
        f"${1 + (d - 1) % 28}%02d 00:00:00"),
        (if (d <= 17) 10.0 else 40.0) + rnd.nextInt(5))
    }
    def run(sign: Double) = Analytics.pettitt(
        rows.map { case (t, ts, v) => (t, ts, sign * v) }
          .toDF("event_type", "ts", "value"))
      .collect().map(r => (r.getAs[Long]("k_stat"),
        Option(r.getAs[java.sql.Date]("cp_day")).map(_.toString),
        r.getAs[Double]("p_approx"))).head
    assert(run(1.0) == run(-1.0),
      "Pettitt is a rank statistic: sign flips cannot move it")
  }

  test("mde: translating every outcome by a constant leaves sigma " +
    "and the MDE exactly unchanged") {
    val customers = (1 to 50).map(i => Tuple1(i.toLong))
      .toDF("c_custkey")
    def fixed(shift: Double) = (1 to 50).map(i =>
      (i.toLong, "1997-01-01", 100.0 + (i * 37 % 50) + shift))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val a = Analytics.mde(customers, fixed(0.0)).collect().head
    val b = Analytics.mde(customers, fixed(1000.0)).collect().head
    assert(a.getAs[Double]("sigma") == b.getAs[Double]("sigma"))
    assert(a.getAs[Double]("mde_abs") == b.getAs[Double]("mde_abs"))
  }

  test("kTruss subset-of-kCore: every 3-truss edge endpoint keeps " +
    "degree >= 2 inside the truss") {
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toDF("a", "b")
    val truss = graft.operators.Graph.kTruss(edges, k = 3)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = truss.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length }
    assert(truss.isEmpty || deg.values.min >= 2,
      s"a triangle-supported edge implies degree >= 2: $deg")
  }

  test("bhFdr: at alpha so large every p passes, all tests are " +
    "rejected; the BH ranks are a permutation") {
    val customers = (1 to 600).map { i =>
      (i.toLong, (i % 5).toLong,
        Seq("A", "B", "C", "D", "E")(rnd.nextInt(5)),
        Seq(0.0, 3000.0, 7000.0)(rnd.nextInt(3)))
    }.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Analytics.bhFdr(customers, alphaNum = 1L, alphaDen = 1L)
      .collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Boolean]("rejected")),
      "p <= k*m/m = k always holds at alpha = 1")
    val ks = got.map(_.getAs[Int]("k_rank")).sorted
    assert(ks.toSeq == (1 to got.length).toSeq, ks.toSeq.toString)
  }

  test("ltvCohorts: the curve is non-decreasing in age within every " +
    "cohort (cumulative money cannot shrink)") {
    val rows = (1 to 300).map { i =>
      (rnd.nextInt(60).toLong,
        f"202${rnd.nextInt(2)}%d-${1 + rnd.nextInt(12)}%02d-15",
        1.0 + rnd.nextInt(500))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.ltvCohorts(rows)
      .collect().map(r => (r.getAs[Long]("cohort_month"),
        r.getAs[Long]("age_months"), r.getAs[Double]("avg_ltv_dollars")))
      .groupBy(_._1)
    got.foreach { case (c, xs) =>
      val curve = xs.sortBy(_._2).map(_._3)
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a },
        s"cohort $c LTV must be non-decreasing: ${curve.toSeq}")
    }
  }
}
