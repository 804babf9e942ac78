package graft

import org.apache.spark.sql.functions._
import graft.query.Analytics

/** r12 algebraic identities beyond the oracles: properties the
  * statistics must satisfy for ANY input, checked on fixed seeded
  * frames (the Round11InvariantSpec pattern).
  */
class Round12InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(19)
  private val d0 = java.time.LocalDate.parse("2024-03-01")

  private def pairSeries(n: Int, flipY: Boolean = false) =
    (0 until n).flatMap { t =>
      val day = d0.plusDays(t.toLong).toString
      val x = 10.0 + rnd.nextInt(500) / 100.0
      val y = 20.0 + rnd.nextInt(500) / 100.0
      Seq(("view", day, x), ("purchase", day, if (flipY) -y else y))
    }.toDF("event_type", "ts", "value")

  test("kendallTau: negating the purchase series flips the sign of " +
    "S, tau and z exactly (concordance antisymmetry)") {
    val base = (0 until 25).flatMap { t =>
      val day = d0.plusDays(t.toLong).toString
      Seq(("view", day, 10.0 + rnd.nextInt(300) / 100.0),
        ("purchase", day, 5.0 + rnd.nextInt(300) / 100.0))
    }
    val pos = Analytics.kendallTau(
      base.toDF("event_type", "ts", "value")).collect().head
    val neg = Analytics.kendallTau(
      base.map { case (e, d, v) =>
        (e, d, if (e == "purchase") -v else v) }
        .toDF("event_type", "ts", "value")).collect().head
    assert(pos.getAs[Long]("s_stat") == -neg.getAs[Long]("s_stat"))
    assert(pos.getAs[Double]("tau_b") == -neg.getAs[Double]("tau_b"))
    assert(pos.getAs[Double]("z") == -neg.getAs[Double]("z"))
    assert(pos.getAs[Boolean]("significant")
      == neg.getAs[Boolean]("significant"))
  }

  test("mannKendall: reversing the calendar flips S exactly and " +
    "preserves the variance (a trend backwards is the trend negated)") {
    val vals = (0 until 30).map(_ => 1.0 + rnd.nextInt(400) / 100.0)
    def frame(rev: Boolean) = (0 until 30).map { t =>
      val v = if (rev) vals(29 - t) else vals(t)
      ("view", d0.plusDays(t.toLong).toString, v)
    }.toDF("event_type", "ts", "value")
    val f = Analytics.mannKendall(frame(rev = false)).collect().head
    val r = Analytics.mannKendall(frame(rev = true)).collect().head
    assert(f.getAs[Long]("s_stat") == -r.getAs[Long]("s_stat"))
    assert(f.getAs[Double]("var_s") == r.getAs[Double]("var_s"))
  }

  test("granger: rescaling the cause series by 4x leaves both F " +
    "statistics invariant (OLS scale equivariance)") {
    val base = (0 until 40).flatMap { t =>
      val day = d0.plusDays(t.toLong).toString
      Seq(("view", day, 10.0 + rnd.nextInt(400) / 100.0),
        ("purchase", day, 30.0 + rnd.nextInt(400) / 100.0))
    }
    def fmap(scale: Double) = Analytics.granger(
      base.map { case (e, d, v) =>
        (e, d, if (e == "view") v * scale else v) }
        .toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[String]("direction")
        -> r.getAs[Double]("f_stat")).toMap
    val f1 = fmap(1.0); val f4 = fmap(4.0)
    // exact in algebra; the double Cramer trees agree to ~1e-9 rel.
    f1.keys.foreach { k =>
      assert(math.abs(f1(k) - f4(k))
        <= 1e-6 * math.max(1.0, math.abs(f1(k))),
        s"$k: ${f1(k)} vs ${f4(k)}")
    }
  }

  test("logRank: swapping which group is 'A' preserves chi2 and " +
    "significance (two-sample symmetry)") {
    val orders = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "1-URGENT" else "3-MEDIUM",
        "1998-04-01")
    }.toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val ship = (1 to 40).map { i =>
      (i.toLong, d0.withMonth(4).withDayOfMonth(2)
        .plusDays(rnd.nextInt(30).toLong).withYear(1998).toString)
    }.toDF("l_orderkey", "l_shipdate")
    val a = Analytics.logRank(orders, ship, groupA = "1-URGENT")
      .collect().head
    val b = Analytics.logRank(orders, ship, groupA = "3-MEDIUM")
      .collect().head
    assert(a.getAs[Long]("n1") == b.getAs[Long]("n2"))
    val ca = a.getAs[Double]("chi2"); val cb = b.getAs[Double]("chi2")
    assert(math.abs(ca - cb) <= 1e-6 * math.max(1.0, math.abs(ca)),
      s"$ca vs $cb")
    assert(a.getAs[Boolean]("significant")
      == b.getAs[Boolean]("significant"))
  }

  test("conformalQuantile: translating every price by a constant " +
    "shifts the band but leaves qhat and coverage unchanged") {
    def orders(shift: Double) = (1 to 300).map(i =>
      (i.toLong, "P", 100.0 + (i * 13 % 200) + shift))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
    val a = Analytics.conformalQuantile(orders(0.0)).collect().head
    val b = Analytics.conformalQuantile(orders(500.0)).collect().head
    assert(a.getAs[Double]("qhat_dollars")
      == b.getAs[Double]("qhat_dollars"))
    assert(a.getAs[Double]("coverage") == b.getAs[Double]("coverage"))
    assert(b.getAs[Double]("qlo_dollars")
      == a.getAs[Double]("qlo_dollars") + 500.0)
  }
}
