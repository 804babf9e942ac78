package graft

import org.apache.spark.sql.functions._

/** Long-span sequential-statistics fixtures (VERDICT r11 gap #2): the
  * harness events table spans ~1 month, which never exercises the
  * seasonality / changepoint / always-valid families across genuine
  * seasons. These specs synthesize a 12-month typed-events frame with
  * PLANTED structure (a weekly cycle, a mid-year level shift, a
  * persistent lift, a null) and assert the operators detect it at the
  * documented power — exact expected values where the arithmetic is
  * exact, detection thresholds where it is not.
  */
class Round12LongSpanSpec extends SparkSpec {
  import spark.implicits._

  private val d0 = java.time.LocalDate.parse("2023-01-02") // a Monday

  /** 52 exact weeks, one "view" event per day; Mondays (epoch-day mod
    * 7 = 4 — the operator's locale-free dow pin) carry highCents, the
    * other six days lowCents.
    */
  // Dollar-scale values: acf's deviation snap divides cents by 100,
  // so sub-dollar deviations would round to 0 and null the acf.
  private def weeklyCycle(highCents: Long = 10000L,
                          lowCents: Long = 5000L) =
    (0 until 364).map { i =>
      val day = d0.plusDays(i.toLong)
      val dow = ((day.toEpochDay % 7) + 7) % 7
      val v = if (dow == 4L) highCents else lowCents
      ("view", day.toString, v / 100.0)
    }.toDF("event_type", "ts", "value")

  test("seasonality over 52 planted weeks: the Monday index is " +
    "exactly 1.75 and weekly structure explains 6/7 of the variance") {
    val got = graft.query.Analytics.seasonality(weeklyCycle())
      .collect().map(r => r.getAs[Long]("dow") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("dow_index"),
          r.getAs[Double]("var_share"))).toMap
    assert(got.size == 7 && got.values.forall(_._1 == 52L), got.toString)
    // mean = (2·low + 6·low)/7 ... with high = 2·low: mean = 8·low/7,
    // planted index = 7/4 = 1.75, others 7/8 = 0.875; between-group
    // variance IS total variance (the value is a pure function of
    // dow), split (6·low/7)² : 6×(low/7)² = 6/7 : 6·(1/42).
    assert(got(4L)._2 == 1.75 && got(4L)._3 == 0.857143, got.toString)
    (0L to 6L).filter(_ != 4L).foreach { d =>
      assert(got(d)._2 == 0.875 && got(d)._3 == 0.02381,
        s"dow $d: ${got(d)}")
    }
  }

  test("ljungBox over 52 planted weeks: the weekly cycle is detected " +
    "as overwhelming autocorrelation") {
    val got = graft.query.Analytics.ljungBox(weeklyCycle())
      .collect().head
    assert(got.getAs[Boolean]("significant"), got.toString)
    assert(got.getAs[Double]("q_stat") > 100.0, got.toString)
  }

  test("pettitt over 12 months: a clean mid-year level shift is " +
    "located exactly at the boundary day with K = m(n-m)") {
    // 365 days from 2023-01-01; cents 1000 through 2023-06-30
    // (m = 181 days), 4000 after. Midranks double-exactly, so the
    // U walk peaks at k = m with K = m(n-m) = 181·184 = 33304 and
    // p = 2·exp(-6K²/(n³+n²)) underflows the 6-dp round to 0.
    val start = java.time.LocalDate.parse("2023-01-01")
    val shift = java.time.LocalDate.parse("2023-07-01")
    val rows = (0 until 365).map { i =>
      val day = start.plusDays(i.toLong)
      val v = if (day.isBefore(shift)) 10.0 else 40.0
      ("view", day.toString, v)
    }.toDF("event_type", "ts", "value")
    val got = graft.query.Analytics.pettitt(rows).collect().head
    assert(got.getAs[Long]("n_days") == 365L)
    assert(got.getAs[Long]("k_stat") == 33304L, got.toString)
    assert(got.getAs[java.sql.Date]("cp_day").toString == "2023-06-30",
      got.toString)
    assert(got.getAs[Double]("p_approx") == 0.0)
    assert(got.getAs[Boolean]("significant"))
  }

  private def msprtRows(liftCents: Long) =
    (0 until 364).flatMap { i =>
      val day = d0.plusDays(i.toLong).toString
      // purchase alternates ±1 cent around 200 − lift, so the daily
      // view−purchase diff is lift±1: mean = lift, variance = 1.
      val p = (200L - liftCents + (if (i % 2 == 0) 1L else -1L)) / 100.0
      Seq(("view", day, 2.00), ("purchase", day, p))
    }.toDF("event_type", "ts", "value")

  test("msprt over 12 months: a persistent 10-cent daily lift is " +
    "rejected within days and the always-valid p never un-rejects") {
    val got = graft.query.Analytics.msprt(msprtRows(10L))
      .orderBy(col("n_days_so_far")).collect()
      .map(r => (r.getAs[Int]("n_days_so_far").toLong,
        r.getAs[Double]("p_always_valid"),
        r.getAs[Boolean]("reject_at_5pct")))
    assert(got.length == 364)
    val firstReject = got.find(_._3).map(_._1)
    assert(firstReject.exists(_ <= 10L),
      s"expected rejection within 10 days, got $firstReject")
    // p_t = min(1, min_{s<=t} 1/Λ_s) is monotone: once rejected,
    // rejected forever — THE property that makes peeking valid.
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 + 1e-12, s"p must be non-increasing: $a -> $b")
      assert(!a._3 || b._3, s"rejection must be absorbing: $a -> $b")
    }
    assert(got.last._2 == 0.0 && got.last._3)
  }

  test("msprt over 12 months: a zero-mean null (alternating ±1 cent) " +
    "never rejects — p_always_valid stays 1 all year") {
    val got = graft.query.Analytics.msprt(msprtRows(0L))
      .collect().map(r => (r.getAs[Double]("p_always_valid"),
        r.getAs[Boolean]("reject_at_5pct")))
    assert(got.length == 364)
    assert(got.forall(!_._2), "null series must never reject")
    assert(got.forall(_._1 == 1.0),
      s"Λ < 1 throughout → p pinned at 1, got ${got.take(5).toSeq}")
  }
}
