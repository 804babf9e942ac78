package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sketch}

/** KMV sketch accuracy/exactness and winnow-pair recall gates. */
class SketchSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = graft.queries.Tables.documents(spark, sf)

  test("KMV estimation path lands within 30% of exact (k=64, n≈100)") {
    val exact = docs.groupBy(col("lang"))
      .agg(countDistinct(col("doc_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.kmvDistinctByGroup(
      docs.select(col("lang"), col("doc_id")), "lang", "doc_id", 64)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Int]("k_actual"), r.getAs[Double]("estimate"))).toMap
    assert(est.keySet == exact.keySet)
    est.foreach { case (lang, (kAct, e)) =>
      val n = exact(lang)
      if (n > 64) {
        assert(kAct == 64)
        assert(math.abs(e - n) / n <= 0.30, s"$lang: est $e exact $n")
      } else assert(e == n.toDouble, s"$lang: small group must be exact")
    }
  }

  test("KMV below-k groups report the exact count (k_actual < k)") {
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketch.kmvDistinctByGroup(
      docs.select(col("source"), col("doc_id")), "source", "doc_id", 64)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("estimate")).toMap
    exact.foreach { case (src, n) =>
      assert(n < 64 && est(src) == n.toDouble, s"$src")
    }
  }

  test("native HLL rho == declarative rho over the full events substrate") {
    val ev = graft.queries.Tables.events(spark, sf)
    val rest = shiftright(
      graft.functions.TextOps.fingerprint64(col("user_id").cast("string")),
      6)
    val diff = ev.select(
        call_function("graft_hll_rho", rest).as("n"),
        Sketch.rhoDeclarative(rest).as("d"))
      .filter(col("n") =!= col("d")).count()
    assert(diff == 0, s"$diff rows drifted between native and declarative rho")
    // boundary values: rest = 0 → 55, top bit (53) set → 1, bit 0 → 54
    val edge = spark.range(1).select(
      call_function("graft_hll_rho", lit(0L)).as("z"),
      call_function("graft_hll_rho", lit(1L << 53)).as("t"),
      call_function("graft_hll_rho", lit(1L)).as("o")).collect().head
    assert(edge.getInt(0) == 55 && edge.getInt(1) == 1 && edge.getInt(2) == 54)
  }

  test("native hashVector == declarative hashVector, token for token") {
    val diff = docs.select(
        graft.functions.TextOps.hashVector(col("text")).as("d"),
        graft.functions.TextOps.hashVectorNative(col("text")).as("n"))
      .filter(col("n") =!= col("d")).count()
    assert(diff == 0, s"$diff docs drifted between native and declarative")
    // empty text still hashes its one empty token, in both forms
    val e = spark.sql("SELECT graft_hash_vector('', 32) AS v")
      .collect().head.getSeq[Long](0)
    assert(e.length == 32 && e.map(math.abs).sum == 1)
  }

  test("winnow candidate pairs recover every injected near-dup pair") {
    val corpus = Dedup.withNearDuplicates(docs)
    val pairs = Dedup.winnowCandidatePairs(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val injected = docs.filter(col("doc_id") % 50 === 0)
      .collect().map(_.getAs[Long]("doc_id"))
      .map(id => (id, id + 1000000L)).toSet
    injected.foreach(p => assert(pairs.contains(p), s"missing $p"))
    // and compression really happened: candidate set ≪ all-pairs
    val n = corpus.count()
    assert(pairs.size < n * (n - 1) / 20)
  }

  test("HLL shard merge is bit-identical to the direct sketch") {
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("user_id"))
    val direct = Sketch.hllDistinctByGroup(
        ev.select(col("event_type"), col("user_id")),
        "event_type", "user_id")
      .select(col("event_type").as("g"), col("zeros"), col("estimate"))
    val merged = Sketch.hllMergeEstimate(
      Sketch.hllRegisterShards(ev, "event_type", "day", "user_id"))
    // max∘max = max: zeros AND the 6-dp estimate must agree exactly
    assert(direct.exceptAll(merged).isEmpty &&
      merged.exceptAll(direct).isEmpty)
    // and the shards really are sketch-sized: ≤ 64 rows per (g, day)
    val maxShard = Sketch.hllRegisterShards(ev, "event_type", "day",
        "user_id")
      .groupBy(col("g"), col("epoch")).count()
      .agg(max(col("count"))).collect().head.getLong(0)
    assert(maxShard <= 64)
  }

  test("HDR quantile sketch lands within its 1/32 relative-error bound") {
    val li = graft.queries.Tables.lineitem(spark, sf)
    val out = Sketch.hdrQuantiles(li, "l_returnflag", "l_extendedprice")
      .collect().map(r => (r.getString(0),
        r.getDecimal(1).doubleValue()) -> r.getDecimal(5).doubleValue())
      .toMap
    assert(out.size == 9) // 3 flags × 3 quantiles
    val exact = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.50, 0.95, 0.99))")
        .as("q"))
      .collect().flatMap(r => r.getSeq[Double](1).zip(Seq(0.50, 0.95, 0.99))
        .map { case (v, p) => (r.getString(0), p) -> v }).toMap
    exact.foreach { case (k, v) =>
      val est = out(k)
      // bin midpoint vs exact interpolated percentile: half a bin width
      // (1/32) plus interpolation slack
      assert(math.abs(est - v) / v <= 0.04, s"$k: est $est exact $v")
    }
  }

  test("HDR deciles: monotone in value, near-balanced mass") {
    val orders = graft.queries.Tables.orders(spark, sf)
    val got = Sketch.hdrDecileBuckets(orders, "o_orderkey",
      "o_totalprice").collect()
      .map(r => (r.getLong(1), r.getInt(3)))
    assert(got.nonEmpty)
    // deciles are monotone in the underlying value
    val byDecile = got.groupBy(_._2).view
      .mapValues(vs => (vs.map(_._1).min, vs.map(_._1).max)).toMap
    byDecile.keys.toSeq.sorted.sliding(2).foreach {
      case Seq(lo, hi) => assert(byDecile(lo)._2 <= byDecile(hi)._1 ||
        // boundary bins may straddle: allow overlap only within one bin
        Sketch.hdrBin(byDecile(lo)._2) <= Sketch.hdrBin(byDecile(hi)._1))
      case _ =>
    }
    // mass per decile within 2x of ideal (bin granularity slack)
    val n = got.length.toDouble
    byDecile.keys.foreach { d =>
      val share = got.count(_._2 == d) / n
      assert(share < 0.2, s"decile $d holds ${share * 100}%")
    }
  }

  test("grouped CMS: per-group estimates are one-sided and isolated") {
    val got = Sketch.cmsHeavyHittersByGroup(docs, "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    // CMS never underestimates, per group
    got.foreach { case (g, tok, exact, est) =>
      assert(est >= exact, s"($g, $tok): est $est < exact $exact")
    }
    // every language got its own top-5 (tenant isolation)
    val perLang = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ == 5), perLang.toString)
  }

  test("HDR bins are exact unit bins below 16 cents") {
    import spark.implicits._
    val df = Seq(("a", new java.math.BigDecimal("0.01")),
      ("a", new java.math.BigDecimal("0.01")),
      ("a", new java.math.BigDecimal("0.15")))
      .toDF("g", "v")
    val q = Sketch.hdrQuantiles(df, "g", "v", Seq("0.50"))
      .collect().head
    // p50 of (1¢, 1¢, 15¢) = the 1-cent exact bin, midpoint 0.010
    assert(q.getLong(4) == 1L &&
      q.getDecimal(5).compareTo(new java.math.BigDecimal("0.010")) == 0)
  }
}
