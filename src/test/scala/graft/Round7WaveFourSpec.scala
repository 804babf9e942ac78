package graft

import org.apache.spark.sql.functions._
import graft.operators.Itemsets
import graft.query.Analytics
import graft.queries.Tables
import graft.streaming.Events

/** Round-7 fourth-wave invariants: a-priori co-occurrence mining,
  * DP-noise mechanism bounds, watermark late-data accounting.
  */
class Round7WaveFourSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("frequentPairs: a < b, supports consistent, a-priori prune holds") {
    val li = Tables.lineitem(spark, sf)
    val got = Itemsets.frequentPairs(li, "l_orderkey", "l_partkey",
      minItemSupport = 2, k = 50).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val (nAb, nA, nB) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(a < b)
      // pair support can never exceed either item's support, and the
      // a-priori prune admitted only items at/above the threshold
      assert(nAb <= nA && nAb <= nB && nA >= 2 && nB >= 2)
    }
    // spot-check the top pair's support against a direct recount
    val top = got.head
    val recount = li.select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .filter(array_contains(col("ps"), top.getLong(0)) &&
        array_contains(col("ps"), top.getLong(1)))
      .count()
    assert(recount == top.getLong(2))
  }

  test("frequentPairs: lift is n_ab*N/(n_a*n_b) and order deterministic") {
    import spark.implicits._
    // baskets: {1,2} ×3, {1,3} ×1 — with minSupport 1 all pairs emit
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 1L),
      (12L, 2L), (13L, 1L), (13L, 3L)).toDF("bk", "it")
    val got = Itemsets.frequentPairs(b, "bk", "it", 1, 10).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      == Seq((1L, 2L, 3L), (1L, 3L, 1L)))
    // lift(1,2) = 3·4/(4·3) = 1.0; lift(1,3) = 1·4/(4·1) = 1.0
    assert(got.forall(_.getDouble(5) == 1.0))
  }

  test("dpNoisyCounts: noise is bounded, deterministic, and nonzero") {
    val cust = Tables.customer(spark, sf)
    val keys = Seq("c_nationkey", "c_mktsegment")
    val a = Analytics.dpNoisyCounts(cust, keys).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val b = Analytics.dpNoisyCounts(cust, keys).collect()
      .map(r => (r.getInt(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(a == b) // seeded noise: the release is reproducible
    // |Laplace(1)| via inverse CDF of u ∈ (−½,½) is < ln(2⁶⁰) ≈ 41.6
    a.values.foreach { case (n, noisy) =>
      assert(math.abs(noisy - n) < 42.0)
    }
    // and it IS noise: not every group lands within 0.01 of its count
    assert(a.values.count { case (n, noisy) =>
      math.abs(noisy - n) > 0.01 } > a.size / 2)
  }

  test("cc-star components == min-label propagation components") {
    import graft.operators.Dedup
    val pairs = Dedup.minhashVerifiedPairs(
      Dedup.withNearDuplicates(Tables.documents(spark, sf)))
    val prop = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val star = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == prop)
  }

  test("cc-star resolves a long chain (diameter >> log n) to one root") {
    import spark.implicits._
    // path 0—1—2—…—20: worst case for per-round label propagation
    val chain = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.connectedComponentsStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 21 && got.forall(_._2 == 0L))
  }

  test("embeddingDrift: identical snapshots never drift; a real " +
    "direction change does") {
    import spark.implicits._
    val prev = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val same = graft.operators.Similarity.embeddingDrift(prev, prev)
      .collect()
    assert(same.forall(r => r.getDouble(1) == 1.0 && !r.getBoolean(2)))
    val curr = Seq((1L, Array(0.0f, 1.0f)), (2L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.embeddingDrift(prev, curr)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(1L) && !got(2L))
  }

  test("trendSlope recovers an exact planted line (y = 2x + 3)") {
    import spark.implicits._
    val epoch = java.sql.Date.valueOf("1992-01-01")
    def day(d: Int) = new java.sql.Date(
      epoch.getTime + d.toLong * 86400000L)
    val df = Seq(0, 1, 2, 3, 10).map(x =>
      ("g", day(x), new java.math.BigDecimal(2 * x + 3).setScale(2)))
      .toDF("g", "d", "y")
    val r = Analytics.trendSlope(df, "g", col("d"), col("y")).collect().head
    assert(r.getLong(1) == 5 && r.getDouble(2) == 2.0 &&
      r.getDouble(3) == 3.0)
  }

  test("joinDegreeProfile: contributions, total, and ranking are exact") {
    import spark.implicits._
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")   // degrees 3, 1, 1
    val right = Seq(1L, 1L, 2L, 4L).toDF("k")      // degrees 2, 1 (+4 unmatched)
    val got = Analytics.joinDegreeProfile(left, "k", right, "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // est = 3·2 + 1·1 = 7; key 4 appears on one side only
    assert(got.toSeq == Seq((1L, 3L, 2L, 6L, 7L, math.rint(6.0 / 7 * 1e6) / 1e6),
      (2L, 1L, 1L, 1L, 7L, math.rint(1.0 / 7 * 1e6) / 1e6)))
  }

  test("cohenKappa: perfect agreement is 1, chance-level is 0") {
    import spark.implicits._
    val a = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y"))
      .toDF("id", "la")
    val perfect = Analytics.cohenKappa(a, a.withColumnRenamed("la", "lb"),
      "id", "la", "lb").collect().head
    assert(perfect.getDouble(4) == 1.0)
    // a: x,x,y,y vs b: x,y,x,y — po = 0.5, pe = 0.5, kappa = 0
    val b = Seq((1L, "x"), (2L, "y"), (3L, "x"), (4L, "y"))
      .toDF("id", "lb")
    val chance = Analytics.cohenKappa(a, b, "id", "la", "lb")
      .collect().head
    assert(chance.getDouble(2) == 0.5 && chance.getDouble(3) == 0.5 &&
      chance.getDouble(4) == 0.0)
  }

  test("tokenBudgetSample: kept prefix is maximal under the budget") {
    import graft.operators.Sampling
    import graft.functions.TextOps
    val budget = 25000L
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val kept = Sampling.tokenBudgetSample(docs, budget).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val total = kept.values.map(_.toLong).sum
    assert(total <= budget)
    // replay the global (bucket, h, id) order: the kept set must be
    // exactly the take-while prefix, and the next doc must overflow
    val ordered = docs.select(col("doc_id"),
        TextOps.tokenCount(col("text")).as("n"),
        TextOps.fingerprint64(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(2) % 1024, r.getLong(2),
        r.getLong(0), r.getInt(1)))
      .sortBy(t => (t._1, t._2, t._3))
    var cum = 0L
    var keptCum = 0L
    ordered.foreach { case (_, _, id, n) =>
      cum += n // the running sum counts every doc, kept or not
      if (cum <= budget) {
        assert(kept.contains(id), s"doc $id missing from prefix")
        keptCum += n
      } else assert(!kept.contains(id), s"doc $id beyond the budget")
    }
    assert(keptCum == total)
  }

  test("triangles: exactly the closed wedges, each once, a < b < c") {
    import spark.implicits._
    // K4 on {1,2,3,4} minus edge (3,4): triangles 123, 124 only
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val got = graft.operators.Graph.triangles(e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 3L), (1L, 2L, 4L)))
  }

  test("rollingAnomaly: a planted spike is flagged, steady days are not") {
    import spark.implicits._
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf("2024-01-01").getTime + day * 86400000L)
    // 10 gently-alternating days (100/110), then a 10x spike
    val rows = (0 until 10).map(d => (d.toLong, ts(d), 1L, "click",
      new java.math.BigDecimal(100 + 10 * (d % 2)).setScale(2))) :+
      (10L, ts(10), 1L, "click", new java.math.BigDecimal("1000.00"))
    val e = rows.toDF("event_id", "ts", "user_id", "event_type", "v")
    val got = Analytics.rollingAnomaly(e).collect()
      .map(r => r.getDate(1).toString -> r.getBoolean(5)).toMap
    assert(got("2024-01-11"), "spike day must flag")
    assert(got.count(_._2) == 1, "only the spike flags")
    // the first day has no trailing window -> null z, not a flag
    val z = Analytics.rollingAnomaly(e).collect()
      .map(r => r.getDate(1).toString -> r.get(4)).toMap
    assert(z("2024-01-01") == null)
  }

  test("welchTTest: zero-difference arms give t = 0; planted shift " +
    "gives a large |t|") {
    import spark.implicits._
    def bd(v: String) = new java.math.BigDecimal(v)
    val same = (1 to 20).flatMap(i => Seq(
      ("A", bd(s"${100 + i % 3}.00")), ("B", bd(s"${100 + i % 3}.00"))))
      .toDF("g", "x")
    val t0 = Analytics.welchTTest(same, "g", "A", "B", col("x"))
      .collect().head
    assert(t0.getDouble(4) == 0.0)
    val shifted = ((1 to 20).map(i => ("A", bd(s"${100 + i % 3}.00"))) ++
      (1 to 20).map(i => ("B", bd(s"${200 + i % 3}.00"))))
      .toDF("g", "x")
    val t1 = Analytics.welchTTest(shifted, "g", "A", "B", col("x"))
      .collect().head
    assert(math.abs(t1.getDouble(4)) > 100,
      s"planted 100-unit shift: t = ${t1.getDouble(4)}")
    assert(t1.getLong(0) == 20 && t1.getLong(1) == 20)
  }

  test("ivf incremental assignment matches full-index cells for the " +
    "delta batch") {
    import graft.operators.Quantizer
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val prev = emb.filter(col("vec_id") % 2 === 0)
    val delta = emb.filter(col("vec_id") % 2 === 1)
    val cents = Quantizer.fit(prev, 8)
    val inc = Quantizer.assign(delta, cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // assigning the delta one vector at a time (same centroids) agrees
    val whole = Quantizer.assign(delta.limit(20), cents)
      .select(col("vec_id"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    whole.foreach { case (id, c) => assert(inc(id) == c) }
    assert(inc.nonEmpty && inc.values.toSet.size > 1)
  }

  test("pointInTime: each fact sees exactly the version valid at its " +
    "timestamp") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val dim = Seq(
      (1L, "old", d("1992-01-01"), d("1995-01-01")),
      (1L, "new", d("1995-01-01"), null.asInstanceOf[java.sql.Date]),
      (2L, "only", d("1992-01-01"), null.asInstanceOf[java.sql.Date]))
      .toDF("k", "seg", "valid_from", "valid_to")
    val facts = Seq((10L, 1L, d("1994-12-31")), (11L, 1L, d("1995-01-01")),
      (12L, 2L, d("1999-01-01")), (13L, 3L, d("1999-01-01")))
      .toDF("id", "fk", "ts")
    val got = graft.operators.TemporalJoin
      .pointInTime(facts, "fk", "ts", dim, "k")
      .select(col("id"), col("seg")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // boundary day flips to the new version (valid_to exclusive);
    // unknown keys (id 13) drop — inner semantics
    assert(got == Map(10L -> "old", 11L -> "new", 12L -> "only"))
  }

  test("purgeAudit: cascade counts are consistent and partition the " +
    "tables") {
    val cust = Tables.customer(spark, sf)
    val ords = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val delCust = cust.filter(col("c_acctbal") < -900)
      .select(col("c_custkey").as("key"))
    val delOrd = ords.join(delCust, col("o_custkey") === col("key"))
      .select(col("o_orderkey").as("key"))
    val audit = Analytics.purgeAudit(Seq(
      ("customer", cust, "c_custkey", delCust),
      ("orders", ords, "o_custkey", delCust),
      ("lineitem", li, "l_orderkey", delOrd))).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // purged + kept == table size, for every table
    assert(audit("customer")._1 + audit("customer")._2 == cust.count())
    assert(audit("orders")._1 + audit("orders")._2 == ords.count())
    assert(audit("lineitem")._1 + audit("lineitem")._2 == li.count())
    // the cascade purges the deleted customers' orders exactly
    assert(audit("orders")._1 == delOrd.count())
    assert(audit("customer")._1 == delCust.count())
  }

  test("contrastivePairs: positives are the next chunk and share the " +
    "overlap tokens") {
    import graft.operators.Curation
    val docs = Tables.documents(spark, sf)
    val pairs = Curation.contrastivePairs(docs).collect()
    assert(pairs.nonEmpty)
    pairs.take(50).foreach { r =>
      val anchor = r.getString(2).split(" ")
      val positive = r.getString(3).split(" ")
      // stride 24, size 32: anchor tokens [24, 32) == positive [0, 8)
      val overlap = anchor.drop(24)
      assert(overlap.sameElements(positive.take(overlap.length)),
        s"doc ${r.getLong(0)} chunk ${r.getInt(1)}: no overlap")
    }
    // shuffle keys are unique per (doc, chunk)
    val keys = pairs.map(_.getLong(4))
    assert(keys.distinct.length == keys.length)
  }

  test("piiCounts: counts match what the redaction chain removes") {
    import spark.implicits._
    val df = Seq("mail a@b.com and b@c.org tel 555-123-4567 acct 1234567",
      "nothing here").toDF("note")
    val got = df.select(graft.functions.Clean.piiCounts(col("note")): _*)
      .collect()
    assert(got(0).getInt(0) == 2)  // two emails
    assert(got(0).getInt(1) == 1)  // one phone-shaped run
    assert(got(0).getInt(2) == 1)  // one long number
    assert(got(1).getInt(0) == 0 && got(1).getInt(1) == 0 &&
      got(1).getInt(2) == 0)
  }

  test("degreeProfile: buckets bound their degrees and ends sum to |E|") {
    import graft.operators.Graph
    val edges = Graph.purchaseEdges(Tables.orders(spark, sf),
      Tables.lineitem(spark, sf))
    val prof = Graph.degreeProfile(edges).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(prof.nonEmpty)
    prof.foreach { case (bucket, _, minD, maxD, _) =>
      assert(minD >= (1L << bucket) && maxD < (1L << (bucket + 1)))
    }
    assert(prof.map(_._5).sum == edges.count())
  }

  test("rateLimit: caps every (key, window) at the arrival-first rows") {
    import graft.operators.Sampling
    val e = Events.typed(Tables.events(spark, sf))
    val kept = Sampling.rateLimit(e, "user_id", "ts", "event_id",
      "1 day", 2)
    val over = kept
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).filter(col("n") > 2).count()
    assert(over == 0)
    // kept rows are the smallest event_ids of their group
    val perGroup = e.select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_id")).collect()
      .groupBy(r => (r.getLong(0), r.getDate(1).toString))
      .map { case (k, rs) => k -> rs.map(_.getLong(2)).sorted.take(2).toSet }
    val keptSet = kept.select(col("user_id"), to_date(col("ts")).as("day"),
        col("event_id")).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString), r.getLong(2)))
    keptSet.foreach { case (k, id) =>
      assert(perGroup(k).contains(id), s"$k kept non-first $id")
    }
  }

  test("dedupPipelineAudit: funnel counts are monotone and consistent " +
    "with the component ops") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
    val corpus = Dedup.withNearDuplicates(docs).unionByName(
      docs.filter(col("doc_id") % 40 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val audit = Dedup.dedupPipelineAudit(corpus).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(audit("raw") == corpus.count())
    assert(audit("raw") > audit("exact") &&
      audit("exact") > audit("near_dup"))
    // the exact stage removes at least the injected exact copies
    val injectedExact = docs.filter(col("doc_id") % 40 === 0).count()
    assert(audit("raw") - audit("exact") >= injectedExact)
  }

  test("apportion: allocations sum exactly to the budget, each within " +
    "1 of its real quota") {
    import graft.operators.Mixing
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val budget = 1000L
    val got = Mixing.apportion(docs, "source", budget).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = got.map(_._2).sum
    assert(got.map(_._3).sum == budget)
    got.foreach { case (s, ns, alloc) =>
      val quota = budget.toDouble * ns / n
      assert(math.abs(alloc - quota) < 1.0,
        s"$s: alloc $alloc vs quota $quota")
    }
  }

  test("lateDataStats: flags exactly the events beyond the allowance") {
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    def ts(s: Long) = new java.sql.Timestamp((base + s * 1000000L) / 1000L)
    // user 1 arrival order: t=0, t=1000, then a straggler at t=100
    // (900 s behind the mark: late beyond 600 s by 300 s), then t=550
    // (450 s behind: within allowance)
    val e = Seq(
      (1L, ts(0), 1L, "click"), (2L, ts(1000), 1L, "click"),
      (3L, ts(100), 1L, "click"), (4L, ts(550), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Events.lateDataStats(e, 600L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(got("click") == ((3L, 1L, 300L * 1000000L)))
    assert(got("view") == ((1L, 0L, 0L)))
  }
}
