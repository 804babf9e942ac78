package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, Itemsets, Layout, Sketch}
import graft.queries.Tables

/** Round-8 second-wave invariants: zone-map partition/bounding and
  * pruning transparency, CMS F₂ one-sidedness, k-core convergence and
  * minimum-degree contract.
  */
class Round8OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def zonedLineitem = Tables.lineitem(spark, sf).select(
    col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
    Layout.zorder2(col("l_partkey"), col("l_suppkey")).as("zval"))

  test("zoneMap: zones partition the rows and min/max actually bound") {
    val l = zonedLineitem
    val total = l.count()
    val zm = Layout.zoneMap(l, col("zval"), Seq("l_partkey", "l_suppkey"))
      .collect()
    assert(zm.map(_.getLong(1)).sum == total)
    assert(zm.forall(r => r.getLong(2) <= r.getLong(3) &&
      r.getLong(4) <= r.getLong(5)))
    // rows really fall in their zone's box: re-derive each row's zone
    // and check it against the map's bounds for its partkey.
    val byZone = zm.map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val mx = l.agg(max(col("zval"))).collect()(0).getLong(0)
    val shift = math.max(0, (64 - java.lang.Long.numberOfLeadingZeros(mx)) - 8)
    l.select(col("zval"), col("l_partkey")).collect().foreach { r =>
      val (lo, hi) = byZone(r.getLong(0) >> shift)
      assert(r.getLong(1) >= lo && r.getLong(1) <= hi)
    }
  }

  test("zonePruneSummary: pruning is output-transparent and zorder " +
    "scans no more than natural for a 2-d box") {
    val l = zonedLineitem
    val nat = Layout.zonePruneSummary(l, "natural", col("l_orderkey"),
      "l_partkey", 500, 599, "l_suppkey", 4, 5).collect()(0)
    val zo = Layout.zonePruneSummary(l, "zorder", col("zval"),
      "l_partkey", 500, 599, "l_suppkey", 4, 5).collect()(0)
    // same exact matches regardless of layout; scanned always covers them
    assert(nat.getLong(5) == zo.getLong(5))
    assert(nat.getLong(4) >= nat.getLong(5) && zo.getLong(4) >= zo.getLong(5))
    // candidates never exceed zones; totals equal the table
    assert(nat.getLong(2) <= nat.getLong(1) && zo.getLong(2) <= zo.getLong(1))
    assert(nat.getLong(3) == zo.getLong(3))
    // the z-curve is the layout that prunes for a 2-d predicate
    assert(zo.getLong(4) <= nat.getLong(4))
  }

  test("cmsSelfJoinSize: estimate is one-sided above exact F2 and the " +
    "exact leg matches a direct computation") {
    val r = Sketch.cmsSelfJoinSize(Tables.lineitem(spark, sf), "l_partkey")
      .collect()(0)
    val (nRows, nDistinct, exact, est) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nRows == Tables.lineitem(spark, sf).count())
    val direct = Tables.lineitem(spark, sf).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n")).agg(sum(col("n") * col("n")))
      .collect()(0).getLong(0)
    assert(exact == direct)
    assert(est >= exact, s"CMS F2 $est below exact $exact")
    assert(nDistinct <= nRows)
  }

  test("kCore: every surviving node has degree >= k and the peel has " +
    "converged (one extra round is a no-op)") {
    val p = Itemsets.pairEdges(Tables.lineitem(spark, sf),
      "l_orderkey", "l_partkey")
    val e = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
    val core = Graph.kCore(e, 3).collect()
    assert(core.forall(_.getLong(1) >= 3))
    val more = Graph.kCore(e, 3, rounds = 13).collect()
    assert(core.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      more.map(r => r.getLong(0) -> r.getLong(1)).toMap)
  }

  test("bpe trainMerges: learns the expected table and the greedy fold " +
    "re-merges overlapping runs (xxxx -> xx xx -> xxxx)") {
    import spark.implicits._
    val docs = Seq((1L, "xxxx xxxx ab")).toDF("doc_id", "text")
    val got = graft.operators.Bpe.trainMerges(docs, rounds = 3)
      .orderBy(col("round")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1, "x", "x", 6L), (2, "xx", "xx", 2L),
      (3, "a", "b", 1L)))
  }

  test("bpe trainMerges: rounds past pair exhaustion emit nothing " +
    "instead of failing") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = graft.operators.Bpe.trainMerges(docs, rounds = 4).collect()
    assert(got.map(r => (r.getString(1), r.getString(2))).toSeq ==
      Seq(("a", "b")))
  }

  test("bpe applyMerges: segments with the learned table (odd run keeps " +
    "its tail symbol)") {
    import spark.implicits._
    val docs = Seq((1L, "xxx ab xxx")).toDF("doc_id", "text")
    val merges = Seq(("x", "x"), ("a", "b"))
    val got = graft.operators.Bpe.applyMerges(docs, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // "xxx" folds to [xx, x] under (x,x); "ab" to [ab]
    assert(got == Map("xx" -> 2L, "x" -> 2L, "ab" -> 1L))
  }

  test("personalizedPageRank: matches the hand-simulated fixed point on " +
    "a planted chain; a component unreachable from the seeds holds " +
    "exactly zero mass") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (5L, 6L), (6L, 5L)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(e, Seq(1L).toDF("node"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.23355, 2L -> 0.501636, 3L -> 0.103126,
      4L -> 0.161688, 5L -> 0.0, 6L -> 0.0))
  }

  test("kmvDifferenceEstimate: below-k the retained sample counts the " +
    "exact difference; the exact leg matches a direct anti-join") {
    import spark.implicits._
    val a = (1L to 40L).map(i => Tuple1(i)).toDF("v")
    val b = (31L to 50L).map(i => Tuple1(i)).toDF("v")
    val r = Sketch.kmvDifferenceEstimate(a, b, "v").collect()(0)
    // |A ∪ B| = 50 ≤ k = 64 → theta is the union max, the sample is
    // everything, so n_only = |A \ B| = 30 and exact agrees.
    assert(r.getLong(1) == 30L)
    assert(r.getLong(3) == 30L)
  }

  test("byteEntropy: pinned values — constant payload 0, two equiprobable" +
    " bytes 1, all 256 values 8; empty payload 0") {
    import graft.expressions.ByteEntropy
    assert(ByteEntropy.compute(Array.fill[Byte](100)(7)) == 0.0)
    assert(ByteEntropy.compute(Array[Byte](1, 2)) == 1.0)
    // 256 summed float terms carry ~1e-14 accumulation drift — the
    // contract is cross-engine bit-identity, not algebraic exactness.
    assert(math.abs(ByteEntropy.compute(
      (0 until 256).map(_.toByte).toArray) - 8.0) < 1e-12)
    assert(ByteEntropy.compute(Array.emptyByteArray) == 0.0)
  }

  test("byteEntropy: SQL expression path equals the static helper over " +
    "real payloads") {
    val media = graft.operators.Multimodal.mediaTable(
      Tables.documents(spark, sf))
    val rows = media.select(col("payload"),
      expr("graft_byte_entropy(payload)")).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) ==
        graft.expressions.ByteEntropy.compute(r.getAs[Array[Byte]](0)))
    }
  }

  test("pca topComponentPower: recovers a planted dominant axis as a " +
    "unit vector (sign-stable under negated rows)") {
    import spark.implicits._
    val rows = Seq(
      Seq(0f, 0f, 3f, 0f), Seq(0f, 0f, -2f, 0f), Seq(0f, 0f, 5f, 0f),
      Seq(0.1f, 0f, 4f, 0f), Seq(0f, -0.1f, -3f, 0f))
    val emb = rows.map(Tuple1(_)).toDF("embedding")
    val w = graft.operators.Pca.topComponentPower(emb, dims = 4)
      .orderBy(col("dim")).collect().map(_.getDouble(1))
    assert(math.abs(w(2)) > 0.999)
    // the output is rounded to 6 dp, so the norm check inherits ~1e-6
    assert(math.abs(w.map(x => x * x).sum - 1.0) < 1e-5)
  }

  test("pca abttResiduals: Pythagoras holds — proj^2 + r_norm^2 equals " +
    "each vector's squared norm (w is unit)") {
    import spark.implicits._
    val rows = Seq(
      (1L, Seq(1f, 2f, 3f, 4f)), (2L, Seq(0f, -2f, 5f, 1f)),
      (3L, Seq(2f, 2f, -4f, 0f)))
    val emb = rows.toDF("vec_id", "embedding")
    val got = graft.operators.Pca.abttResiduals(emb, dims = 4).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { case (id, x) =>
      val n2 = x.map(v => v.toDouble * v.toDouble).sum
      val (p, rn) = got(id)
      assert(math.abs(p * p + rn * rn - n2) < 1e-3,
        s"vec $id: $p^2 + $rn^2 != $n2")
    }
  }

  test("kCore: a planted clique survives peeling that removes a chain") {
    import spark.implicits._
    // 4-clique (1..4) plus a pendant chain 5-6-7: k=3 keeps exactly
    // the clique, every clique node at degree 3.
    val cl = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val chain = Seq((4L, 5L), (5L, 4L), (5L, 6L), (6L, 5L),
      (6L, 7L), (7L, 6L))
    val e = (cl ++ chain).toDF("src", "dst")
    val got = Graph.kCore(e, 3, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("bfsHops: multi-source min distance, hop cutoff, unreachable " +
    "absent") {
    import spark.implicits._
    // Path 1→2→3→4→5 with a shortcut 7→3; seeds {1, 7}. Node 3 is
    // 2 hops from seed 1 but 1 hop from seed 7 — the MIN must win.
    // Disconnected 9→10 never appears; 5 is 3 hops (inside maxHops=3).
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 3L),
      (9L, 10L)).toDF("src", "dst")
    val seeds = Seq(1L, 7L).toDF("node")
    val got = Graph.bfsHops(e, seeds, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 0, 7L -> 0, 2L -> 1, 3L -> 1, 4L -> 2,
      5L -> 3))
  }

  test("sourceOverlap: identical sources hit jaccard 1, disjoint pairs " +
    "are absent, totals are per-source distinct fingerprints") {
    import spark.implicits._
    val txt = "a b c d e f g h i j k l"
    val other = "q r s t u v w x y z zz qq"
    val docs = Seq(
      (1L, txt, "sA"), (2L, txt, "sB"), (3L, other, "sC"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(("sA", "sB")))
    val (shared, na, nb, j) = got(("sA", "sB"))
    assert(shared == na && na == nb && j == 1.0)
  }

  test("rangePlan: partitions cover all rows with ordered disjoint " +
    "bounds and near-ideal balance on uniform data") {
    import spark.implicits._
    val df = (1 to 1000).map(i => i.toDouble).toDF("v")
    val plan = Layout.rangePlan(df, "v", parts = 4)
      .orderBy(col("pid")).collect()
    assert(plan.map(_.getLong(1)).sum == 1000L)
    assert(plan.length <= 4 && plan.map(_.getInt(0)).forall(p =>
      p >= 1 && p <= 4))
    // bounds are ordered and disjoint across consecutive partitions
    plan.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) < b.getLong(2))
      case _ =>
    }
    // HDR bins are ≤3% relative error; uniform data stays near 1.0
    assert(plan.forall(r => r.getDouble(4) > 0.5 && r.getDouble(4) < 2.0))
  }

  test("rangePlan: heavy ties produce a deliberately-fat partition, " +
    "never lost rows") {
    import spark.implicits._
    val df = (Seq.fill(97)(50.0) ++ Seq(1.0, 2.0, 999.0)).toDF("v")
    val plan = Layout.rangePlan(df, "v", parts = 4).collect()
    assert(plan.map(_.getLong(1)).sum == 100L)
    assert(plan.exists(_.getLong(1) >= 97L))
  }
}
