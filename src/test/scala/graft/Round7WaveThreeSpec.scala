package graft

import org.apache.spark.sql.functions._
import graft.operators.{Cdc, Curation, Layout}
import graft.queries.Tables

/** Round-7 third-wave invariants: CDC diff classification and delta
  * minimality, compaction bin-pack bounds and partition locality,
  * dataset-card profile arithmetic.
  */
class Round7WaveThreeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("snapshotDiff: classifies added/removed/changed, drops unchanged") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val curr = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Cdc.snapshotDiff(prev, curr, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff: identical snapshots emit an empty delta") {
    val docs = Tables.documents(spark, sf)
    assert(Cdc.snapshotDiff(docs, docs, "doc_id", "text").count() == 0)
  }

  test("compactionBins: bins are contiguous from 0 and partition-local; " +
    "every bin except the last exceeds the target once closed") {
    val target = 50000L
    val files = Tables.documents(spark, sf)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))
    val got = Layout.compactionBins(files, Seq("source"), "lang", "bytes",
      target)
    val perSource = got.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3),
        r.getInt(4)))
      .groupBy(_._1)
    assert(perSource.nonEmpty)
    perSource.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2)
      // bins start at 0 and never decrease along the file order
      assert(ordered.head._4 == 0)
      assert(ordered.sliding(2).forall {
        case Array(a, b) => b._4 >= a._4; case _ => true
      })
      // a bin closes only once the running total has crossed its
      // threshold: cum_before of a bin-b file is >= b * target
      ordered.zipWithIndex.foreach { case ((_, _, _, bin), i) =>
        val cumBefore = ordered.take(i).map(_._3).sum
        assert(bin == (cumBefore / target).toInt)
      }
    }
  }

  test("bitmapDistinct: exact vs countDistinct; out-of-domain key fails") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val got = graft.operators.Sketch.bitmapDistinctByGroup(
      li, "l_returnflag", "l_suppkey", 65535)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
    val ex = intercept[Exception] {
      graft.operators.Sketch.bitmapDistinctByGroup(
        Seq(("g", 70000L)).toDF("g", "k"), "g", "k", 65535).collect()
    }
    assert(ex.getMessage != null)
  }

  test("bitmapDistinctDict: exact on a sparse re-strided key domain " +
    "that overflows the raw form") {
    import spark.implicits._
    // The r8 sf1 failure mode: keys shifted by 10M strides span ~90M
    // but hold few distinct values — the raw fixed-domain form throws,
    // the dictionary form sizes the bitmap by cardinality and stays
    // exact.
    val li = Tables.lineitem(spark, sf)
      .withColumn("k_shift",
        col("l_suppkey") + (col("l_orderkey") % 10) * 10000000L)
    val got = graft.operators.Sketch.bitmapDistinctDict(
      li, "l_returnflag", "k_shift")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("k_shift")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want && got.nonEmpty)
    assertThrows[Exception] {
      graft.operators.Sketch.bitmapDistinctByGroup(
        li, "l_returnflag", "k_shift", 65535).collect()
    }
  }

  test("bloom filteredJoinAuto: key-count-sized m, same rows as plain") {
    val orders = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    val auto = graft.operators.Bloom.filteredJoinAuto(
      orders, "o_custkey", dim, "c_custkey")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    assert(auto.sameElements(plain) && plain.nonEmpty)
  }

  test("bloom filteredJoin: bit-identical to the plain join, even with " +
    "an undersized (high-FP) filter") {
    val orders = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .filter(col("c_acctbal") > 9000).select(col("c_custkey"))
    val plain = orders.join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
    for (mBits <- Seq(1 << 16, 256)) { // 256 bits → dense FP regime
      val got = graft.operators.Bloom.filteredJoin(
        orders, "o_custkey", dim, "c_custkey", mBits, 3)
        .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted
      assert(got.sameElements(plain), s"mBits=$mBits diverged")
    }
    assert(plain.nonEmpty)
  }

  test("rrfFusion: fused score is the exact sum of the two rank terms; " +
    "docs in both lists outrank equal single-list ranks") {
    val docs = Tables.documents(spark, sf)
    val lex = graft.operators.Retrieval.bm25TopK(docs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val dense = graft.operators.Similarity.hashedTextTopK(
      docs.filter(col("doc_id") % 100 === 0), docs, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val fused = graft.operators.Retrieval.rrfFusion(docs).collect()
    assert(fused.nonEmpty)
    fused.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      val want = lex.get(key).map(rb => 1.0 / (60 + rb)).getOrElse(0.0) +
        dense.get(key).map(rd => 1.0 / (60 + rd)).getOrElse(0.0)
      val got = r.getDouble(3)
      assert(math.abs(got - BigDecimal(want)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"$key: $got vs $want")
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 5)
    }
  }

  test("clusterRepresentatives: exactly one rep per canonical, and the " +
    "rep carries the cluster-max score") {
    val corpus = graft.operators.Dedup.withNearDuplicates(
      Tables.documents(spark, sf))
    val got = graft.operators.Dedup.clusterRepresentatives(
      corpus, graft.operators.Dedup.minhashVerifiedPairs(corpus))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getBoolean(3)))
    assert(got.length == corpus.count())
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.count(_._4) == 1, s"cluster $c rep count")
      val rep = members.find(_._4).get
      assert(rep._3 == members.map(_._3).max, s"cluster $c rep not best")
    }
    // the injected near-dup pairs must actually cluster (non-trivial)
    assert(byCluster.exists(_._2.length > 1))
  }

  test("transitionMatrix: per-row probabilities sum to 1 and counts " +
    "match total steps") {
    val e = graft.streaming.Events.typed(Tables.events(spark, sf))
    val got = graft.query.Analytics.transitionMatrix(e).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getString(0)).foreach { case (from, rows) =>
      val pSum = rows.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$from p-sum $pSum")
    }
    val totalSteps = got.map(_.getLong(2)).sum
    val nUsers = e.select(col("user_id")).distinct().count()
    assert(totalSteps == e.count() - nUsers) // each user: n-1 steps
  }

  test("mergeIntervals: islands are disjoint, ordered, and cover every " +
    "input interval") {
    import spark.implicits._
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 21L, 30L), // [0,20], [21,30]
      (1L, 30L, 40L),                               // touching → merges
      (2L, 0L, 1L), (2L, 100L, 101L)
    ).toDF("user_id", "start_us", "end_us")
    val got = graft.query.Analytics
      .mergeIntervals(iv, "user_id", "start_us", "end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      (1L, 1L, 0L, 20L, 2L), (1L, 2L, 21L, 40L, 2L),
      (2L, 1L, 0L, 1L, 1L), (2L, 2L, 100L, 101L, 1L)))
  }

  test("corpusProfile: metrics match a hand-computed frame") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z", "en", "src0"), // dup of doc 3 (cross-source)
      (2L, "x y", "de", "src0"),
      (3L, "x y z", "en", "src1"),
      (4L, "unique text", "en", "src1")
    ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Curation.corpusProfile(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got("src0") == ((2L, 5L, 2L, 1L))) // 3+2 tokens, en+de, doc1 dup
    assert(got("src1") == ((2L, 5L, 1L, 1L))) // 3+2 tokens, en, doc3 dup
  }
}
