package graft

import org.apache.spark.sql.functions._
import graft.operators.{AggState, Dedup, Layout, Similarity}
import graft.queries.Tables

/** Round-7 operator invariants: prefix-filter pair-identity, matryoshka
  * recall, z-order interleave and locality, agg-state slicing algebra,
  * novelty hand-check.
  */
class Round7OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("prefix-filtered pairs == exact Jaccard pairs, with a smaller index") {
    val corpus = Dedup.withNearDuplicates(Tables.documents(spark, sf))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val exact = pairs(Dedup.exactJaccardPairs(corpus))
    val prefix = pairs(Dedup.prefixFilteredPairs(corpus))
    assert(prefix == exact,
      s"prefix filter changed the pair set: ${prefix.size} vs ${exact.size}")
    assert(exact.nonEmpty)
    // The catalog's maxDocFreq=50 cap is a measured no-op at every
    // oracle scale (max word-trigram df: 7 at sf0.01, 26 at sf0.1) —
    // pair-identical here too, so the uncapped oracle stays exact.
    val capped = pairs(Dedup.prefixFilteredPairs(corpus,
      maxDocFreq = Some(50)))
    assert(capped == exact,
      s"df<=50 cap changed pairs at test scale: ${capped.size} vs ${exact.size}")
  }

  test("prefix-filter hot-shingle cap: exact values, recall loss only " +
    "for pairs sharing nothing rarer than the cap") {
    import spark.implicits._
    // 12 clones of one boilerplate text (every shingle df=12) + 2
    // near-dup docs with unique vocabulary (df<=2). With cap=10 the
    // clone pairs are only discoverable through hot shingles and drop
    // out; the rare pair survives with bit-identical counts.
    val boiler = "alpha beta gamma delta epsilon zeta eta theta"
    val rareA = "red orange yellow green blue indigo violet ultraviolet"
    val rareB = "orange yellow green blue indigo violet ultraviolet"
    val corpus = ((1L to 12L).map(i => (i, boiler)) ++
      Seq((100L, rareA), (101L, rareB))).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSet
    val uncapped = pairs(Dedup.prefixFilteredPairs(corpus))
    val capped = pairs(Dedup.prefixFilteredPairs(corpus,
      maxDocFreq = Some(10)))
    assert(capped.subsetOf(uncapped), "cap invented pairs")
    val rarePair = uncapped.filter(p => p._1 == 100L && p._2 == 101L)
    assert(rarePair.size == 1 && capped == rarePair,
      s"cap should keep exactly the rare-vocabulary pair: $capped")
    assert(uncapped.exists(p => p._1 < 100L),
      "test premise: uncapped must see the boilerplate clone pairs")
  }

  test("matryoshka rerank: exact final scores, recall >= prefix-only search") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteTopK(q, c, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(3)).toMap
    // prefix-only search = matryoshka whose "shortlist" IS the answer
    val prefixOnly = Similarity.bruteTopK(
      q.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
      c.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding")),
      5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mat = Similarity.matryoshkaTopK(q, c, 5).collect()
    val matSet = mat.map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(s: Set[(Long, Long)]) = (s & exact.keySet).size.toDouble
    assert(recall(matSet) >= recall(prefixOnly),
      "full-dim rerank lost recall vs the prefix-only ranking")
    // every emitted score is the exact full-dim cosine
    mat.filter(r => exact.contains((r.getLong(0), r.getLong(1))))
      .foreach { r =>
        assert(r.getDecimal(3) == exact((r.getLong(0), r.getLong(1))),
          s"score drifted for ${(r.getLong(0), r.getLong(1))}")
      }
  }

  test("zorder2 interleaves bits exactly and clusters both keys") {
    val rows = spark.range(1).select(
      Layout.zorder2(lit(3L), lit(5L)).as("z35"),
      Layout.zorder2(lit(0L), lit(1L)).as("z01"),
      Layout.zorder2(lit(0xFFFFFFFFL), lit(0L)).as("zfmax"))
      .collect().head
    // a=3 (bits 0,1 → even positions 0,2), b=5 (bits 0,2 → odd 1,5)
    assert(rows.getLong(0) == ((1L << 0) | (1L << 2) | (1L << 1) | (1L << 5)))
    assert(rows.getLong(1) == 2L) // b bit0 → position 1
    assert(rows.getLong(2) == 0x5555555555555555L) // all even positions
    // locality: sorting a 16x16 grid by zval, consecutive rows move by
    // <= 1 in one key far more often than under a single-key sort's
    // worst axis — the row-group clustering property.
    val grid = spark.range(256).select(
      (col("id") % 16).as("a"), expr("id DIV 16").as("b"))
      .select(col("a"), col("b"), Layout.zorder2(col("a"), col("b")).as("z"))
      .orderBy(col("z")).collect()
    val jumps = grid.sliding(2).count { w =>
      math.abs(w(1).getLong(0) - w(0).getLong(0)) +
        math.abs(w(1).getLong(1) - w(0).getLong(1)) > 3
    }
    assert(jumps < 32, s"z-order walk jumped far $jumps times")
  }

  test("agg state: any slicing merges to the identical decimal state") {
    val o = Tables.orders(spark, sf).select(col("o_custkey"),
      col("o_totalprice").cast(Tables.Money).as("price"))
    def state(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        r.getLong(0) -> (r.getDecimal(1), r.getLong(2))).toMap
    val direct = state(AggState.partialState(o, Seq("o_custkey"), "price"))
    val threeWay = state(AggState.mergeStates(Seq("o_custkey"),
      AggState.partialState(o.filter(col("o_custkey") % 3 === 0),
        Seq("o_custkey"), "price"),
      AggState.partialState(o.filter(col("o_custkey") % 3 === 1),
        Seq("o_custkey"), "price"),
      AggState.partialState(o.filter(col("o_custkey") % 3 === 2),
        Seq("o_custkey"), "price")))
    assert(threeWay.keySet == direct.keySet)
    threeWay.foreach { case (k, (s, n)) =>
      assert(direct(k)._1.compareTo(s) == 0 && direct(k)._2 == n,
        s"custkey $k state drifted")
    }
    // chained merge (day -> month -> year) preserves the schema contract
    val chained = AggState.mergeStates(Seq("o_custkey"),
      AggState.mergeStates(Seq("o_custkey"),
        AggState.partialState(o.limit(50), Seq("o_custkey"), "price"),
        AggState.partialState(o.limit(0), Seq("o_custkey"), "price")))
    assert(chained.columns.toSeq == Seq("o_custkey", "psum", "pn"))
  }

  test("rendezvous: adding a shard moves keys ONLY to the new shard") {
    val docs = Tables.documents(spark, sf)
    val a16 = docs.select(col("doc_id"),
        graft.operators.Shard.rendezvousShard(col("doc_id"), 16).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a17 = docs.select(col("doc_id"),
        graft.operators.Shard.rendezvousShard(col("doc_id"), 17).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a16.values.toSet.subsetOf((0 until 16).toSet))
    val moved = a16.keys.filter(k => a16(k) != a17(k)).toSeq
    moved.foreach { k =>
      assert(a17(k) == 16, s"doc $k moved to ${a17(k)}, not the new shard")
    }
    // expectation ~n/17; allow wide slack but forbid mod-style remaps
    assert(moved.size < a16.size / 4,
      s"${moved.size}/${a16.size} moved — not minimal-movement")
  }

  test("kmv intersection estimate lands within 35% of the exact overlap") {
    val ev = graft.queries.Tables.events(spark, sf)
    val row = graft.operators.Sketch.kmvIntersectEstimate(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "view"), "user_id").collect().head
    val (est, exact) = (row.getDouble(2), row.getLong(3))
    assert(exact > 0)
    assert(math.abs(est - exact) <= 0.35 * exact, s"est $est vs exact $exact")
  }

  test("novelty: hand-computed on a tiny corpus with one shared shingle") {
    import scala.jdk.CollectionConverters._
    val rows = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "x y z w"))
    val docs = spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r._1, r._2)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    val out = Dedup.noveltyScores(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc1 3-shingles: "a b c","b c d"; doc2: "a b c","b c e"; doc3:
    // "x y z","y z w". "a b c" has df=2 -> not novel.
    assert(out(1L) == (2L, 1L))
    assert(out(2L) == (2L, 1L))
    assert(out(3L) == (2L, 2L))
  }
}
