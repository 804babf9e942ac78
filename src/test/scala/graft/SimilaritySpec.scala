package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Cosine correctness and the brute/IVF/LSH consistency contracts. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb(id: Long, label: Int, v: Float*) =
    (id, v.toArray, label)

  private val vecs = Seq(
    emb(0L, 0, 1f, 0f), // query
    emb(10L, 0, 1f, 0f), // identical direction
    emb(11L, 0, 0f, 1f), // orthogonal
    emb(12L, 1, -1f, 0f), // opposite, other cell
    emb(13L, 0, 1f, 1f) // 45 degrees
  ).toDF("vec_id", "embedding", "label")

  private val queries = vecs.filter(col("vec_id") < 10)
  private val corpus = vecs.filter(col("vec_id") >= 10)

  test("brute-force top-k: exact cosine ordering with id tie-breaks") {
    val rows = Similarity.bruteTopK(queries, corpus, 4).collect()
      .map(r => (r.getAs[Int]("rnk"), r.getAs[Long]("neighbor_id"),
        r.getAs[java.math.BigDecimal]("score")))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((1, 10L), (2, 13L), (3, 11L), (4, 12L)))
    assert(rows(0)._3.compareTo(bd("1.000000")) == 0)
    assert(rows(1)._3.compareTo(bd("0.707107")) == 0)
    assert(rows(2)._3.compareTo(bd("0.000000")) == 0)
    assert(rows(3)._3.compareTo(bd("-1.000000")) == 0)
  }

  test("IVF top-k equals brute-force restricted to the query's cell") {
    val ivf = Similarity.ivfTopK(queries, corpus, 4).collect()
      .map(r => r.getAs[Long]("neighbor_id")).toSet
    // label-0 corpus members only; vec 12 (label 1) must be absent
    assert(ivf == Set(10L, 11L, 13L))
  }

  test("LSH top-k returns a subset of brute-force results (same scores)") {
    val brute = Similarity.bruteTopK(queries, corpus, 10).collect()
      .map(r => (r.getAs[Long]("neighbor_id"),
        r.getAs[java.math.BigDecimal]("score"))).toMap
    val lsh = Similarity.lshTopK(queries, corpus, 10, dim = 2).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val n = r.getAs[Long]("neighbor_id")
      assert(brute(n).compareTo(r.getAs[java.math.BigDecimal]("score")) == 0)
    }
  }

  test("multi-probe LSH recall >= single-probe recall on real vectors") {
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 10)
    val c = e.filter(col("vec_id") >= 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .toSet
    val brute = pairs(Similarity.bruteTopK(q, c, 5))
    val single = pairs(Similarity.lshTopK(q, c, 5))
    val multi = pairs(Similarity.lshMultiProbeTopK(q, c, 5))
    val rs = (single intersect brute).size.toDouble / brute.size
    val rm = (multi intersect brute).size.toDouble / brute.size
    assert(rm >= rs, s"multi-probe recall $rm < single-probe $rs")
    // and the probe expansion really found more candidates
    assert(multi.size >= single.size)
    // multi-probe scores are still true cosines (subset of brute scores
    // per pair is already covered by the shared score() home)
  }

  test("mutual knn keeps only reciprocal pairs, once each, a < b") {
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val k = 5
    val pairs = Similarity.mutualTopK(e, k).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Int]("rnk"), r.getAs[Int]("rnk_back")))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, r1, r2) =>
      assert(a < b && r1 <= k && r2 <= k)
    }
    assert(pairs.map(p => (p._1, p._2)).distinct.length == pairs.length)
    // reciprocity is strictly stronger than one-sided membership: the
    // pair set is a subset of the one-direction ranking's pair set
    val w = Similarity.planeWeights(8, 64)
    val oneSided = Similarity.lshTopK(e, e, k + 1).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .filter(p => p._1 != p._2).toSet
    pairs.foreach { case (a, b, _, _) =>
      assert(oneSided.contains((a, b)) || oneSided.contains((b, a)))
    }
  }

  test("bounded-heap TopK aggregator == window-rank brute force") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rnk"),
        r.getAs[java.math.BigDecimal]("score").toPlainString)
    val window = Similarity.bruteTopK(queries, corpus, 3).collect().map(key)
    val heap = graft.operators.TopK.bruteTopKAgg(queries, corpus, 3)
      .collect().map(key)
    assert(heap.toSet == window.toSet)
  }

  test("native codegen cosine == declarative zip_with/aggregate cosine") {
    import graft.queries.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val pairs = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
      .crossJoin(e.select(col("vec_id").as("b_id"), col("embedding").as("eb")))
    val diff = pairs.select(
      Similarity.cosine(col("ea"), col("eb")).as("d"),
      Similarity.cosineNative(col("ea"), col("eb")).as("n"))
      .filter(col("d") =!= col("n")) // bit-identical, not approximately
    assert(diff.count() == 0)
    // also callable from SQL via the extension registration
    val sqlVal = spark.sql(
      "SELECT graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head.getDouble(0)
    assert(sqlVal == 1.0)
  }

  test("bucketed near-dup == exact all-pairs on the planted-dup corpus") {
    import graft.queries.Tables
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val corpus = e.select(col("vec_id"), col("embedding")).unionByName(
      e.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val tau = new java.math.BigDecimal("0.900000")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[java.math.BigDecimal]("score").toPlainString)
    val exact = Similarity.embeddingNearDupPairs(corpus, tau)
      .collect().map(key).toSet
    val bucketed = Similarity.embeddingNearDupPairsBucketed(corpus, tau)
      .collect().map(key).toSet
    // LSH candidates are a subset by construction; on this corpus the
    // qualifying pairs are exact copies (identical sign-signatures), so
    // recall is exactly 1.0 and the two forms coincide.
    assert(bucketed == exact)
    assert(exact.nonEmpty)
    // and the plan really is the bucketed equi-join, not a nested loop
    val plan = Similarity.embeddingNearDupPairsBucketed(corpus, tau)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("native lsh bucket == declarative per-plane fold, incl. from SQL") {
    import graft.queries.Tables
    val w = Similarity.planeWeights(8, 64)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val diff = e.select(
      Similarity.lshBucket(col("embedding"), w).as("native"),
      Similarity.lshBucketDeclarative(col("embedding"), w).as("decl"))
      .filter(col("native") =!= col("decl"))
    assert(diff.count() == 0)
  }

  test("deterministic hyperplanes: same seed, same weights") {
    val a = Similarity.planeWeights(4, 8)
    val b = Similarity.planeWeights(4, 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(w => w >= -1.0 && w <= 1.0))
  }

  // --- semantic-dedup scale contract (VERDICT r4 #3) -------------------

  private def realVecs =
    graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding"))

  test("semantic dedup at kCells >> 8 stays cell-bounded and precision-1") {
    val tau = bd("0.850000")
    val pairs = Similarity.semanticDedupPairs(realVecs, tau, kCells = 50)
    // plan: never a cartesian; the pair join is a cell equi-join (the
    // only BNLJs are the k-bounded broadcast-centroid assignments)
    val plan = pairs.queryExecution.sparkPlan
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty)
    assert(plan.toString.contains("cell"))
    // precision 1 vs the exact all-pairs anchor: same key, same score
    val exact = Similarity.embeddingNearDupPairs(realVecs, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(2)).toMap
    val got = pairs.collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDecimal(3))
    got.foreach { case (k, s) =>
      assert(exact.contains(k) && exact(k).compareTo(s) == 0, s"$k")
    }
  }

  test("maxCellSize guard excludes oversized cells from pairing") {
    val tau = bd("0.000000") // every within-cell pair qualifies
    val all = Similarity.semanticDedupPairs(realVecs, tau, kCells = 8)
    val sizes = all.select(col("cell"), col("vec_a")).groupBy(col("cell"))
      .agg(countDistinct(col("vec_a")).as("n")) // lower bound on |cell|
    val cap = 40
    val guarded = Similarity
      .semanticDedupPairs(realVecs, tau, kCells = 8, maxCellSize = cap)
      .select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSet
    val oversized = sizes.filter(col("n") > cap)
      .collect().map(_.getInt(0)).toSet
    assert(oversized.nonEmpty, "test corpus should have a hot cell at k=8")
    assert(guarded.intersect(oversized).isEmpty)
  }

  test("two-level split: subset of unsplit pairs, exact dups survive splits") {
    val tau = bd("0.900000")
    // dup-injected corpus: every vec_id % 25 == 0 has an exact copy
    val corpus = realVecs.unionByName(
      realVecs.filter(col("vec_id") % 25 === 0)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val plain = Similarity.semanticDedupPairs(corpus, tau)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val twoLevel = Similarity
      .semanticDedupPairsTwoLevel(corpus, tau, maxCellSize = 50)
    val got = twoLevel.collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    // splitting only removes straddlers — never invents pairs
    assert(got.subsetOf(plain))
    // exact copies share every hyperplane sign → all survive the split
    val injected = realVecs.filter(col("vec_id") % 25 === 0)
      .collect().map(_.getAs[Long]("vec_id"))
      .map(id => (id, id + 10000L)).toSet
    injected.foreach(p => assert(got.contains(p), s"lost exact dup $p"))
    // and with 520 vecs in 8 cells, pigeonhole says a split really fired
    assert(got != plain || injected == plain,
      "cap=50 must actually split at least one cell")
    assert(twoLevel.queryExecution.sparkPlan.collect {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }.isEmpty)
  }

  test("auto-sized kCells: linear-cost contract holds and pairs stay exact") {
    val tau = bd("0.850000")
    // n=500, target 32 → k=16 cells, cap 256 — every surviving pair must
    // still be a true near-dup (precision 1; recall is the ANN trade)
    val auto = Similarity
      .semanticDedupPairsAuto(realVecs, tau, targetCellSize = 32)
    val exact = Similarity.embeddingNearDupPairs(realVecs, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = auto.collect().map(r => (r.getLong(1), r.getLong(2)))
    got.foreach(k => assert(exact.contains(k), s"$k"))
  }
}
