package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Dedup, Similarity}

/** r9 wave-9 operators: token-Gini concentration, char-class profile,
  * term burstiness, per-source duplication rate, MRR/nDCG rank eval.
  */
class Round9Wave9Spec extends SparkSpec {
  import spark.implicits._

  test("tokenGini: a uniform distribution scores 0; extreme " +
    "concentration approaches 1") {
    // 10 types, each tf = 5 → perfect equality.
    val uniform = Seq((0L, (1 to 10).flatMap(i =>
      Seq.fill(5)(s"t$i")).mkString(" "))).toDF("doc_id", "text")
    val g0 = CorpusStats.tokenGini(uniform).collect()(0)
    assert(g0.getAs[Long]("n_types") == 10L)
    assert(g0.getAs[Long]("n_tokens") == 50L)
    assert(g0.getAs[Double]("gini") == 0.0)
    // 9 types at tf = 1, one type at tf = 991: near-total concentration.
    // G = 2·S/(n·T) − (n+1)/n with S = Σ rank·x = (1+..+9) + 10·991.
    val skewed = Seq((0L, ((1 to 9).map(i => s"r$i") ++
      Seq.fill(991)("hog")).mkString(" "))).toDF("doc_id", "text")
    val g1 = CorpusStats.tokenGini(skewed).collect()(0)
    val s = (1 to 9).sum + 10L * 991L
    val expect = 2.0 * s / (10.0 * 1000.0) - 11.0 / 10.0
    assert(math.abs(g1.getAs[Double]("gini") - expect) < 1e-6)
    assert(g1.getAs[Double]("gini") > 0.88)
  }

  test("tokenGini: tied tf values share block ranks exactly " +
    "(the c(c-1)/2 term)") {
    // 3 types at tf=1, 2 types at tf=4: ascending ranks 1..3 then 4,5.
    // S = 1·(1+2+3) + 4·(4+5) = 42; n=5, T=11.
    val df = Seq((0L, ("a b c " + "d d d d e e e e").trim))
      .toDF("doc_id", "text")
    val g = CorpusStats.tokenGini(df).collect()(0)
    val expect = 2.0 * 42.0 / (5.0 * 11.0) - 6.0 / 5.0
    assert(math.abs(g.getAs[Double]("gini") - expect) < 1e-6)
  }

  test("charClassProfile: hand-counted class ratios per lang") {
    // "Ab 12." → 6 chars: 1 upper, 1 lower, 1 space, 2 digits, 1 other.
    val docs = Seq((0L, "Ab 12.", "en"), (1L, "xyz", "de"))
      .toDF("doc_id", "text", "lang")
    val got = CorpusStats.charClassProfile(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val en = got("en")
    assert(en.getAs[Long]("n_chars") == 6L)
    assert(en.getAs[Double]("space_ratio") ==
      math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(en.getAs[Double]("digit_ratio") ==
      math.rint(2.0 / 6.0 * 1e6) / 1e6)
    assert(en.getAs[Double]("upper_ratio") ==
      math.rint(1.0 / 6.0 * 1e6) / 1e6)
    assert(en.getAs[Double]("other_ratio") ==
      math.rint(1.0 / 6.0 * 1e6) / 1e6)
    val de = got("de")
    assert(de.getAs[Double]("lower_ratio") == 1.0)
    assert(de.getAs[Double]("other_ratio") == 0.0)
  }

  test("burstiness: a clumping term outranks a spread function word") {
    // "the" once in each of 10 docs (cf/df = 1); "spam" 10 times in
    // one doc (cf/df = 10).
    val docs = ((0L until 10L).map(i => (i, "the")) :+
      (10L, Seq.fill(10)("spam").mkString(" "))).toDF("doc_id", "text")
    val rows = CorpusStats.burstiness(docs, minTf = 10, k = 10).collect()
    assert(rows.map(_.getAs[String]("tok")).toSeq ==
      Seq("spam", "the"), "ordered by burstiness desc")
    assert(rows(0).getAs[Double]("burstiness") == 10.0)
    assert(rows(1).getAs[Double]("burstiness") == 1.0)
    assert(rows(0).getAs[Long]("df") == 1L)
  }

  test("dupRateBySource: only the source with injected near-dups " +
    "shows a nonzero rate") {
    // Source A docs are 50-token runs at ids divisible by 50 → each
    // injected copy (first token dropped) pairs with its original.
    // Source B docs share nothing.
    def words(seed: Int, n: Int) =
      (0 until n).map(i => s"w${seed}_$i").mkString(" ")
    val docs = Seq(
      (0L, words(0, 50), "A"), (50L, words(50, 50), "A"),
      (7L, words(7, 50), "B"), (13L, words(13, 50), "B"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.dupRateBySource(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    // A: originals 0 and 50 plus injected 1000000 and 1000050 → all 4
    // docs flagged (each original pairs with its J≈0.98 copy).
    assert(got("A").getAs[Long]("n_docs") == 4L)
    assert(got("A").getAs[Long]("n_dup_docs") == 4L)
    assert(got("A").getAs[Double]("dup_rate") == 1.0)
    assert(got("B").getAs[Long]("n_docs") == 2L)
    assert(got("B").getAs[Long]("n_dup_docs") == 0L)
    assert(got("B").getAs[Double]("dup_rate") == 0.0)
  }

  test("rankEval: identical rankings score MRR = nDCG = 1") {
    val top = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      (2L, 20L, 1), (2L, 21L, 2), (2L, 22L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val got = Similarity.rankEval(top, top, 3).collect()(0)
    assert(got.getAs[Long]("n_queries") == 2L)
    assert(got.getAs[Double]("mrr") == 1.0)
    assert(got.getAs[Double]("ndcg") == 1.0)
  }

  test("rankEval: a reversed ranking keeps MRR = 1 only via rank-1 " +
    "relevance, and nDCG drops by the hand-computed ratio") {
    val ex = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val ap = Seq((1L, 12L, 1), (1L, 11L, 2), (1L, 10L, 3))
      .toDF("query_id", "neighbor_id", "rnk")
    val got = Similarity.rankEval(ex, ap, 3).collect()(0)
    // First relevant at ap rank 1 (12 IS in exact top-3) → MRR = 1.
    assert(got.getAs[Double]("mrr") == 1.0)
    // DCG = 1·w1 + 2·w2 + 3·w3 vs IDCG = 3·w1 + 2·w2 + 1·w3 (fp).
    val w = Similarity.rankWeightsFp(3).toMap
    val dcg = 1L * w(1) + 2L * w(2) + 3L * w(3)
    val expect = math.rint(dcg.toDouble
      / Similarity.idcgFp(3).toDouble * 1e6) / 1e6
    assert(got.getAs[Double]("ndcg") == expect)
    assert(got.getAs[Double]("ndcg") < 0.9)
  }

  test("rankEval: a query with zero relevant results contributes 0 " +
    "to both means") {
    val ex = Seq((1L, 10L, 1), (2L, 20L, 1))
      .toDF("query_id", "neighbor_id", "rnk")
    val ap = Seq((1L, 10L, 1), (2L, 99L, 1))
      .toDF("query_id", "neighbor_id", "rnk")
    val got = Similarity.rankEval(ex, ap, 1).collect()(0)
    assert(got.getAs[Long]("n_queries") == 2L)
    assert(got.getAs[Double]("mrr") == 0.5)
    assert(got.getAs[Double]("ndcg") == 0.5)
  }
}
