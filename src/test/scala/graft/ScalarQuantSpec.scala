package graft

import org.apache.spark.sql.functions._
import graft.operators.{ScalarQuant, Similarity}

/** SQ8 contract: code range, bounded reconstruction error, recall vs
  * exact search, and determinism of the trained codebook.
  */
class ScalarQuantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.queries.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  test("codes are uint8-range; reconstruction error ≤ half a step per dim") {
    val stats = ScalarQuant.fit(emb)
    val coded = ScalarQuant.encode(emb, stats)
    val bad = coded.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") > 255)
    assert(bad.count() == 0)
    val err = ScalarQuant.decode(coded, stats)
      .crossJoin(broadcast(stats))
      .select(max(expr(
        """aggregate(
          |  zip_with(
          |    zip_with(transform(embedding, x -> cast(x as double)), dq,
          |      (x, y) -> abs(x - y)),
          |    zip_with(hi, lo, (h, l) -> (h - l) / 255.0 / 2.0 + 1e-12),
          |    (e, b) -> cast(e <= b as int)),
          |  1, (acc, ok) -> acc * ok)""".stripMargin).as("all_ok")))
      .head().getAs[Int](0)
    assert(err == 1, "every dim within half a quantization step")
  }

  test("recall@5 vs exact brute force is high on the real corpus") {
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val exact = Similarity.bruteTopK(q, c, 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val quant = ScalarQuant.bruteTopKQuantized(q, c, 5).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val recalls = exact.keys.toSeq.map { k =>
      exact(k).intersect(quant(k)).size.toDouble / exact(k).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.8, s"mean recall@5 $mean")
  }

  test("re-ranked recall >= single-stage quantized recall; exact scores") {
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val exact = Similarity.bruteTopK(q, c, 5).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
      val got = df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
      val rs = exact.keys.toSeq
        .map(k => exact(k).intersect(got(k)).size.toDouble / exact(k).size)
      rs.sum / rs.size
    }
    val single = recallOf(ScalarQuant.bruteTopKQuantized(q, c, 5))
    val reranked = recallOf(ScalarQuant.rerankedTopK(q, c, 5))
    assert(reranked >= single, s"reranked $reranked < single $single")
    // re-ranked scores are EXACT cosines: every (query, neighbor) score
    // matches the brute-force score for that pair
    val exactScores = Similarity.bruteTopK(q, c, 500).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
        -> r.getAs[java.math.BigDecimal]("score")).toMap
    ScalarQuant.rerankedTopK(q, c, 5).collect().foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(exactScores(key).compareTo(
        r.getAs[java.math.BigDecimal]("score")) == 0, s"$key")
    }
  }

  test("IVF-SQ8 tracks plain learned IVF closely (same cells, int8 scan)") {
    import graft.operators.Quantizer
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val plain = Quantizer.ivfTopK(q, c, 5, nProbe = 1).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    val sq8 = ScalarQuant.ivfSq8TopK(q, c, 5, nProbe = 1).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("neighbor_id")).toSet).toMap
    assert(sq8.keySet == plain.keySet)
    // both scan the SAME probed cell; only quantization error can flip
    // ranks near the k-boundary — overlap must stay high
    val overlaps = plain.keys.toSeq
      .map(k => plain(k).intersect(sq8(k)).size)
    assert(overlaps.sum.toDouble / (overlaps.size * 5) >= 0.8,
      s"mean overlap ${overlaps.sum.toDouble / (overlaps.size * 5)}")
  }

  test("codebook is order-independent (pure function of the corpus)") {
    val a = ScalarQuant.fit(emb).collect().head
    val b = ScalarQuant.fit(emb.orderBy(col("vec_id").desc)).collect().head
    assert(a.getSeq[Double](0) == b.getSeq[Double](0))
    assert(a.getSeq[Double](1) == b.getSeq[Double](1))
  }
}
