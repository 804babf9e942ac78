package graft

import org.apache.spark.sql.functions._
import graft.operators.{Quantizer, Similarity}
import graft.queries.Tables

/** Learned-quantizer IVF: training invariants + ANN result validity. */
class QuantizerSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    .cache()

  test("fit: k centroids of the right dimension; assignment is total") {
    val cells = Quantizer.fit(emb, k = 4, iters = 2)
    val rows = cells.collect()
    assert(rows.length == 4)
    assert(rows.forall(_.getSeq[Double](1).length == 64))
    val assigned = Quantizer.assign(emb, cells)
    assert(assigned.count() == emb.count()) // every vector, exactly once
    assert(assigned.select("cell").distinct().count() <= 4)
  }

  test("learned-IVF ANN returns valid, brute-consistent results") {
    val queries = emb.filter(col("vec_id") < 5)
    val corpus = emb.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteTopK(queries, corpus, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[java.math.BigDecimal]("score")).toMap
    val ivf = Quantizer.ivfTopK(queries, corpus, 5, kCells = 4, nProbe = 2)
      .collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      // every ANN hit carries the same score brute-force computed
      brute.get(key).foreach(b =>
        assert(b.compareTo(r.getAs[java.math.BigDecimal]("score")) == 0))
      assert(r.getAs[Int]("rnk") >= 1 && r.getAs[Int]("rnk") <= 5)
    }
    // per query at most k results
    assert(ivf.groupBy(_.getAs[Long]("query_id")).values.forall(_.length <= 5))
  }
}
