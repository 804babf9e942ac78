package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph
import graft.query.Analytics

/** r9 wave-12 operators: signal correlation, degree Gini, hub edge
  * share, join-strategy advisor.
  */
class Round9Wave12Spec extends SparkSpec {
  import spark.implicits._

  test("signalCorr: perfect linear signals score exactly ±1; a " +
    "constant signal is null, never NaN") {
    val df = (1L to 50L).map(i => (i, 3 * i + 7, 100 - i, 5L))
      .toDF("x", "y_pos", "y_neg", "y_const")
    assert(Analytics.signalCorr(df, col("x"), col("y_pos"))
      .collect()(0).getAs[Double]("r") == 1.0)
    assert(Analytics.signalCorr(df, col("x"), col("y_neg"))
      .collect()(0).getAs[Double]("r") == -1.0)
    val c = Analytics.signalCorr(df, col("x"), col("y_const"))
      .collect()(0)
    assert(c.isNullAt(c.fieldIndex("r")))
  }

  test("degreeGini: a star's degree inequality is the hand value 0.3; " +
    "a regular pairing is exactly 0") {
    // Star 1-{2,3,4,5}: degrees {4,1,1,1,1} -> S = 10 + 20 = 30,
    // G = 2*30/(5*8) - 6/5 = 0.3.
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val g = Graph.degreeGini(star).collect()(0)
    assert(g.getAs[Long]("n_nodes") == 5L)
    assert(g.getAs[Long]("n_edge_ends") == 8L)
    assert(g.getAs[Double]("gini") == 0.3)
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "b")
    assert(Graph.degreeGini(pairs).collect()(0)
      .getAs[Double]("gini") == 0.0)
  }

  test("hubShare: top-1 hub of star + detached pair touches 4 of 5 " +
    "edges") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (10L, 11L))
      .toDF("a", "b")
    val got = Graph.hubShare(e, k = 1).collect()(0)
    assert(got.getAs[Long]("n_nodes") == 7L)
    assert(got.getAs[Long]("n_edges") == 5L)
    assert(got.getAs[Long]("n_hub_edges") == 4L)
    assert(got.getAs[Double]("hub_share") == 0.8)
  }

  test("joinAdvisor: the threshold ladder picks broadcast, salt, and " +
    "shuffle on hand-built shapes") {
    val bigL = (1L to 300L).map(i => (i % 100, i)).toDF("k", "pay")
    val smallR = (1L to 50L).map(i => (i, i)).toDF("k", "pay")
    val d1 = Analytics.joinAdvisor(bigL, "k", smallR, "k",
      broadcastRows = 100).collect()(0)
    assert(d1.getAs[String]("decision") == "broadcast_right")
    // One key owns everything on both sides -> salted.
    val skewL = (1L to 200L).map(_ => (7L, 1L)).toDF("k", "pay")
    val skewR = (1L to 50L).map(_ => (7L, 1L)).toDF("k", "pay")
    val d2 = Analytics.joinAdvisor(skewL, "k", skewR, "k",
      broadcastRows = 10).collect()(0)
    assert(d2.getAs[String]("decision") == "salted_shuffle")
    assert(d2.getAs[Long]("est_join_rows") == 200L * 50L)
    // Uniform degrees, both sides above the broadcast limit.
    val uniL = (1L to 300L).map(i => (i % 100, i)).toDF("k", "pay")
    val uniR = (1L to 100L).map(i => (i, i)).toDF("k", "pay")
    val d3 = Analytics.joinAdvisor(uniL, "k", uniR, "k",
      broadcastRows = 10).collect()(0)
    assert(d3.getAs[String]("decision") == "shuffle")
  }
}
