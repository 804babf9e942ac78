package graft

import org.apache.spark.sql.functions._

/** r12 operators and regression anchors. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  private def trace(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("round")).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_groups"),
        r.getAs[Long]("n_new_edges"), r.getAs[Long]("new_weight")))
      .toSeq

  test("boruvkaTrace: tied-weight 4-cycle — two mutually-merging " +
    "groups pick the SAME canonical cross edge, no cycle enters") {
    // Round 1 pairs up A={1,4} (w=-10) and B={2,3} (w=-10); round 2
    // offers two TIED cross edges {1,3} and {2,4} (both w=-5). The
    // orientation-dependent (w, src, dst) key gave A min (−5,1,3)
    // but B min (−5,2,4) — both entered and closed a 4-cycle. The
    // canonical (w, least, greatest) key makes both groups pick
    // {1,3}: spanning tree of exactly 3 edges, weight −25.
    val e = Seq((1L, 4L, -10L), (2L, 3L, -10L),
      (1L, 3L, -5L), (2L, 4L, -5L)).toDF("src", "dst", "w")
    val got = trace(graft.operators.Graph.boruvkaTrace(e, rounds = 4))
    assert(got.map(_._3).sum == 3L,
      s"spanning tree must have |V|-1 = 3 edges, got $got")
    assert(got.map(_._4).sum == -25L, got.toString)
    assert(got == Seq(
      (1L, 4L, 2L, -20L), (2L, 2L, 1L, -5L),
      (3L, 1L, 0L, 0L), (4L, 1L, 0L, 0L)), got.toString)
  }

  test("boruvkaTrace: hybrid driver finish is trace-identical to the " +
    "pure distributed path on a random tied-weight graph") {
    // localGroupCap = 0 forces every round distributed; the default
    // switches to the driver emulation immediately at this size. The
    // traces must agree row for row — same picks, same partial
    // contraction, same dedup — or the twin contract is broken.
    val rnd = new scala.util.Random(42)
    val edges = (1 to 160).map { _ =>
      val a = rnd.nextInt(40).toLong; val b = rnd.nextInt(40).toLong
      (a, b, (rnd.nextInt(4) + 1).toLong) // heavy weight ties
    }.filter(e => e._1 != e._2).toDF("src", "dst", "w")
    val dist = trace(graft.operators.Graph.boruvkaTrace(
      edges, rounds = 6, localGroupCap = 0L))
    val hyb = trace(graft.operators.Graph.boruvkaTrace(
      edges, rounds = 6))
    assert(dist == hyb, s"\ndistributed: $dist\nhybrid:      $hyb")
  }

  test("boruvkaTrace: all-tied K4 stays a forest (3 edges, not 4+)") {
    // Every edge weight equal: the worst tie storm. A correct pick
    // rule yields a spanning tree; the orientation bug inflated it.
    val e = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b, 7L))
      .toDF("src", "dst", "w")
    val got = trace(graft.operators.Graph.boruvkaTrace(e, rounds = 4))
    assert(got.map(_._3).sum == 3L, got.toString)
    assert(got.map(_._4).sum == 21L, got.toString)
    assert(got.last._2 == 1L && got.last._3 == 0L, got.toString)
  }
}
