package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** Driver-finish / distributed parity for the contracting iterative
  * family (VERDICT r12 #1): every operator that grew a cap-gated
  * driver finish in r13 must produce a result set IDENTICAL to its
  * distributed loop. `localEdgeCap = 0` disables the hybrid, so each
  * test runs the same input down both paths and compares sorted rows.
  * Graphs are seeded-random with tied structures (multiple components,
  * chains, cliques, isolated self-loops) to exercise the tie-break
  * and node-set edge cases, not just the happy path.
  */
class HybridFinishSpec extends SparkSpec {
  import spark.implicits._

  private def sorted(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toSeq.sortBy(_.mkString("|"))

  private def assertSame(hybrid: DataFrame, dist: DataFrame): Unit = {
    assert(hybrid.schema.map(f => (f.name, f.dataType)) ===
      dist.schema.map(f => (f.name, f.dataType)))
    assert(sorted(hybrid) === sorted(dist))
  }

  /** Seeded random pair graph: chains + a clique + isolated nodes. */
  private def randomPairs(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val chains = (1 to n).map { _ =>
      val a = rnd.nextInt(200).toLong; val b = rnd.nextInt(200).toLong
      (a, b)
    }
    // A 5-clique far from the random block, plus one self-loop pair.
    val clique = for (i <- 900L to 904L; j <- 900L to 904L if i < j)
      yield (i, j)
    (chains ++ clique ++ Seq((777L, 777L)))
      .toDF("doc_a", "doc_b")
  }

  test("duplicateClusters: driver finish == distributed fixpoint") {
    val pairs = randomPairs(13, 300)
    assertSame(
      Dedup.duplicateClusters(pairs),
      Dedup.duplicateClusters(pairs, localEdgeCap = 0L))
  }

  test("duplicateClusters keeps self-loop-only nodes on both paths") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    for (cap <- Seq(0L, 1000L)) {
      val out = Dedup.duplicateClusters(pairs, localEdgeCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(out === Seq((1L, 1L), (2L, 1L), (5L, 5L)), s"cap=$cap")
    }
  }

  test("connectedComponentsStar: driver finish == distributed fixpoint") {
    val pairs = randomPairs(29, 300)
    assertSame(
      Dedup.connectedComponentsStar(pairs),
      Dedup.connectedComponentsStar(pairs, localEdgeCap = 0L))
  }

  test("connectedComponentsStar drops self-loop-only nodes on both paths") {
    val pairs = Seq((5L, 5L), (1L, 2L)).toDF("doc_a", "doc_b")
    for (cap <- Seq(0L, 1000L)) {
      val out = Dedup.connectedComponentsStar(pairs, localEdgeCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(out === Seq((1L, 1L), (2L, 1L)), s"cap=$cap")
    }
  }

  /** Symmetrized random graph for the kCore/labelProp tests. */
  private def randomEdges(seed: Int, n: Int): DataFrame = {
    val p = randomPairs(seed, n)
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    p.unionByName(p.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  test("kCore: driver finish == distributed peel (converged)") {
    val e = randomEdges(41, 400)
    assertSame(Graph.kCore(e, 3), Graph.kCore(e, 3, localEdgeCap = 0L))
  }

  test("kCore: budget-capped prefix matches round for round") {
    val e = randomEdges(53, 400)
    for (budget <- 1 to 3)
      assertSame(Graph.kCore(e, 3, rounds = budget),
        Graph.kCore(e, 3, rounds = budget, localEdgeCap = 0L))
  }

  test("labelPropagation: driver finish == distributed rounds") {
    val e = randomEdges(67, 400)
    val seeds = Seq((0L, 10L), (3L, 20L), (900L, 30L), (77L, 20L))
      .toDF("node", "label")
    for (rounds <- 1 to 3)
      assertSame(
        Graph.labelPropagation(e, seeds, rounds),
        Graph.labelPropagation(e, seeds, rounds, localEdgeCap = 0L))
  }

  test("labelPropagation tie-break (max count, then min label) on both paths") {
    // Node 9 hears label 1 once (from 1) and label 2 once (from 2):
    // tie on count → min label 1. Node 8 hears label 2 twice → 2.
    val e = Seq((1L, 9L), (2L, 9L), (2L, 8L), (3L, 8L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 1L), (2L, 2L), (3L, 2L)).toDF("node", "label")
    for (cap <- Seq(0L, 1000L)) {
      val out = Graph.labelPropagation(e, seeds, rounds = 1,
          localEdgeCap = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(out === Seq((1L, 1L), (2L, 2L), (3L, 2L), (8L, 2L), (9L, 1L)),
        s"cap=$cap")
    }
  }

  test("boruvkaTrace: primitive-array driver finish keeps the trace") {
    // A weighted graph with tied weights across two components; the
    // lowered default cap + gate-retry path must reproduce the fully
    // distributed trace exactly (the r12 canonical-key guarantee).
    val rnd = new scala.util.Random(71)
    val e = (1 to 200).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong,
        (rnd.nextInt(5) + 1).toLong)
    }.filter(t => t._1 != t._2).toDF("src", "dst", "w")
    assertSame(
      Graph.boruvkaTrace(e, rounds = 6),
      Graph.boruvkaTrace(e, rounds = 6, localGroupCap = 0L))
  }
}
