package graft

import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Graph, Mixing, Profile}

/** r9 wave-7 operators: HITS, seeded label propagation, two-sample KS
  * drift, DoReMi-style domain reweighting, BPE tokenizer fertility.
  */
class Round9Wave7Spec extends SparkSpec {
  import spark.implicits._

  test("hits: on a directed bipartite graph the most-pointed-to node " +
    "is the top authority and the widest pointer the top hub") {
    // Customers 1,2,3 → suppliers 10,11: 10 receives from all three,
    // 11 only from 1. Node 1 points at both (widest hub).
    val e = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 11L))
      .toDF("src", "dst")
    val got = Graph.hits(e).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Double]("hub"), r.getAs[Double]("auth"))).toMap
    // Sinks have hub 0; sources have auth 0 (no in-edges).
    assert(got(10L)._1 == 0.0 && got(1L)._2 == 0.0)
    assert(got(10L)._2 > got(11L)._2, "most-cited supplier tops auth")
    assert(got(1L)._1 > got(2L)._1, "two-edge customer tops hub")
    // L1 normalization: each score family sums to 1 (up to rounding).
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-4)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("labelPropagation: majority vote colors the graph, seeds stay " +
    "pinned, ties break to the smaller label") {
    // Path 1-2-3-4 (symmetrized) with seeds 1→label 7, 4→label 3.
    // Round 1 colors each middle node from its seed side (2→7, 3→3);
    // from round 2 on, each middle node sees a {7,3} TIE every round
    // and the deterministic min-label break hands both to 3 — the
    // boundary dynamics the tie rule implies, frozen here on purpose.
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L)).toDF("src", "dst")
    val seeds = Seq((1L, 7L), (4L, 3L)).toDF("node", "label")
    val r1 = Graph.labelPropagation(e, seeds, rounds = 1).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("label"))).toMap
    assert(r1(2L) == 7L && r1(3L) == 3L, "round 1: each seed side")
    val got = Graph.labelPropagation(e, seeds, rounds = 3).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("label"))).toMap
    assert(got(1L) == 7L && got(4L) == 3L, "seeds pinned")
    assert(got(2L) == 3L && got(3L) == 3L, "tie rounds -> min label")
    // Tie case: node 5 between two equal seed camps takes the SMALLER
    // label.
    val e2 = Seq((1L, 5L), (4L, 5L)).toDF("src", "dst")
    val got2 = Graph.labelPropagation(e2, seeds, rounds = 1).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("label"))).toMap
    assert(got2(5L) == 3L, "equal-count tie -> min label")
  }

  test("ksDrift: identical samples give 0; disjoint supports give 1") {
    val same = (1 to 100).flatMap(i =>
      Seq((i.toDouble, "a"), (i.toDouble, "b")))
      .toDF("v", "g")
    val r0 = Profile.ksDrift(same, "v", "g", "a", "b").collect()(0)
    assert(r0.getAs[Double]("ks_stat") == 0.0)
    assert(r0.getAs[Long]("n_a") == 100L && r0.getAs[Long]("n_b") == 100L)
    // a in [1,100], b in [201,300]: CDFs never overlap -> D = 1.
    val apart = ((1 to 100).map(i => (i.toDouble, "a")) ++
      (201 to 300).map(i => (i.toDouble, "b"))).toDF("v", "g")
    val r1 = Profile.ksDrift(apart, "v", "g", "a", "b").collect()(0)
    assert(r1.getAs[Double]("ks_stat") == 1.0)
  }

  test("ksDrift: hand-checkable max gap on a tiny shifted sample") {
    // a = {1,2,3,4}, b = {3,4,5,6}: at v=2, F_a=1/2, F_b=0 -> D=0.5.
    val df = (Seq(1, 2, 3, 4).map(v => (v.toDouble, "a")) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, "b"))).toDF("v", "g")
    val r = Profile.ksDrift(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Double]("ks_stat") == 0.5)
  }

  test("doremiWeights: equal losses keep the proportional baseline; " +
    "a high-loss domain gains weight") {
    // Two domains with identical vocabulary profile -> equal loss ->
    // lnorm 0 everywhere -> every update is a no-op.
    val flat = Seq((0L, "x y z", "s0"), (1L, "x y z", "s1"))
      .toDF("doc_id", "text", "source")
    val g0 = Mixing.doremiWeights(flat, "source").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("w_base"), r.getAs[Double]("w_final"))).toMap
    g0.values.foreach { case (b, f) => assert(b == f) }
    // s1 uses rare tokens (high cross-entropy under the corpus
    // unigram LM) -> its final weight must exceed its baseline.
    val skew = Seq(
      (0L, "x x x x x x", "s0"), (1L, "x x x x x x", "s0"),
      (2L, "q r t u v w", "s1")).toDF("doc_id", "text", "source")
    val g1 = Mixing.doremiWeights(skew, "source").collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("w_base"), r.getAs[Double]("w_final"))).toMap
    assert(g1("s1")._2 > g1("s1")._1, "high-loss domain upweighted")
    assert(g1("s0")._2 < g1("s0")._1, "low-loss domain downweighted")
    // Weights stay a distribution.
    assert(math.abs(g1.values.map(_._2).sum - 1.0) < 1e-4)
  }

  test("segmentedWords + fertilityByLang: known merges give exact " +
    "per-language token-per-word ratios") {
    val docs = Seq(
      (0L, "abab ab", "en", "s"), (1L, "cd cd", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    // Merges: (a,b) then (ab,ab). "abab" -> [abab]; "ab" -> [ab];
    // "cd" -> [c,d] (untouched).
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val segs = Bpe.segmentedWords(docs, merges).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Int]("n_syms")).toMap
    assert(segs == Map("abab" -> 1, "ab" -> 1, "cd" -> 2))
    val fert = Bpe.fertilityByLang(docs, merges).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_words"), r.getAs[Long]("n_subwords"),
          r.getAs[Double]("fertility"))).toMap
    assert(fert("en") == ((2L, 2L, 1.0)))
    assert(fert("de") == ((2L, 4L, 2.0)))
  }
}
