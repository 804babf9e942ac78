package graft

import org.apache.spark.sql.functions._
import graft.operators.{Graph, TextClassify}

/** r9 wave-5 operators: edge-weighted PageRank, trained Naive Bayes
  * text classifier.
  */
class Round9Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("weightedPageRank: rank follows edge weight — the heavy " +
    "neighbor outranks the light one") {
    // Star: hub 1 ↔ {2, 3}; 1→2 carries 9× the weight of 1→3. Nodes
    // 2 and 3 have identical structure except incoming weight share.
    val edges = Seq(
      (1L, 2L, 9L), (2L, 1L, 9L),
      (1L, 3L, 1L), (3L, 1L, 1L)).toDF("src", "dst", "weight")
    val pr = Graph.weightedPageRank(edges).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("pr")).toMap
    assert(pr(2L) > pr(3L))
    // Symmetrized graph with no dangling nodes conserves rank mass.
    assert(math.abs(pr.values.sum - 1.0) < 1e-4)
  }

  test("weightedPageRank: uniform weights reproduce plain pageRank " +
    "exactly") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L),
      (1L, 3L)).toDF("src", "dst")
    val ew = e.withColumn("weight", lit(1L))
    val plain = Graph.pageRank(e).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("pr")).toMap
    val weighted = Graph.weightedPageRank(ew).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("pr")).toMap
    assert(plain == weighted)
  }

  test("annRecallCurve: perfect agreement gives recall 1.0 at every k; " +
    "a truncated approx list degrades exactly the larger cutoffs") {
    import graft.operators.Similarity
    val mk = (rows: Seq[(Long, Long, Int)]) => rows
      .toDF("query_id", "neighbor_id", "rnk")
    // Exact top-3 for one query: n1 > n2 > n3.
    val exact = mk(Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3)))
    val same = mk(Seq((1L, 11L, 1), (1L, 12L, 2), (1L, 13L, 3)))
    val got = Similarity.annRecallCurve(exact, same, Seq(1, 3)).collect()
      .map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("recall"))).toMap
    assert(got(1) == ((1L, 1.0)) && got(3) == ((3L, 1.0)))
    // Approx finds the neighborhood but misorders rank 1: item 11 at
    // rank 3, item 13 at rank 1 → recall@1 = 0, recall@3 = 1.
    val misordered = mk(Seq((1L, 13L, 1), (1L, 12L, 2), (1L, 11L, 3)))
    val got2 = Similarity.annRecallCurve(exact, misordered, Seq(1, 3))
      .collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Double]("recall")).toMap
    assert(got2(1) == 0.0 && got2(3) == 1.0)
  }

  test("naiveBayes: held-out docs classify to the class whose token " +
    "distribution they match") {
    // Two classes with disjoint vocabularies; doc_ids ≡ 0 (mod 5) are
    // the held-out test slice.
    val docs = Seq(
      (1L, "en", "the cat sat on the mat"),
      (2L, "en", "the dog ran to the cat"),
      (3L, "fr", "le chat est sur le tapis"),
      (4L, "fr", "le chien court vers le chat"),
      (5L, "en", "the cat and the dog"),   // test: en tokens
      (10L, "fr", "le chat et le chien")   // test: fr tokens
    ).toDF("doc_id", "lang", "text")
    val got = TextClassify.naiveBayes(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("pred"), r.getAs[Boolean]("correct"))).toMap
    assert(got.keySet == Set(5L, 10L))
    assert(got(5L) == ("en", true))
    assert(got(10L) == ("fr", true))
  }

  test("naiveBayes: unseen tokens take the smoothing floor — a doc of " +
    "out-of-vocabulary tokens falls back to the prior") {
    // 3 'en' train docs vs 1 'fr', with EQUAL per-class token totals
    // (6 each) so every unseen token's add-one floor 1/(n_c+V) is
    // identical across classes — the decision reduces to the
    // doc-count prior, and 'en' (3 of 4 train docs) wins.
    val docs = Seq(
      (1L, "en", "alpha beta"), (2L, "en", "beta gamma"),
      (3L, "en", "gamma alpha"),
      (4L, "fr", "delta epsilon zeta eta theta iota"),
      (5L, "xx", "zz1 zz2 zz3")  // test; actual label irrelevant
    ).toDF("doc_id", "lang", "text")
    val got = TextClassify.naiveBayes(docs).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("pred") == "en")
    assert(!r.getAs[Boolean]("correct"))
  }
}
