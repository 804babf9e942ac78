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

  test("classifierEval: hand-checkable confusion ratios; a class " +
    "never predicted gets precision 0 without dividing by zero") {
    import graft.operators.TextClassify
    // preds: a→a, a→a, a→b, b→b, c→b. Class c is never predicted.
    val v = Seq(("a", "a"), ("a", "a"), ("b", "a"), ("b", "b"),
      ("b", "c")).toDF("pred", "actual")
    val got = TextClassify.classifierEval(v).collect()
      .map(r => r.getAs[String]("cls") ->
        (r.getAs[Double]("precision"), r.getAs[Double]("recall"),
          r.getAs[Double]("f1"))).toMap
    assert(got("a") == ((1.0, 0.666667, 0.8)))
    assert(got("b")._1 == 0.333333 && got("b")._2 == 1.0)
    assert(got("c") == ((0.0, 0.0, 0.0)))
  }

  test("ppmiWindow: symmetric ±2 pairs from n-gram endpoints, " +
    "hand-computed PPMI") {
    import graft.operators.LangModel
    // 6 copies of "x y z": per doc, directed pairs (x,y),(y,z),(x,z)
    // + mirrors → T = 36, every n_wc = 6, every marginal = 12 →
    // PMI = ln(6·36/144) = ln(1.5) for all six ordered pairs.
    val docs = (1L to 6L).map(i => (i, "x y z")).toDF("doc_id", "text")
    val got = LangModel.ppmiWindow(docs).collect()
    assert(got.length == 6)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.forall(_.getAs[Double]("ppmi") == r6(math.log(1.5))))
    assert(got.forall(_.getAs[Long]("n_wc") == 6L))
  }

  test("psiDrift: identical distributions give PSI 0; a shifted bin " +
    "contributes positively and empty bins stay finite") {
    import graft.operators.Profile
    val prev = Seq(50L, 150L, 150L, 250L).toDF("v")
    val same = Seq(50L, 150L, 150L, 250L).toDF("v")
    val zero = Profile.psiDrift(prev, same, "v").collect()
    assert(zero.length == 10)
    assert(zero.forall(_.getAs[Double]("psi") == 0.0))
    assert(zero.forall(_.getAs[Double]("contrib") == 0.0))
    // Shift mass from bin 1 to bin 3: PSI > 0, all contribs finite
    // (bins 4..9 are empty in both — smoothing keeps them defined).
    val moved = Seq(50L, 350L, 350L, 250L).toDF("v")
    val got = Profile.psiDrift(prev, moved, "v").collect()
    val psi = got.head.getAs[Double]("psi")
    assert(psi > 0.0)
    assert(got.forall(r => !r.getAs[Double]("contrib").isNaN &&
      !r.getAs[Double]("contrib").isInfinite))
    // per-bin contributions sum (in bin order) to the reported psi
    val sum = got.sortBy(_.getAs[Int]("bin"))
      .map(_.getAs[Double]("contrib")).sum
    assert(math.abs(sum - psi) < 1e-5)
  }

  test("knBigramScore: hand-computed absolute-discount interpolation; " +
    "per-history mass conserves to 1") {
    import graft.operators.LangModel
    // Bigrams: (a b)×2, (a c)×1 → c(a·)=3, N1+(a·)=2,
    // Pcont(b)=Pcont(c)=1/2, N_types=2, D=0.75.
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = LangModel.knBigramScore(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logp"))
      .toMap
    val pB = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 2.0)
    val pC = (1.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 2.0)
    assert(math.abs(pB + pC - 1.0) < 1e-12) // discount mass conserves
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == r6(math.log(pB)))
    assert(got(1L) == got(2L))
    assert(got(3L) == r6(math.log(pC)))
    assert(got(3L) < got(1L)) // the rarer continuation scores lower
  }

  test("qualityRankBlend: per-language percent ranks with doc_id " +
    "tie-break; composite is the plain average") {
    import graft.operators.Curation
    // en: 3 docs with token counts 1 < 2 < 3 → r_len 0, 0.5, 1.
    // fr: 1 doc → all ranks 0 (n−1 = 0 → percent_rank 0).
    val docs = Seq(
      (1L, "en", "x"), (2L, "en", "x y"), (3L, "en", "x y z"),
      (4L, "fr", "le")).toDF("doc_id", "lang", "text")
    val got = Curation.qualityRankBlend(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("r_len"), r.getAs[Double]("composite"))).toMap
    assert(got(1L)._1 == 0.0 && got(2L)._1 == 0.5 && got(3L)._1 == 1.0)
    assert(got(4L) == ((0.0, 0.0)))
    // doc 3: r_len = 1, r_lex = 1 (3 distinct), r_stop: zero stopwords
    // everywhere → ties broken by doc_id DESC-order → ranks by id.
    val r3 = Curation.qualityRankBlend(docs).collect()
      .find(_.getAs[Long]("doc_id") == 3L).get
    assert(r3.getAs[Double]("composite") ==
      math.rint((r3.getAs[Double]("r_len") + r3.getAs[Double]("r_lex") +
        r3.getAs[Double]("r_stop")) / 3.0 * 1e6) / 1e6)
  }

  test("semDedupPrune: the exact duplicate loses on the id tie-break; " +
    "non-duplicates survive") {
    import graft.operators.Similarity
    // k=2 seeds = two lowest ids: v1=(1,0) and v2=(0,1). v3 is an
    // exact copy of v1 → same cell, cosine 1.0, equal cent_sim →
    // the higher id (3) prunes.
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.semDedupPrune(vecs,
        new java.math.BigDecimal("0.900000"), kCells = 2).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("pruned"))
      .toMap
    assert(got == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("oovRateCurve: hand-checkable top-V cutoffs, count-desc " +
    "token-asc tie-break") {
    import graft.operators.Curation
    // a×3, b×2, c×1 → top1 = {a}, top2 = {a, b}; 6 occurrences.
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Curation.oovRateCurve(docs, Seq(1, 2)).collect()
      .map(r => r.getAs[Int]("vocab_size") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
          r.getAs[Double]("oov_rate"))).toMap
    assert(got(1) == ((6L, 3L, 0.5)))
    assert(got(2) == ((6L, 1L, 0.166667)))
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
