package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** r10 operators: perceptual (dHash) media near-dup. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def media(rows: Seq[(Long, String)]) =
    Multimodal.mediaTable(
      rows.map { case (id, t) => (id, t, "s") }
        .toDF("doc_id", "text", "source"))

  test("dhashSignatures: 64-bit strings; identical payloads hash " +
    "equal, a localized edit stays within a few bits") {
    val base = ("the quick brown fox jumps over the lazy dog " * 8).trim
    val sigs = Multimodal.dhashSignatures(media(Seq(
        1L -> base, 2L -> base,
        3L -> ("XYZ" + base.substring(3)),
        4L -> base.reverse)))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("sig")).toMap
    assert(sigs.values.forall(s =>
      s.length == 64 && s.forall(c => c == '0' || c == '1')))
    assert(sigs(1L) == sigs(2L), "byte-identical payloads")
    def ham(a: String, b: String): Int =
      a.zip(b).count { case (x, y) => x != y }
    assert(ham(sigs(1L), sigs(3L)) <= 8,
      s"localized edit: ${ham(sigs(1L), sigs(3L))} bits")
  }

  test("mediaNearDupPairs: planted perturbed copies are found; " +
    "unrelated docs are not paired") {
    // Genuinely distinct bodies (seeded per doc): unrelated docs must
    // land far apart in Hamming space, unlike a shared template.
    val texts: Seq[(Long, String)] = (0 until 12).map { i =>
      val rnd = new scala.util.Random(9000 + 31 * i)
      i.toLong -> (1 to 200).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val planted = texts.filter(_._1 % 4 == 0).map { case (id, t) =>
      (id + 1000L) -> ("XYZ" + t.substring(3)) }
    val got = Multimodal.mediaNearDupPairs(media(texts ++ planted))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming")))
    val pairs = got.map(t => (t._1, t._2)).toSet
    for (id <- Seq(0L, 4L, 8L))
      assert(pairs.contains((id, id + 1000L)), s"planted pair $id")
    assert(got.forall(_._3 <= 8), "verified threshold")
    // No cross-document pair: every reported pair is a planted twin.
    assert(pairs.forall { case (a, b) => b == a + 1000L },
      s"unexpected pairs: ${pairs.filterNot { case (a, b) => b == a + 1000L }}")
  }

  test("nbCalibration: bins partition the test slice and agree with " +
    "the classifier's own verdicts") {
    val docs = graft.queries.Tables.documents(spark,
      "/root/testdata/sf0.001")
    val verdicts = graft.operators.TextClassify.naiveBayes(docs)
      .collect()
    val bins = graft.operators.TextClassify.nbCalibration(docs)
      .collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == verdicts.length,
      "bins partition the test docs")
    assert(bins.map(_.getAs[Long]("n_correct")).sum ==
      verdicts.count(_.getAs[Boolean]("correct")),
      "correct counts agree with the verdict frame")
    bins.foreach { b =>
      val acc = b.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(b.getAs[Double]("mean_margin") >= 0.0,
        "margins are non-negative by construction")
    }
  }

  test("maxMatchSegment: greedy longest-prefix counts, hand-checked " +
    "on a 2-subword vocabulary") {
    import spark.implicits._
    // Corpus "aaab aaab aaab ab": occurrence-weighted top-2 substrings
    // are "aa" (6) and "ab" (4); vocab = {aa, ab, a, b}. Greedy:
    // "aaab" -> aa|ab = 2 pieces, "ab" -> 1 piece.
    val docs = Seq((1L, "aaab aaab aaab ab")).toDF("doc_id", "text")
    val got = graft.operators.Bpe.maxMatchSegment(docs, vocabK = 2)
      .collect().map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("freq"), r.getAs[Int]("n_pieces"))).toMap
    assert(got == Map("aaab" -> (3L, 2), "ab" -> (1L, 1)), s"$got")
  }

  test("AHash: bits are the cell-vs-global-average predicate " +
    "(dark half '0', bright half '1')") {
    // Data section = 32 low bytes then 32 high bytes; with nd = 64
    // each cell is exactly one byte, global average between the two.
    val text = "!" * 32 + "z" * 32
    val sig = Multimodal.ahashSignatures(media(Seq(1L -> text)))
      .collect().head.getAs[String]("sig")
    assert(sig == "0" * 32 + "1" * 32, sig)
    // Constant payload: no cell above the global average -> all '0'.
    val flat = Multimodal.ahashSignatures(media(Seq(2L -> ("m" * 64))))
      .collect().head.getAs[String]("sig")
    assert(flat == "0" * 64, flat)
  }

  test("mediaHashAgreement: planted perturbed twins are seen by BOTH " +
    "perceptual hashes") {
    val texts: Seq[(Long, String)] = (0 until 10).map { i =>
      val rnd = new scala.util.Random(7100 + 17 * i)
      i.toLong -> (1 to 200).map(_ =>
        ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val planted = texts.filter(_._1 % 2 == 0).map { case (id, t) =>
      (id + 1000L) -> ("XYZ" + t.substring(3)) }
    val got = Multimodal.mediaHashAgreement(media(texts ++ planted))
      .collect().head
    assert(got.getAs[Long]("n_both") >= 5L,
      s"planted twins in both: $got")
    // On this corpus the only near-dups are the planted twins, and a
    // localized same-length edit is within both hashes' threshold.
    assert(got.getAs[Long]("n_dhash_only") == 0L
      && got.getAs[Long]("n_ahash_only") == 0L, s"$got")
  }

  test("heapsBySource: a saturated source fits beta near 0, a " +
    "fresh-vocabulary source near 1") {
    import spark.implicits._
    val sat = (0 until 20).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta " * 4, "sat"))
    val grow = (0 until 20).map(i =>
      (100L + i, (0 until 24).map(j => s"w${i}_$j").mkString(" "),
        "grow"))
    val got = graft.operators.CorpusStats.heapsBySource(
        (sat ++ grow).toDF("doc_id", "text", "source"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_fit"), r.getAs[Double]("beta"),
          r.getAs[Double]("r2"))).toMap
    val (nSat, bSat, _) = got("sat")
    val (nGrow, bGrow, r2Grow) = got("grow")
    assert(nSat == 10 && nGrow == 10, "all buckets have data")
    assert(bSat < 0.2, s"saturated source beta $bSat")
    assert(bGrow > 0.9 && bGrow <= 1.01, s"fresh source beta $bGrow")
    assert(r2Grow > 0.99, s"fresh source fit r2 $r2Grow")
  }

  test("mediaNearDupPairs: a band bucket past maxBucketDocs is " +
    "excluded outright (no quadratic blowup on constant payloads)") {
    val clones = (0 until 120).map(i => i.toLong -> ("same payload " * 10))
    val got = Multimodal.mediaNearDupPairs(media(clones),
      maxBucketDocs = 100)
    assert(got.count() == 0, "hot buckets excluded, not exploded")
    // With the cap lifted the same corpus pairs freely.
    val uncapped = Multimodal.mediaNearDupPairs(media(clones.take(5)),
      maxBucketDocs = 100)
    assert(uncapped.count() == 5 * 4 / 2, "5 clones -> 10 pairs")
  }

  test("modularity: two clean triangles score Q exactly; an unlabeled " +
    "pendant becomes a singleton community") {
    // Triangles {1,2,3} (label 10) and {4,5,6} (label 20), plus a
    // pendant 7-1 with node 7 unlabeled. m = 7 undirected edges.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (1L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L),
      (5L, 20L), (6L, 20L)).toDF("node", "label")
    val got = graft.operators.Graph.modularity(edges, labels)
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("degree_sum"), r.getAs[Long]("within2"),
          r.getAs[Double]("contribution"))).toMap
    assert(got.keySet == Set(10L, 20L, 7L + 1000000L, -1L))
    assert(got(10L) == ((7L, 6L, math.rint((6.0 / 14 - (7.0 / 14)
      * (7.0 / 14)) * 1e6) / 1e6)))
    assert(got(20L)._1 == 6L && got(20L)._2 == 6L)
    assert(got(1000007L) == ((1L, 0L, -0.005102)))
    // Q from exact integer sums: 12/14 - (49+36+1)/196.
    val (t, sw, q) = got(-1L)
    assert(t == 14L && sw == 12L && q == 0.418367)
  }

  test("distinctiveTerms: a source-exclusive token tops its source " +
    "with positive z; shared filler does not") {
    val docs = (
      (1 to 6).map(i => (i.toLong, "common filler alpha", "A")) ++
      (7 to 12).map(i => (i.toLong, "common filler beta", "B")))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Curation.distinctiveTerms(docs, k = 1)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[String]("token"), r.getAs[Double]("z"))).toMap
    assert(got("A")._1 == "alpha" && got("A")._2 > 0)
    assert(got("B")._1 == "beta" && got("B")._2 > 0)
  }

  test("packEfficiency: exact integer padding arithmetic on a " +
    "hand-computed corpus") {
    // One shard (doc_id % 1): tokens 600, 100, 100.
    val docs = Seq(
      (0L, Seq.fill(600)("t").mkString(" "), "s"),
      (1L, Seq.fill(100)("t").mkString(" "), "s"),
      (2L, Seq.fill(100)("t").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Curation
      .packEfficiency(docs, seqLen = 512, shards = 1)
      .collect().map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_seqs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("padded_tokens"))).toMap
    assert(got("pad_per_doc") == ((4L, 800L, 1248L)))
    assert(got("concat_shard") == ((2L, 800L, 224L)))
  }

  test("viterbiSegment: hand-computed DP with every tie-break leg " +
    "(cheapest, then fewest pieces, then longest last piece)") {
    def seg(word: String, costs: Seq[(String, Long)]) = {
      val row = graft.operators.Bpe.viterbiSegment(
        Seq((word, 1L)).toDF("word", "freq"), costs, maxSub = 4)
        .collect().head
      (row.getAs[Seq[String]]("pieces"), row.getAs[Long]("path_cost"))
    }
    // Cheapest path wins outright: ab+c = 250 < a+b+c = 300 < a+bc.
    assert(seg("abc", Seq("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 150L, "bc" -> 500L, "abc" -> 10000L))
      == ((Seq("ab", "c"), 250L)))
    // Cost tie (300 = 300): fewer pieces wins.
    assert(seg("abc", Seq("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 200L)) == ((Seq("ab", "c"), 300L)))
    // Cost AND piece-count tie: longest last piece wins.
    assert(seg("ab", Seq("a" -> 100L, "b" -> 100L, "ab" -> 200L))
      == ((Seq("ab"), 200L)))
    // Coverage fallback: chars alone always segment.
    assert(seg("xyz", Seq("x" -> 5L, "y" -> 7L, "z" -> 9L))
      == ((Seq("x", "y", "z"), 21L)))
  }

  test("unigramSegment/unigramVocab: EM on a repetitive corpus learns " +
    "the repeated unit; pieces cover every word") {
    val docs = Seq(
      (1L, "abab abab abab cd", "s"),
      (2L, "abab cd cd", "s"),
      (3L, "abab abab e", "s")).toDF("doc_id", "text", "source")
    val seg = graft.operators.Bpe.unigramSegment(docs, vocabK = 8)
      .collect().map(r => r.getAs[String]("word") ->
        (r.getAs[Int]("n_pieces"), r.getAs[Long]("path_cost"))).toMap
    // The dominant word segments as ONE learned piece.
    assert(seg("abab")._1 == 1, s"abab pieces: ${seg("abab")._1}")
    assert(seg("cd")._1 == 1)
    val vocab = graft.operators.Bpe.unigramVocab(docs, vocabK = 8)
      .collect().map(r => (r.getAs[String]("piece"),
        r.getAs[Long]("cnt"), r.getAs[Long]("cost")))
    // Viterbi counts: every emitted piece count is occurrence-weighted;
    // 'abab' used 6 times, 'cd' 3, 'e' 1; unused pieces carry 0.
    val cm = vocab.map(t => t._1 -> t._2).toMap
    assert(cm("abab") == 6L && cm("cd") == 3L && cm("e") == 1L)
    assert(vocab.forall(t => t._3 > 0L), "costs positive")
  }

  test("sourceCoverageGreedy: superset source first, disjoint second, " +
    "fully-covered source never picked") {
    val docs = Seq(
      (1L, "a b c d e f", "big"),   // 4 distinct 3-gram shingles
      (2L, "a b c d e f", "copy"),  // identical -> 0 marginal after big
      (3L, "x y z w v", "other"))   // 3 disjoint shingles
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Curation.sourceCoverageGreedy(docs)
      .collect().map(r => (r.getAs[Int]("rank"),
        r.getAs[String]("source"), r.getAs[Long]("new_shingles"),
        r.getAs[Long]("cum_shingles")))
    assert(got.toSeq == Seq((1, "big", 4L, 4L), (2, "other", 3L, 7L)),
      s"got ${got.toSeq}")
  }

  test("labelNoise: a planted label flip lands in the off-diagonal " +
    "suspect cell") {
    val docs = (0L until 20L).map { i =>
      val text = if (i < 10) "aa aa aa" else "bb bb bb"
      val lang = if (i == 0) "B" else if (i < 10) "A" else "B"
      (i, text, lang)
    }.toDF("doc_id", "text", "lang")
    val got = graft.operators.TextClassify.labelNoise(docs)
      .collect().map(r => (r.getAs[String]("label"),
        r.getAs[String]("pred_class")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Boolean]("suspect"))).toMap
    // Test slice: 0 (aa, labeled B — the flip), 5 (aa, A), 10/15 (bb, B).
    assert(got(("B", "A")) == ((1L, true)), s"flip cell: $got")
    assert(got(("A", "A")) == ((1L, false)))
    assert(got(("B", "B")) == ((2L, false)))
  }

  test("splitLeakage: a near-dup pair straddling the id split is " +
    "counted as cross_split; same-side twins are not") {
    // Long shared bodies so J >= 0.7; ids chosen around mod 7:
    // (7, 8) straddle the boundary (7%7=0 heldout, 8 train);
    // (1, 2) both train; 20 is unrelated.
    val body = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (7L, body, "s"), (8L, body + " tail7", "s"),
      (1L, body.replace("tok1", "zz1"), "s"),
      (2L, body.replace("tok1", "zz1") + " tail1", "s"),
      (20L, (1 to 40).map(i => s"other$i").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Dedup.splitLeakage(docs)
      .collect().map(r => r.getAs[String]("split_class") ->
        r.getAs[Long]("n_pairs")).toMap
    assert(got("cross_split") == 1L, s"got $got")
    assert(got("within_train") == 1L)
    assert(!got.contains("within_heldout"))
  }

  test("sortedNeighborhood: adjacency in the block-local sort finds " +
    "the typo; a first-char typo falls outside every block") {
    val catalog = Seq((1L, "banana split"), (2L, "banana splitz"),
      (3L, "cherry cake")).toDF("key", "name")
    val dirty = Seq((100L, "banana splt"), (101L, "xanana split"))
      .toDF("dirty_id", "dirty_name")
    val got = graft.operators.EntityMatch.sortedNeighborhood(
        dirty, catalog, "key", "name")
      .collect().map(r => r.getAs[Long]("dirty_id") ->
        (r.getAs[Long]("matched_key"), r.getAs[Int]("lev"))).toMap
    assert(got(100L) == ((1L, 1)), s"got $got")
    assert(!got.contains(101L), "first-char typo breaks the block " +
      "(the documented recall surface — resolve()'s k2 key covers it)")
  }

  test("conductance: a clean triangle scores 0; a community leaking " +
    "half its edge-ends scores accordingly") {
    // Triangle {1,2,3} (community 10, no cut) + edge 4-5 where only 4
    // is labeled 20: community 20 has vol 1, cut 1 -> phi = 1.0;
    // singleton 5 likewise.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L))
      .toDF("node", "label")
    val got = graft.operators.Graph.conductance(edges, labels)
      .collect().map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("volume"), r.getAs[Long]("cut"),
          r.getAs[Double]("conductance"))).toMap
    assert(got(10L) == ((6L, 0L, 0.0)))
    assert(got(20L) == ((1L, 1L, 1.0)))
    assert(got(1000005L) == ((1L, 1L, 1.0)))
  }

  test("cusumDrift: a level shift alarms only after enough drift " +
    "accumulates — exact closed-form values") {
    // 8 days at 1.00 then 4 days at 5.00: mean = 2800/12 cents.
    // P'_t = 12*prefix - t*2800; min at t=8 (-12800); alarm when
    // S' > 2*2800 = 5600 -> first at day 10 (S'=6400).
    val rows = (1 to 12).map { d =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        if (d <= 8) 1.0 else 5.0)
    }
    val got = graft.query.Analytics.cusumDrift(
        rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("alarm")))
      .toMap
    assert(got("2024-01-08") == ((0L, false)), s"got $got")
    assert(got("2024-01-09") == ((3200L, false)))
    assert(got("2024-01-10") == ((6400L, true)))
    assert(got("2024-01-12") == ((12800L, true)))
  }

  test("cusumDrift: loud-head series (prefix stays positive) — the " +
    "P0 = 0 seed of Page's recursion makes the early alarm fire") {
    // 4 days at 5.00 then 8 days at 1.00: mean = 2800/12 cents, so
    // P'_t = 12*prefix - t*2800 is POSITIVE for every t (3200, 6400,
    // 9600, 12800, 11200, ... , 0). With the 0-seeded running min
    // S'_t = P'_t - min(0, min P'_j) = P'_t; alarm when S' > 5600 ->
    // first at day 2 (6400). Without the seed S'_1 is forced to 0 and
    // the day-2..4 alarms are missed.
    val rows = (1 to 12).map { d =>
      ("a", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"),
        if (d <= 4) 5.0 else 1.0)
    }
    val got = graft.query.Analytics.cusumDrift(
        rows.toDF("event_type", "ts", "value"))
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("cusum_scaled"), r.getAs[Boolean]("alarm")))
      .toMap
    assert(got("2024-01-01") == ((3200L, false)), s"got $got")
    assert(got("2024-01-02") == ((6400L, true)))
    assert(got("2024-01-04") == ((12800L, true)))
    assert(got("2024-01-05") == ((11200L, true)))
    assert(got("2024-01-12") == ((0L, false)))
  }

  test("plantedPairEval: full recall on a corpus of long docs") {
    val docs = (1L to 100L).map { i =>
      val rnd = new scala.util.Random(7000 + i)
      (i, (1 to 60).map(_ => s"w${rnd.nextInt(500)}").mkString(" "),
        "s")
    }.toDF("doc_id", "text", "source")
    val r = graft.operators.Dedup.plantedPairEval(docs).collect().head
    assert(r.getAs[Long]("n_truth") == 2L) // ids 50, 100
    assert(r.getAs[Double]("recall") == 1.0)
  }

  test("hashShardCut: all edges inside one shard cut nothing; the " +
    "fraction is exact integer arithmetic") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val one = graft.operators.Graph.hashShardCut(e, shards = 1)
      .collect().head
    assert(one.getAs[Long]("n_edges2") == 2L)
    assert(one.getAs[Long]("n_cut2") == 0L)
    assert(one.getAs[Double]("cut_fraction") == 0.0)
  }

  test("adamicAdar: hand-computed scores on a 5-node graph; existing " +
    "edges excluded; hub cap silences capped middles") {
    // 1-2, 1-3, 2-3, 2-4, 3-4, 4-5: degrees 1:2, 2:3, 3:3, 4:3, 5:1.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L)).toDF("a", "b")
    val got = graft.operators.Graph.adamicAdar(e)
      .collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"),
        r.getAs[Long]("n_common"), r.getAs[Double]("aa_score")))
    // Non-adjacent pairs: (1,4) via {2,3}, (2,5) and (3,5) via {4} —
    // all middles degree 3: w = round(1e6/ln 3) = 910239.
    assert(got.toSeq == Seq(
      (1L, 4L, 2L, 1.820478),
      (2L, 5L, 1L, 0.910239),
      (3L, 5L, 1L, 0.910239)))
    // Cap at degree 2: every wedge middle has degree 3 → no candidates.
    assert(graft.operators.Graph.adamicAdar(e, maxHubDegree = 2)
      .count() == 0L)
  }

  test("bootstrapCI: a constant metric collapses the band to the mean; " +
    "bands bracket the mean on mixed data") {
    val const = (1L to 80L).map(i => (i, "s0", 7L))
      .toDF("doc_id", "source", "x")
    val r = graft.query.Analytics.bootstrapCI(const, "source",
      col("doc_id"), col("x")).collect().head
    assert(r.getAs[Long]("n_docs") == 80L)
    assert(r.getAs[Double]("mean_metric") == 7.0)
    assert(r.getAs[Double]("ci_lo") == 7.0)
    assert(r.getAs[Double]("ci_hi") == 7.0)
    val mixed = (1L to 200L).map(i => (i, "s1", i % 50))
      .toDF("doc_id", "source", "x")
    val m = graft.query.Analytics.bootstrapCI(mixed, "source",
      col("doc_id"), col("x")).collect().head
    assert(m.getAs[Double]("ci_lo") <= m.getAs[Double]("mean_metric"))
    assert(m.getAs[Double]("ci_hi") >= m.getAs[Double]("mean_metric"))
    assert(m.getAs[Double]("ci_lo") < m.getAs[Double]("ci_hi"))
  }

  test("medianOfMeans: constant metric → mom == mean; mom lies within " +
    "the metric range and resists a planted outlier better than mean") {
    val base = (1L to 300L).map(i => (i, "s0", 10L))
    val outlier = Seq((301L, "s0", 1000000L))
    val r = graft.query.Analytics.medianOfMeans(
      (base ++ outlier).toDF("doc_id", "source", "x"), "source",
      col("doc_id"), col("x")).collect().head
    val mean = r.getAs[Double]("mean_metric")
    val mom = r.getAs[Double]("mom_metric")
    assert(r.getAs[Long]("n_docs") == 301L)
    assert(r.getAs[Long]("n_buckets") == 32L)
    assert(mean > 3000.0, "the outlier drags the plain mean")
    assert(mom < 100.0, s"mom resists the outlier: $mom")
  }

  test("lDiversity: one-band group fails both checks; a 3-band " +
    "uniform group hits entropy exactly ln 3; negative balances band " +
    "below") {
    val rows = Seq(
      // nation 1: four rows, one band → no diversity at all.
      (1, "S", 100.0), (1, "S", 200.0), (1, "S", 300.0), (1, "S", 400.0),
      // nation 2: three distinct bands, uniform → H = ln 3 exactly.
      (2, "S", 100.0), (2, "S", 1100.0), (2, "S", 2100.0),
      // nation 3: a negative balance lands in band 0 → 2 bands.
      (3, "S", -500.0), (3, "S", 500.0))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.query.Analytics.lDiversity(rows).collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_distinct_sv"),
          r.getAs[Double]("entropy"), r.getAs[Boolean]("distinct_ok"),
          r.getAs[Boolean]("entropy_ok"))).toMap
    assert(got(1) == (4L, 1L, 0.0, false, false))
    assert(got(2) == (3L, 3L, 1.098612, true, true),
      s"uniform 3-band: ${got(2)}")
    assert(got(3) == (2L, 2L, 0.693148, false, false), s"${got(3)}")
  }

  test("fellegiSunter: planted pairs are lev<=1 with one char " +
    "shorter; the trained lev1 weight separates; scores rank truth " +
    "on top") {
    val parts = graft.queries.Tables.part(spark, "/root/testdata/sf0.001")
    val cands = graft.operators.EntityMatch
      .fsCandidates(parts, "p_partkey", "p_name")
    val truth = cands.filter(col("is_match")).collect()
    assert(truth.nonEmpty)
    assert(truth.forall(r => r.getAs[Long]("a_lev1") == 1L),
      "a 1-char drop is within lev 1 of its origin")
    assert(truth.forall(r => r.getAs[Long]("a_len") == 0L),
      "the dirty string is strictly shorter than its origin")
    val w = graft.operators.EntityMatch
      .fellegiSunterWeights(parts, "p_partkey", "p_name")
      .collect().map(r => r.getAs[String]("field") ->
        (r.getAs[Double]("m"), r.getAs[Double]("u"),
          r.getAs[Double]("w_agree"))).toMap
    assert(w.keySet == Set("first3", "last3", "len", "lev1"))
    val (mLev, uLev, waLev) = w("lev1")
    assert(mLev > 0.9 && uLev < 0.5 && waLev > 0.0,
      s"lev1 separates: m=$mLev u=$uLev w=$waLev")
    val top = graft.operators.EntityMatch
      .fellegiSunterScores(parts, "p_partkey", "p_name").collect()
    assert(top.length == 20)
    assert(top.count(_.getAs[Boolean]("is_match")) >= 15,
      "truth dominates the top of the score ranking")
  }

  test("curationFunnel: each stage drops exactly the planted doc " +
    "(short, non-en, injected dup, over-cap)") {
    def good(i: Int) =
      ((1 to 28).map(j => s"word${i}x$j") ++ Seq("the", "the", "the",
        "the")).mkString(" ")
    val docs = Seq(
      (1L, good(1), "s"), (5L, good(5), "s"), (40L, good(40), "s"),
      // 2 stopwords: passes gopher (r_stop >= 2), fails the 12%
      // stopword-density language gate.
      (4L, ((1 to 30).map(j => s"word4x$j") ++ Seq("the", "the"))
        .mkString(" "), "s"),
      (2L, "tiny doc", "s")) // fails r_len
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Curation
      .curationFunnel(docs, capPerSource = 2)
      .orderBy(col("stage")).collect()
      .map(r => (r.getAs[Int]("stage"), r.getAs[String]("stage_name"),
        r.getAs[Long]("n_docs")))
    // corpus = 5 docs + 1 injected exact copy of doc 40.
    assert(got.toSeq == Seq((0, "all", 6L), (1, "quality", 5L),
      (2, "langid", 4L), (3, "exact_dedup", 3L),
      (4, "domain_cap", 2L)), got.toSeq.toString)
  }

  test("missingMass: hand-computed Good-Turing and Chao1 on tiny " +
    "sources (all-singleton source has missing mass 1)") {
    val docs = Seq((1L, "x x y", "A"), (2L, "a b c", "B"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.CorpusStats.missingMass(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_singletons"), r.getAs[Long]("n_doubletons"),
          r.getAs[Double]("missing_mass"), r.getAs[Double]("chao1")))
      .toMap
    // A: x:2 y:1 → N=3 V=2 N1=1 N2=1; chao1 = 2 + 1·0/(2·2) = 2.
    assert(got("A") == (3L, 2L, 1L, 1L, 0.333333, 2.0), s"${got("A")}")
    // B: three singletons → P0 = 1; chao1 = 3 + 3·2/(2·1) = 6.
    assert(got("B") == (3L, 3L, 3L, 0L, 1.0, 6.0), s"${got("B")}")
  }

  test("sourceKl: a corpus-like source sits near 0, a disjoint-" +
    "vocabulary source far above; KL is never negative") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w1 w2 w3 w4", "A"),
      (2L, "w1 w2 w3 w4 w1 w2 w3 w4", "B"),
      (3L, "z1 z2 z3 z4 z1 z2 z3 z4", "C"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.CorpusStats.sourceKl(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("kl"))
      .toMap
    assert(got("A") == got("B"), "identical sources score identically")
    assert(got.values.forall(_ >= 0.0), s"KL >= 0: $got")
    assert(got("C") > got("A") * 10,
      s"disjoint vocabulary stands out: $got")
  }

  test("sourceInfluence: influences sum against shares; the long " +
    "source pulls the mean up and the short one down") {
    val docs = Seq(
      (1L, "s_long", 1000L), (2L, "s_long", 1000L),
      (3L, "s_short", 100L), (4L, "s_short", 100L))
      .toDF("doc_id", "source", "n_chars")
    val got = graft.operators.CorpusStats.sourceInfluence(docs)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("mean_all"), r.getAs[Double]("mean_without"),
          r.getAs[Double]("influence"))).toMap
    // mean_all = 550; without s_long = 100 → +450; without s_short
    // = 1000 → −450.
    assert(got("s_long") == (550.0, 100.0, 450.0), s"${got("s_long")}")
    assert(got("s_short") == (550.0, 1000.0, -450.0),
      s"${got("s_short")}")
  }

  private def eventsOf(rows: Seq[(String, Int, Double)]) =
    rows.toDF("event_type", "day", "value").select(col("event_type"),
      expr("cast(date_add('1970-01-01', day) as timestamp)").as("ts"),
      col("value"))

  test("theilSen: median pairwise slope resists the outlier day the " +
    "OLS slope chases") {
    val got = graft.query.Analytics.theilSen(eventsOf(Seq(
        ("a", 19000, 1.0), ("a", 19001, 2.0), ("a", 19002, 3.0),
        ("a", 19003, 10.0)))).collect().head
    // slopes: 1,1,1,3,4,7 → median (ranks 3,4) = (1+3)/2 = 2.
    assert(got.getAs[Long]("n_pairs") == 6L)
    assert(got.getAs[Double]("sen_slope") == 2.0)
  }

  test("benford: leading digits come from exact integer cents; " +
    "digit-1 expectation is log10(2)") {
    val orders = Seq((1L, 1.00), (2L, 2.50), (3L, 0.35), (4L, 9.99),
      (5L, 19.00)).toDF("o_orderkey", "o_totalprice")
    val got = graft.query.Analytics.benford(orders).collect()
      .map(r => r.getAs[Int]("digit") ->
        (r.getAs[Long]("n_obs"), r.getAs[Double]("exp_share"))).toMap
    // cents: 100→1, 250→2, 35→3, 999→9, 1900→1.
    assert(got.view.mapValues(_._1).toMap ==
      Map(1 -> 2L, 2 -> 1L, 3 -> 1L, 9 -> 1L), s"$got")
    assert(got(1)._2 == 0.30103, s"${got(1)._2}")
  }

  test("acf: an alternating series scores lag-1 negative and lag-2 " +
    "positive with exact integer arithmetic") {
    val rows = (0 until 8).map(d =>
      ("a", 19000 + d, if (d % 2 == 0) 10.0 else 0.0))
    val got = graft.query.Analytics.acf(eventsOf(rows)).collect()
      .map(r => r.getAs[Int]("lag") ->
        (r.getAs[Long]("n_terms"), r.getAs[Double]("acf"))).toMap
    // devs (dollars): ±5 alternating; den = 8·25 = 200.
    assert(got(1) == (7L, -0.875), s"${got(1)}")
    assert(got(2) == (6L, 0.75), s"${got(2)}")
    assert(got(7) == (1L, -0.125), s"${got(7)}")
  }

  test("unimax: the tiny source keeps its full 4 epochs, the big " +
    "ones split the remaining budget uniformly") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words(5), "A"), (2L, words(100), "B"),
      (3L, words(50), "C"), (4L, words(50), "C"))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.Mixing.unimax(docs).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Boolean]("capped"), r.getAs[Double]("alloc_tokens"),
          r.getAs[Double]("epochs_used"))).toMap
    // corpus 205 → budget 102; caps 20/400/400: A capped at 20
    // (4 epochs), B and C split 82 → 41 each.
    assert(got("A") == (true, 20.0, 4.0), s"${got("A")}")
    assert(got("B") == (false, 41.0, 0.41), s"${got("B")}")
    assert(got("C") == (false, 41.0, 0.41), s"${got("C")}")
  }

  test("cuped: a perfectly predictive pre-period gives theta 1, " +
    "zero adjusted diff and full variance reduction") {
    // Every customer spends the same amount pre and post → Y = X.
    val customers = (1L to 20L).map(Tuple1(_)).toDF("c_custkey")
    val orders = (1L to 20L).flatMap { c =>
      val amt = 100.0 * c
      Seq((c * 10, c, "1995-06-01", amt), (c * 10 + 1, c, "1997-06-01", amt))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val r = graft.query.Analytics.cuped(customers, orders)
      .collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("diff_adj") == 0.0 ||
      r.getAs[Double]("diff_adj") == -0.0, s"$r")
    assert(r.getAs[Double]("var_reduction") == 1.0)
    // The raw diff is whatever the hash split makes it; the point is
    // CUPED removes it entirely when X predicts Y perfectly.
  }

  test("mannWhitney: hand-computed U with a midrank tie; clean " +
    "separation gives U = 0") {
    val rows = Seq(
      // nation 1: A={1,2}, B={3,4} → U_A = (1+2) − 3 = 0.
      (1, "BUILDING", 0.01), (1, "BUILDING", 0.02),
      (1, "MACHINERY", 0.03), (1, "MACHINERY", 0.04),
      // nation 2: A={1,2}, B={2,3} → midranks 1, 2.5 | 2.5, 4 →
      // U_A = 3.5 − 3 = 0.5.
      (2, "BUILDING", 0.01), (2, "BUILDING", 0.02),
      (2, "MACHINERY", 0.02), (2, "MACHINERY", 0.03),
      // other segments are filtered out entirely.
      (1, "AUTOMOBILE", 9.99))
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.query.Analytics.mannWhitney(rows).collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Double]("u_a"), r.getAs[Double]("z"))).toMap
    assert(got(1)._1 == 2L && got(1)._2 == 2L)
    assert(got(1)._3 == 0.0 && got(1)._4 < 0.0, s"${got(1)}")
    assert(got(2)._3 == 0.5, s"${got(2)}")
  }

  test("kruskalWallis: hand-computed H on three singleton groups; " +
    "all-tied nation emits null corrected H") {
    val rows = Seq(
      (1, "A", 0.01), (1, "B", 0.02), (1, "C", 0.03),
      (2, "A", 0.05), (2, "B", 0.05)) // all tied → corr = 0
      .toDF("c_nationkey", "c_mktsegment", "c_acctbal")
    val got = graft.query.Analytics.kruskalWallis(rows).collect()
      .map(r => r.getAs[Int]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("h"),
          Option(r.get(r.fieldIndex("h_tie_corrected"))))).toMap
    // nation 1: ranks 1,2,3 → H = 12/12·(1+4+9) − 12 = 2.
    assert(got(1)._1 == 3L && got(1)._2 == 2.0, s"${got(1)}")
    assert(got(1)._3.contains(2.0))
    assert(got(2)._3.isEmpty, s"all-tied: ${got(2)}")
  }

  test("rm3ExpansionTerms: expansion terms never repeat the query's " +
    "own terms, come from feedback docs, and cap at m per query") {
    val docs = graft.queries.Tables.documents(spark,
      "/root/testdata/sf0.001")
    val qterms = docs
      .filter(col("doc_id") % 100 === 0 && col("doc_id") < 1000000L)
      .select(col("doc_id").as("query_id"),
        explode(slice(array_distinct(split(col("text"), " ")), 1, 3))
          .as("token"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = graft.operators.Retrieval.rm3ExpansionTerms(docs)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[String]("token"),
        r.getAs[Long]("fb_tf"), r.getAs[Int]("rnk")))
    assert(got.nonEmpty)
    assert(got.forall { case (q, t, _, _) => !qterms.contains((q, t)) },
      "own query terms excluded")
    assert(got.forall(_._3 >= 1L))
    assert(got.groupBy(_._1).values.forall(_.length <= 5))
    assert(got.forall(_._4 <= 5))
  }

  test("psiTimeline: the reference period scores exactly 0; a " +
    "shifted period alerts") {
    val rows =
      (1 to 50).map(i => ("a", 19005 + i % 3, 10.0)) ++ // week 1, bin 0
      (1 to 50).map(i => ("a", 19012 + i % 3, 10.0)) ++ // week 2, same
      (1 to 50).map(i => ("a", 19019 + i % 3, 480.0))   // week 3 shifted
    val events = eventsOf(rows)
    val out = graft.operators.Profile.psiTimeline(events)
      .orderBy(col("period")).collect()
      .map(r => (r.getAs[Int]("period"), r.getAs[Long]("n_events"),
        r.getAs[Double]("psi"), r.getAs[Boolean]("alert")))
    assert(out.length == 3, out.toSeq.toString)
    assert(out(0)._3 == 0.0 && !out(0)._4, "reference period is 0")
    assert(out(1)._3 < 0.05 && !out(1)._4, s"stable period: ${out(1)}")
    assert(out(2)._3 > 0.25 && out(2)._4, s"shifted period: ${out(2)}")
  }

  test("wlColors: the refinement curve on a path graph splits ends, " +
    "middles, then saturates") {
    // Path 1-2-3-4-5: degrees {1,2} → round 0: 2 colors; round 1
    // separates the center (neighbors [2,2]) from nodes 2/4
    // ([1,2]) → 3; round 2 cannot split further → 3.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = graft.operators.Graph.wlColors(e)
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("n_colors")))
    assert(got.toSeq == Seq((0, 5L, 2L), (1, 5L, 3L), (2, 5L, 3L)),
      got.toSeq.toString)
  }

  test("funnelLatency: lag runs first-view to first-valid-purchase; " +
    "non-completers are excluded") {
    val rows = Seq(
      // user 1: view@0s, click@10s, purchase@100s → lag 100.
      (1L, "view", 0), (1L, "click", 10), (1L, "purchase", 100),
      // user 2: completes slower → lag 1000; an EARLIER purchase
      // before the click must not count.
      (2L, "purchase", 1), (2L, "view", 0), (2L, "click", 500),
      (2L, "purchase", 1000),
      // user 3: never purchases after clicking.
      (3L, "view", 0), (3L, "click", 5))
      .toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        expr("cast(timestamp '2024-01-01 00:00:00' " +
          "+ make_interval(0, 0, 0, 0, 0, 0, s) as timestamp)")
          .as("ts"))
    val r = graft.query.Analytics.funnelLatency(rows).collect().head
    assert(r.getAs[Long]("n_converted") == 2L)
    assert(r.getAs[Long]("p50_s") == 100L)
    assert(r.getAs[Long]("max_s") == 1000L)
  }

  test("funnelLatency: small-n discrete quantile convention is " +
    "ceil(p*n) — rank 10 of 10 for p99, matching DuckDB quantile_disc") {
    // 10 converted users with distinct lags 10s..100s. The two
    // discrete-quantile conventions disagree here: smallest value
    // with cume_dist >= p (rank ceil(p*n)) gives p90=90, p99=100;
    // the nearest-rank-on-(n-1) convention would give p99=90. DuckDB
    // quantile_disc empirically picks ceil(p*n) on this exact set
    // (probed: q in {.05,.15,.85,.91,.95,.99} all match), so this
    // test pins Spark to the SAME element and closes the small-n
    // cross-engine divergence surface.
    val rows = (1 to 10).flatMap { u =>
      Seq((u.toLong, "view", 0), (u.toLong, "click", 1),
        (u.toLong, "purchase", 10 * u))
    }.toDF("user_id", "event_type", "s")
      .select(col("user_id"), col("event_type"),
        expr("cast(timestamp '2024-01-01 00:00:00' " +
          "+ make_interval(0, 0, 0, 0, 0, 0, s) as timestamp)")
          .as("ts"))
    val r = graft.query.Analytics.funnelLatency(rows).collect().head
    assert(r.getAs[Long]("n_converted") == 10L)
    assert(r.getAs[Long]("p50_s") == 50L)
    assert(r.getAs[Long]("p90_s") == 90L)
    assert(r.getAs[Long]("p99_s") == 100L)
    assert(r.getAs[Long]("max_s") == 100L)
  }

  test("wlClasses: structurally identical nodes share one class " +
    "with the min node as keeper") {
    // Path 1-2-3-4-5: after 2 rounds nodes {1,5} (ends), {2,4}
    // (middles) and {3} (center) are the three classes.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val got = graft.operators.Graph.wlClasses(e).collect()
      .map(r => (r.getAs[Long]("n_nodes"), r.getAs[Long]("keeper_node")))
    assert(got.length == 3, got.toSeq.toString)
    assert(got.map(_._1).sorted.toSeq == Seq(1L, 2L, 2L))
    assert(got.contains((2L, 1L)), "ends class keeps node 1")
    assert(got.contains((2L, 2L)), "middles class keeps node 2")
    assert(got.contains((1L, 3L)), "center class is the singleton")
  }

  test("rm3Rescore: blended ranking is well-formed and the feedback " +
    "leg can promote docs the first pass missed") {
    val docs = graft.queries.Tables.documents(spark,
      "/root/testdata/sf0.001")
    val first = graft.operators.Retrieval.bm25TopK(docs).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
      .toSet
    val got = graft.operators.Retrieval.rm3Rescore(docs).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getAs[Long]("query_id")).values.foreach { rows =>
      assert(rows.length <= 5)
      assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq ==
        (1 to rows.length).toSeq, "dense ranks")
      rows.foreach(r => assert(r.getAs[Double]("rm3_score") > 0.0))
    }
    val blended = got
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")))
      .toSet
    assert(blended.diff(first).nonEmpty,
      "the expansion leg surfaces docs outside the first-pass top-k")
  }

  test("kaplanMeier: hand-computed survival on 4 orders with one " +
    "censored; censored-only times emit no row") {
    val orders = Seq(
      (1L, "P", "2020-01-01"), (2L, "P", "2020-01-01"),
      (3L, "P", "2020-01-01"), (4L, "P", "2020-01-01"))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, "2020-01-03"), (2L, "2020-01-03"), (3L, "2020-01-05"),
      (4L, "2020-01-20")) // completes after as-of → censored at t=9
      .toDF("l_orderkey", "l_shipdate")
    val got = graft.query.Analytics
      .kaplanMeier(orders, li, asOf = "2020-01-10")
      .orderBy(col("t_days")).collect()
      .map(r => (r.getAs[String]("priority"), r.getAs[Long]("t_days"),
        r.getAs[Long]("n_risk"), r.getAs[Long]("n_events"),
        r.getAs[Long]("n_censored"), r.getAs[Double]("survival")))
    // t=2: n=4, d=2 → S=0.5; t=4: n=2, d=1 → S=0.25; t=9 censored only.
    assert(got.toSeq == Seq(
      ("P", 2L, 4L, 2L, 0L, 0.5),
      ("P", 4L, 2L, 1L, 0L, 0.25)))
  }
}
