package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Dedup, Profile}

/** r9 wave-2 operators: shard-boundary stitch recovery, domain
  * balancing cap, one-pass key-column profiler.
  */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  test("stitchCandidates: recovers the adjacency an overlap chunker " +
    "leaves behind, and nothing else") {
    val overlap = (1 to 8).map(i => s"o$i").mkString(" ")
    val fragA = (1 to 10).map(i => s"a$i").mkString(" ") + " " + overlap
    val fragB = overlap + " " + (1 to 10).map(i => s"b$i").mkString(" ")
    val fragC = (1 to 18).map(i => s"c$i").mkString(" ")
    val frags = Seq((1L, fragA), (2L, fragB), (3L, fragC))
      .toDF("frag_id", "text")
    val got = Dedup.stitchCandidates(frags, 8).collect()
      .map(r => (r.getAs[Long]("frag_a"), r.getAs[Long]("frag_b"),
        r.getAs[String]("gram")))
    assert(got.toSeq == Seq((1L, 2L, overlap)))
  }

  test("stitchCandidates: fragments shorter than k never pair") {
    val short = (1 to 5).map(i => s"s$i").mkString(" ")
    val frags = Seq((1L, short), (2L, short)).toDF("frag_id", "text")
    assert(Dedup.stitchCandidates(frags, 8).count() == 0)
  }

  test("stitchCandidates over chunkOverlap: every full adjacent chunk " +
    "pair of one doc is recovered") {
    // 80 distinct tokens -> starts 0,24,48,72; chunks 0..2 are full
    // 32-token windows, chunk 3 is the 8-token tail. Adjacent pairs
    // (0,1), (1,2), (2,3) all share exactly the 8-token overlap.
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val frags = Curation.chunkOverlap(Seq((7L, text)).toDF("doc_id", "text"))
      .select((col("doc_id") * 10000 + col("chunk_id")).as("frag_id"),
        col("chunk_text").as("text"))
    val got = Dedup.stitchCandidates(frags, 8).collect()
      .map(r => (r.getAs[Long]("frag_a"), r.getAs[Long]("frag_b"))).toSet
    assert(got == Set((70000L, 70001L), (70001L, 70002L),
      (70002L, 70003L)))
  }

  test("domainCap: keeps at most N per source, best score first, " +
    "deterministic tiebreak") {
    // src x: 3 docs with distinct-token scores 5, 3, 3; cap 2 keeps
    // the 5 and the LOWER doc_id of the tied 3s. src y: 1 doc, kept.
    val docs = Seq(
      (1L, "x", (1 to 5).map("t" + _).mkString(" ")),
      (2L, "x", "t1 t2 t3"),
      (3L, "x", "u1 u2 u3"),
      (4L, "y", "v1 v2")).toDF("doc_id", "source", "text")
    val got = Curation.domainCap(docs, 2).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Int]("score"), r.getAs[Int]("domain_rank"))).toSet
    assert(got == Set((1L, "x", 5, 1), (2L, "x", 3, 2), (4L, "y", 2, 1)))
  }

  test("selfRepeatSpans: localizes a within-doc repeated block, " +
    "ignores cross-doc-only repeats") {
    val block = "r1 r2 r3"
    // doc 1 repeats the block at positions 0 and 6 (gap 6 > k=3 →
    // two separate spans); doc 2 contains it once (no self-repeat).
    val doc1 = s"$block x1 x2 x3 $block"
    val doc2 = s"$block y1 y2 y3 y4 y5"
    val got = Dedup.selfRepeatSpans(
        Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text"), 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_tokens"), r.getAs[String]("span_text"))).toSet
    assert(got == Set((1L, 0, 3, block), (1L, 6, 3, block)))
  }

  test("selfRepeatSpans: a run of one repeated token merges into one " +
    "maximal span") {
    val doc = "a a a a a a b c d e f g"  // 6×'a': windows 0..3 repeat
    val got = Dedup.selfRepeatSpans(
        Seq((1L, doc)).toDF("doc_id", "text"), 3).collect()
      .map(r => (r.getAs[Int]("span_start"), r.getAs[Int]("span_tokens"),
        r.getAs[String]("span_text"))).toSet
    assert(got == Set((0, 6, "a a a a a a")))
  }

  test("keywordTags: unigram and phrase hits counted per topic") {
    val docs = Seq(
      (1L, "scan the table then scan the stream"),
      (2L, "hash join beats sort merge here"),
      (3L, "nothing matches in this one")).toDF("doc_id", "text")
    val got = Curation.keywordTags(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("topic"),
        r.getAs[Long]("n_hits"))).toSet
    // doc 1: scan×2 (engine), table (storage), stream (streaming);
    // doc 2: join + "hash join" + "sort merge" = 3 engine hits plus
    // the bare "merge"/"sort" unigrams are NOT in the dictionary.
    assert(got == Set((1L, "engine", 2L), (1L, "storage", 1L),
      (1L, "streaming", 1L), (2L, "engine", 3L)))
  }

  test("fkOrphanAudit: holed dimension counts orphans exactly, clean " +
    "dimension counts zero") {
    val fact = Seq((1L, 10L), (2L, 20L), (3L, 10L), (4L, 30L))
      .toDF("fk_a", "fk_b")
    val dimA = Seq(1L, 2L).toDF("pk")            // 3, 4 orphaned
    val dimB = Seq(10L, 20L, 30L).toDF("pk")     // clean
    val got = Profile.fkOrphanAudit(fact,
        Seq(("fk_a", dimA, "pk"), ("fk_b", dimB, "pk"))).collect()
      .map(r => r.getAs[String]("fk") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphans"))).toMap
    assert(got("fk_a") == ((4L, 2L)))
    assert(got("fk_b") == ((4L, 0L)))
  }

  test("exciseSubstrings: keep-one rule — the canonical (min doc_id) " +
    "holder keeps its copy, every other witness is cut") {
    val shared = (1 to 10).map(i => s"s$i").mkString(" ")
    val tailA = (1 to 4).map(i => s"a$i").mkString(" ")
    val tailB = (1 to 4).map(i => s"b$i").mkString(" ")
    val docs = Seq((5L, s"$shared $tailA"), (9L, s"$shared $tailB"))
      .toDF("doc_id", "text")
    val got = Dedup.exciseSubstrings(docs, 8).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_removed"))).toMap
    // doc 5 is the min holder: untouched. doc 9 loses the 10 shared
    // tokens and keeps its own tail.
    assert(got(5L) == ((s"$shared $tailA", 0L)))
    assert(got(9L) == ((tailB, 10L)))
  }

  test("dedupMethodAgreement: identical near-dups agree; both-only " +
    "cells are non-negative and consistent") {
    val doc1 = (1 to 30).map(i => s"t$i").mkString(" ")
    val doc2 = (2 to 30).map(i => s"t$i").mkString(" ")
    val doc3 = (1 to 30).map(i => s"u$i").mkString(" ")
    val corpus = Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
    val r = Dedup.dedupMethodAgreement(corpus).collect().head
    val (both, jOnly, sOnly) = (r.getAs[Long]("n_both"),
      r.getAs[Long]("n_jaccard_only"), r.getAs[Long]("n_simhash_only"))
    // the (1,2) near-dup pair is found by BOTH detectors; nothing
    // links doc 3 to either.
    assert(both == 1L && jOnly == 0L && sOnly == 0L)
  }

  test("annRecall: perfect approximate path scores 1.0, a missing " +
    "neighbor costs exactly 1/k") {
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 99L))
      .toDF("query_id", "neighbor_id")
    val got = graft.operators.Similarity.annRecall(exact, approx)
      .collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
          r.getAs[Double]("recall"))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 1L, 0.5)))
  }

  test("jaccardThresholdCurve: counts are monotone non-increasing in " +
    "tau and match the direct per-threshold counts") {
    val doc1 = (1 to 20).map(i => s"t$i").mkString(" ")
    val doc2 = (2 to 20).map(i => s"t$i").mkString(" ")  // J = 17/18
    val doc3 = (1 to 12).map(i => s"t$i").mkString(" ") +
      " " + (1 to 8).map(i => s"z$i").mkString(" ")      // mid-J vs doc1
    val corpus = Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
    val curve = Dedup.jaccardThresholdCurve(corpus).collect()
      .map(r => r.getAs[Int]("tau_tenths") -> r.getAs[Long]("n_pairs"))
      .toMap
    val counts = (5 to 9).map(t => curve.getOrElse(t, 0L))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // direct check against exactJaccardPairs at each threshold
    for (t <- 5 to 9) {
      val direct = Dedup.exactJaccardPairs(corpus, num = t, den = 10)
        .count()
      assert(curve.getOrElse(t, 0L) == direct, s"tau=$t")
    }
  }

  test("marginBitext: a planted translation pair wins with a high " +
    "margin; hub-free noise stays near margin 1") {
    // B side: b=101 is (almost) a's twin; the rest are noise. The
    // planted pair must be the best-margin match for a=2.
    def v(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val twin = v(42)
    val near = twin.clone(); near(0) = near(0) + 0.05f
    val a = Seq((2L, twin), (4L, v(1)), (6L, v(2))).toDF("vec_id", "embedding")
    val b = Seq((101L, near), (103L, v(3)), (105L, v(4)), (107L, v(5)))
      .toDF("vec_id", "embedding")
    val got = graft.operators.Similarity.marginBitext(a, b, k = 3)
      .collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("margin"))).toMap
    assert(got(2L)._1 == 101L)
    assert(got(2L)._2 > 1.2) // near-clone towers over its neighborhood
  }

  test("keyColumnProfile: exact per-column null/distinct/bounds from " +
    "one aggregate") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, null), (3L, 30L))
      .toDF("a", "b")
    val got = Profile.keyColumnProfile(df, Seq("a", "b")).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[Long]("min_val"),
          r.getAs[Long]("max_val"))).toMap
    assert(got("a") == ((4L, 0L, 3L, 1L, 3L)))
    assert(got("b") == ((4L, 1L, 2L, 10L, 30L)))
  }
}
