package graft

import org.apache.spark.sql.functions._
import graft.functions.TextOps
import graft.operators.Dedup

/** Shingles, Jaccard, MinHash-LSH recall, SimHash invariants. */
class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private def shingleSet(text: String): Set[String] =
    Seq(text).toDF("text")
      .select(TextOps.shingles(col("text")).as("sh"))
      .collect().head.getSeq[String](0).toSet

  test("shingles: 3-gram windows, distinct, short-text empty") {
    assert(shingleSet("a b c d") == Set("a b c", "b c d"))
    assert(shingleSet("a b") == Set.empty[String])
    assert(shingleSet("x y z x y z x y z") == Set("x y z", "y z x", "z x y"))
  }

  private val corpus = {
    val doc1 = (1 to 20).map(i => s"t$i").mkString(" ")
    val doc2 = (2 to 20).map(i => s"t$i").mkString(" ") // first token dropped
    val doc3 = (1 to 20).map(i => s"u$i").mkString(" ") // unrelated
    Seq((1L, doc1), (2L, doc2), (3L, doc3)).toDF("doc_id", "text")
  }

  test("exact Jaccard pairs: near-dup found with exact set counts") {
    val rows = Dedup.exactJaccardPairs(corpus).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == (1L, 2L))
    assert(r.getAs[Long]("intersect_n") == 17) // shingles: 18 vs 17
    assert(r.getAs[Long]("union_n") == 18)
  }

  test("MinHash-LSH path finds the same verified pairs as the exact path") {
    val exact = Dedup.exactJaccardPairs(corpus).collect().toSet
    val lsh = Dedup.minhashVerifiedPairs(corpus).collect().toSet
    assert(lsh == exact)
  }

  test("winnow-seeded path finds the same verified pairs as the exact path") {
    val real = Dedup.withNearDuplicates(
      graft.queries.Tables.documents(spark, "/root/testdata/sf0.001"))
    val exact = Dedup.exactJaccardPairs(real).collect()
      .map(_.toSeq).toSet
    val win = Dedup.winnowVerifiedPairs(real).collect()
      .map(_.toSeq).toSet
    assert(win == exact && exact.nonEmpty)
  }

  test("exact dedup groups: copies collapse to min-id keeper") {
    val withCopy = corpus.unionByName(
      corpus.filter(col("doc_id") === 1)
        .select(lit(99L).as("doc_id"), col("text")))
    val groups = Dedup.exactDuplicateGroups(withCopy).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keeper_doc_id") == 1L)
    assert(groups.head.getAs[Long]("n") == 2L)
  }

  test("duplicate clusters: chained pairs collapse to min-id components") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val clusters = Dedup.duplicateClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L))
  }

  test("simhash: equal texts equal signatures; disjoint texts differ") {
    val sigs = Dedup.simhashSignatures(
      Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t"))
        .toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(3L))
  }

  test("hygiene chain: emails, phones, long numbers masked; text normalized") {
    import graft.functions.Clean
    val out = Seq("Call  Bob at 555-123-4567 or bob.smith@corp.example.COM, acct 12345678")
      .toDF("t").select(Clean.hygiene(col("t")).as("r")).head.getString(0)
    assert(out == "call bob at <phone> or <email>, acct <num>")
  }

  test("deterministic sampling: stable membership, sane rates, full split") {
    import graft.operators.Sampling
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"))
    val once = Sampling.deterministicSample(docs, "doc_id", 20)
      .collect().map(_.getLong(0)).toSet
    val twice = Sampling.deterministicSample(docs, "doc_id", 20)
      .collect().map(_.getLong(0)).toSet
    assert(once == twice) // membership is a property of the row
    val rate = once.size.toDouble / docs.count()
    assert(rate > 0.10 && rate < 0.30, s"rate=$rate") // ~20%
    val splits = docs.select(Sampling.splitAssign(col("doc_id")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0)).toSet
    assert(splits == Set("train", "val", "test"))
  }

  test("approx_count_distinct tracks exact distinct within HLL tolerance") {
    import graft.queries.Tables
    // the scale form of "how many distinct shingles" — sketch vs exact
    val sh = Dedup.shingleIndex(
      Tables.documents(spark, "/root/testdata/sf0.01")
        .select(col("doc_id"), col("text")))
    val r = sh.agg(
      countDistinct(col("shingle")).as("exact"),
      approx_count_distinct(col("shingle"), 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("passage cleaner: cleaned corpus has ZERO duplicated windows") {
    val docs = graft.queries.Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = Dedup.withNearDuplicates(docs)
    val cleaned = Dedup.dropDuplicatePassageDocs(corpus, 8).cache()
    // keep-one-copy invariant: any window shared by two survivors would
    // mean neither was dropped, yet only the min carrier may survive
    assert(Dedup.duplicatePassages(cleaned, 8).count() == 0)
    // the injected near-dups (windows ⊂ their original's) must all go
    assert(cleaned.filter(col("doc_id") >= 1000000L).count() == 0)
    // subset of input, and the untouched docs still present
    assert(cleaned.count() > 0 && cleaned.count() < corpus.count())
    cleaned.unpersist()
  }

  test("fingerprints are cross-engine md5 (known value)") {
    // md5("abc") is a published constant — pins the md5/conv path
    val r = Seq("abc").toDF("text").select(
      TextOps.fingerprintMd5(col("text")).as("m"),
      TextOps.fingerprint64(col("text")).as("f")).collect().head
    assert(r.getString(0) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getLong(1) ==
      java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("exact substring spans: maximal cross-doc regions with text") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val doc1 = (1 to 5).map(i => s"a$i").mkString(" ") + " " + shared +
      " " + (1 to 5).map(i => s"b$i").mkString(" ")
    val doc2 = shared + " " + (1 to 8).map(i => s"c$i").mkString(" ")
    val doc3 = (1 to 20).map(i => s"u$i").mkString(" ")
    val corpus = Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
    val rows = Dedup.exactSubstringSpans(corpus, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_tokens"), r.getAs[String]("span_text")))
      .toSet
    // The 12 shared tokens surface as ONE maximal span per doc, at
    // each doc's own offset, with the span text recovered verbatim.
    assert(rows == Set((1L, 5, 12, shared), (2L, 0, 12, shared)))
  }

  test("exact substring spans: blocks below k stay invisible; distant " +
    "blocks stay separate spans") {
    val s1 = (1 to 8).map(i => s"x$i").mkString(" ")  // exactly k
    val s2 = (1 to 7).map(i => s"y$i").mkString(" ")  // below k
    val gap1 = (1 to 9).map(i => s"g$i").mkString(" ")
    val gap2 = (1 to 9).map(i => s"h$i").mkString(" ")
    val doc1 = s1 + " " + gap1 + " " + s2
    val doc2 = s2 + " " + gap2 + " " + s1
    val corpus = Seq((1L, doc1), (2L, doc2)).toDF("doc_id", "text")
    val rows = Dedup.exactSubstringSpans(corpus, 8).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("span_start"),
        r.getAs[Int]("span_tokens"), r.getAs[String]("span_text")))
      .toSet
    // Only the 8-token block is reported (7 < k is invisible), one
    // span per doc — the 9-token gaps keep islands from merging.
    assert(rows == Set((1L, 0, 8, s1), (2L, 16, 8, s1)))
  }

  test("simhash band pairs == brute-force radius ball (pigeonhole " +
    "recall is exact)") {
    import graft.operators.Dedup
    val corpus = Dedup.withNearDuplicates(
      graft.queries.Tables.documents(spark, "/root/testdata/sf0.001"))
    val banded = Dedup.simhashBandPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val sigs = Dedup.simhashSignatures(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b) -> h).toMap
    assert(banded == brute)
  }
}
