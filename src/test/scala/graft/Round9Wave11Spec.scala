package graft

import org.apache.spark.sql.functions._
import graft.operators.{CorpusStats, Dedup, LangModel}

/** r9 wave-11 operators: Hill tail index, LM quality by source,
  * duplicate-cluster size distribution, stopword coverage.
  */
class Round9Wave11Spec extends SparkSpec {
  import spark.implicits._

  test("hillTail: a known Pareto tail recovers its exponent") {
    // Bigram frequencies following tf(r) = floor(C / r) have tail
    // index 1. Build bigrams "b<r> b<r>" repeated 2400/r times for
    // r = 1..300 (need > k+1 = 201 types): each doc contributes its
    // bigram tf times via a 2-token doc per occurrence... cheaper:
    // one doc per (r, occurrence) with 2 tokens = 1 bigram each.
    val rows = (1 to 300).flatMap { r =>
      val tf = 2400 / r
      (0 until tf).map(i => (r * 10000L + i, s"x$r y$r"))
    }
    val docs = rows.toDF("doc_id", "text")
    val got = CorpusStats.hillTail(docs, k = 200).collect()(0)
    assert(got.getAs[Long]("k_used") == 200L)
    // floor() quantization biases the estimate slightly; band it.
    val alpha = got.getAs[Double]("alpha")
    assert(alpha > 0.85 && alpha < 1.15, s"alpha $alpha")
  }

  test("hillTail: fewer than k+1 types -> honest (0, null), not a " +
    "fabricated estimate") {
    val docs = Seq((0L, "a b"), (1L, "a b")).toDF("doc_id", "text")
    val got = CorpusStats.hillTail(docs, k = 200).collect()(0)
    assert(got.getAs[Long]("k_used") == 0L)
    assert(got.isNullAt(got.fieldIndex("alpha")))
  }

  test("lmBySource: an in-distribution source outscores an " +
    "off-distribution one under the corpus LM") {
    // Source A: 20 copies of the same 3-token sentence (its bigrams
    // dominate the LM). Source B: 2 docs of unique junk bigrams.
    val docs = ((0L until 20L).map(i => (i, "the cat sat", "A")) ++
      Seq((100L, "zq qx", "B"), (101L, "vv ww", "B")))
      .toDF("doc_id", "text", "source")
    val got = LangModel.lmBySource(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("A").getAs[Long]("n_docs") == 20L)
    assert(got("A").getAs[Long]("n_bigrams") == 40L)
    assert(got("B").getAs[Long]("n_bigrams") == 2L)
    assert(got("A").getAs[Double]("macro_avg_logp") >
      got("B").getAs[Double]("macro_avg_logp"))
  }

  test("clusterSizeDist: a 3-chain and an isolated pair histogram " +
    "as one size-3 and one size-2 cluster") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.clusterSizeDist(pairs).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        r.getAs[Long]("n_clusters")).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L))
  }

  test("lexicalRichness: a repeating source scores below a novel one " +
    "on TTR and Herdan's C") {
    // Source A: one 3-token sentence stamped 10 times (2 bigram
    // types, 20 occurrences). Source B: 20 distinct bigrams.
    val docs = ((0L until 10L).map(i => (i, "a b c", "A")) ++
      (0L until 10L).map(i =>
        (100L + i, s"u$i v$i w$i", "B"))).toDF("doc_id", "text", "source")
    val got = CorpusStats.lexicalRichness(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("A").getAs[Long]("n_types") == 2L)
    assert(got("A").getAs[Long]("n_bigrams") == 20L)
    assert(got("A").getAs[Double]("ttr") == 0.1)
    assert(got("B").getAs[Long]("n_types") == 20L)
    assert(got("B").getAs[Double]("ttr") == 1.0)
    assert(got("A").getAs[Double]("herdan_c") <
      got("B").getAs[Double]("herdan_c"))
    val expectA = math.rint(math.log(2.0) / math.log(20.0) * 1e6) / 1e6
    assert(got("A").getAs[Double]("herdan_c") == expectA)
  }

  test("stopword coverage query: hand-counted ratio per lang") {
    val docs = Seq((0L, "the cat sat on a mat", "en"),
      (1L, "no stp wrds here", "xx")).toDF("doc_id", "text", "lang")
    val got = docs
      .select(col("lang"),
        graft.functions.TextOps.tokenCount(col("text")).cast("long")
          .as("nt"),
        graft.functions.TextOps.stopwordCount(col("text")).cast("long")
          .as("nsw"))
      .groupBy(col("lang"))
      .agg(sum(col("nt")).as("n_tokens"), sum(col("nsw")).as("n_sw"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_sw"))).toMap
    assert(got("en") == ((6L, 2L)), "'the' and 'a'")
    assert(got("xx") == ((4L, 0L)))
  }
}
