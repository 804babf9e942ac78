package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Statistical language-model quality scoring — the perplexity-filter
  * shape (CCNet/KenLM-style: score each document under an n-gram LM;
  * low average log-probability flags incoherent or boilerplate text).
  * The container trains nothing external, so the model IS the corpus:
  * an add-one-smoothed bigram LM trained on the same documents it
  * scores — which makes the whole trainer+scorer pipeline a pure
  * function of the corpus that the DuckDB oracle replicates end to end
  * (the same differential-over-the-trainer story as the k-means ANN
  * family).
  *
  * Model: P(w₂|w₁) = (c(w₁w₂) + 1) / (c(w₁·) + V) with c(w₁·) the
  * count of w₁ as a bigram history and V the corpus vocabulary size.
  * Score = mean over the doc's bigram positions of ln P — position
  * order matters for the float fold, so the per-doc sum folds
  * (pos, ln P) pairs sorted by position (the sorted-fold idiom every
  * float surface here uses); ln is probed bit-identical JVM↔DuckDB;
  * the emitted mean is rounded to 6 dp.
  *
  * Scale shape: trainer = two keyed aggregates (bigram, history) over
  * one tokenization pass — classic map-side-partial counts; scoring =
  * two equi-joins back on (bigram, history) + one groupBy(doc_id).
  * The 1-row vocabulary count broadcasts onto the scorer. A 100 TB
  * corpus trains in one shuffle keyed by bigram; a hot bigram is one
  * hot counter cell, not a hot join key (counts, not pairs).
  */
object LangModel {

  /** (doc_id, n_bigrams, avg_logp) for every doc with ≥ 1 bigram. */
  def bigramScore(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"),
        posexplode(TextOps.ngramsAll(col("text"), 2)))
      .select(col("doc_id"), col("pos"), col("col").as("bigram"),
        substring_index(col("col"), " ", 1).as("w1"))
    val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n2"))
    val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val v = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok")).as("vsz"))
    val lp = bg
      .join(c2, Seq("bigram"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("pos"),
        log((col("n2") + 1).cast("double") /
          (col("n1") + col("vsz")).cast("double")).as("logp"))
    lp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(struct(col("pos"), col("logp"))))
          .as("parts"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(transform(col("parts"), _.getField("logp")),
          lit(0.0), _ + _) / col("n_bigrams"), 6).as("avg_logp"))
  }

  /** LM-score QUALITY BUCKETS — the quality-based mixing prep
    * (DoReMi/quality-bucket reweighting shape): every doc tagged with
    * its [[bigramScore]] quartile, so a downstream mixing recipe can
    * up/down-weight buckets instead of hard-thresholding. Boundaries
    * are exact value quartiles (percentile_disc) computed in ONE tiny
    * aggregate and BROADCAST back — the q_quartiles idiom, never an
    * unpartitioned ntile window; equal scores land in equal buckets
    * deterministically. The LM chain is recomputed for the boundary
    * pass and the assignment pass (same two-pass honesty note as
    * `Analytics.quartiles` — no hidden cache inflating the bench).
    */
  def lmQualityBuckets(docs: DataFrame): DataFrame = {
    val scores = bigramScore(docs).select(col("doc_id"), col("avg_logp"))
    val cuts = scores.agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY avg_logp)")
        .as("c1"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY avg_logp)")
        .as("c2"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY avg_logp)")
        .as("c3"))
    scores.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("avg_logp"),
        (lit(1) + (col("avg_logp") > col("c1")).cast("int")
                + (col("avg_logp") > col("c2")).cast("int")
                + (col("avg_logp") > col("c3")).cast("int")).as("bucket"))
  }

  /** Top-k bigram collocations by PMI — association mining over the
    * corpus (the "new york"/"machine learning" detector): PMI =
    * ln(c₂·N / (c₁(w₁)·c₁'(w₂))) over positional bigram counts, with a
    * `minCount` support floor so rare-pair noise (PMI's classic
    * failure mode) never ranks. Counts stay < 2²⁶ on any realistic
    * shard, so both double products are exact and the only rounding is
    * the emitted 6-dp PMI — cross-engine stable with a (pmi desc,
    * bigram) tie-break.
    *
    * Scale: three keyed count aggregates over one tokenization pass
    * (map-side partials), two broadcast-sized joins (w1/w2 marginals at
    * vocabulary cardinality), one TakeOrderedAndProject for the top-k —
    * no corpus shuffle, no window.
    */
  def bigramPmi(docs: DataFrame, minCount: Int = 5,
                topK: Int = 50): DataFrame = {
    val bg = docs
      .select(col("doc_id"), explode(TextOps.ngramsAll(col("text"), 2))
        .as("bigram"))
      .select(col("bigram"),
        substring_index(col("bigram"), " ", 1).as("w1"),
        substring_index(col("bigram"), " ", -1).as("w2"))
    val n2 = bg.groupBy(col("bigram"))
      .agg(count(lit(1)).as("n2"), first(col("w1")).as("w1"),
        first(col("w2")).as("w2"))
    val totals = bg.agg(count(lit(1)).as("n")) // 1-row broadcast
    val m1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("m1"))
    val m2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("m2"))
    n2.filter(col("n2") >= minCount)
      .join(m1, Seq("w1"))
      .join(m2, Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("n2"),
        round(log(col("n2").cast("double") * col("n").cast("double") /
          (col("m1").cast("double") * col("m2").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(topK)
  }

  /** TRAINED language-ID — the profile-based classifier (Cavnar &
    * Trenkle '94 shape, token-level): per language, the top-`profileK`
    * tokens by labeled-corpus frequency form the profile; a document's
    * score against a language counts its token occurrences that hit
    * that profile; predicted = argmax by (score, then language asc).
    * Replaces a hand-tuned stopword heuristic with supervised state
    * learned FROM the labeled corpus — and because the trainer is two
    * keyed aggregates + a rank, the train→profile→score→argmax
    * pipeline is integer-exact end to end under one differential.
    *
    * Scale: training shuffles (lang, token) counts with map-side
    * partials; profiles are |langs|·profileK rows — broadcast; scoring
    * joins the tokenized corpus once on the token key and aggregates
    * by (doc, lang). Docs hitting no profile at all drop out (inner
    * semantics — mirrored by the oracle).
    */
  def trainedLangId(docs: DataFrame, profileK: Int = 20): DataFrame = {
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val profiles = tok.groupBy(col("lang"), col("token"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("n").desc, col("token"))))
      .filter(col("rk") <= profileK)
      .select(col("lang").as("cand"), col("token"))
    val scores = tok.select(col("doc_id"), col("token"))
      .join(broadcast(profiles), Seq("token"))
      .groupBy(col("doc_id"), col("cand"))
      .agg(count(lit(1)).as("score"))
    scores.groupBy(col("doc_id"))
      .agg(min_by(col("cand"), struct((-col("score")).as("ns"),
          col("cand"))).as("predicted"),
        max(col("score")).as("best_score"))
  }
}
