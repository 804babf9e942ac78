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

  /** INTERPOLATED ABSOLUTE-DISCOUNT bigram scoring (the Kneser-Ney
    * construction — Kneser & Ney '95; Chen & Goodman '98's measured-best
    * smoothing family): where [[bigramScore]]'s add-one flattens all
    * unseen mass uniformly, KN subtracts a fixed discount D from every
    * seen bigram and redistributes it through the CONTINUATION
    * distribution — how many distinct contexts a word follows, not how
    * often it occurs ("Francisco" is frequent but only ever follows
    * "San"; its continuation probability is tiny, so it stops stealing
    * mass in novel contexts):
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁·)
    *              + (D · N1+(w₁·)/c(w₁·)) · (N1+(·w₂) / N_types)
    *
    * with N1+(w₁·) distinct continuations of w₁, N1+(·w₂) distinct
    * histories of w₂, N_types distinct bigrams, D = 0.75 (the standard
    * c−n₁/(n₁+2n₂) estimate lands near 0.75 on natural text; exact in
    * binary so cross-engine stable). Trained on the corpus it scores,
    * like every trainer here — the full model is inside the
    * differential. Score = position-sorted mean ln P (the sorted-fold
    * float idiom), 6 dp.
    *
    * Scale shape: [[bigramScore]]'s — three keyed count aggregates
    * (bigram / history / continuation — the continuation counts are
    * COUNT(DISTINCT) over keyed groups, map-side partial), three
    * equi-joins back on those keys, one doc-keyed fold. The 1-row type
    * count broadcasts.
    */
  def knBigramScore(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"),
        posexplode(TextOps.ngramsAll(col("text"), 2)))
      .select(col("doc_id"), col("pos"), col("col").as("bigram"),
        substring_index(col("col"), " ", 1).as("w1"),
        substring_index(col("col"), " ", -1).as("w2"))
    val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("n2"))
    val ch = bg.groupBy(col("w1")).agg(count(lit(1)).as("ch"),
      countDistinct(col("w2")).as("n1f"))
    val cc = bg.groupBy(col("w2")).agg(countDistinct(col("w1")).as("n1b"))
    val ty = bg.agg(countDistinct(col("bigram")).as("nt"))
    val lp = bg
      .join(c2, Seq("bigram"))
      .join(ch, Seq("w1"))
      .join(cc, Seq("w2"))
      .crossJoin(broadcast(ty))
      .select(col("doc_id"), col("pos"),
        log(
          greatest(col("n2").cast("double") - lit(0.75), lit(0.0)) /
            col("ch").cast("double") +
          (lit(0.75) * col("n1f").cast("double") /
            col("ch").cast("double")) *
          (col("n1b").cast("double") / col("nt").cast("double"))
        ).as("logp"))
    lp.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        array_sort(collect_list(struct(col("pos"), col("logp"))))
          .as("parts"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(transform(col("parts"), _.getField("logp")),
          lit(0.0), _ + _) / col("n_bigrams"), 6).as("avg_logp"))
  }

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

  /** WINDOWED PPMI co-occurrence — the word-embedding prep matrix
    * (Levy & Goldberg '14: skip-gram with negative sampling implicitly
    * factorizes the shifted-PPMI matrix; GloVe trains on the same
    * counts): symmetric (center, context) pairs at distance 1..window,
    * positive PMI only. Where [[bigramPmi]] reads DIRECTED adjacency
    * (collocations), this is the symmetric windowed distribution that
    * distributional semantics is built on — its top pairs are
    * second-order relatedness, not just fixed phrases.
    *
    * Pairs are built from (d+1)-gram ENDPOINTS per distance d —
    * pure per-row projections (no self-join; at 100 TB a positional
    * self-join keyed by doc would shuffle the tokenized corpus twice,
    * the endpoint explode touches it once per distance). Counts are
    * keyed aggregates; PMI arithmetic is the [[bigramPmi]] tree with
    * the PPMI clamp applied AFTER the 6-dp round (deterministic
    * composition of two exact ops).
    */
  def ppmiWindow(docs: DataFrame, window: Int = 2, minCount: Int = 5,
                 topK: Int = 50): DataFrame = {
    val ends = (1 to window).map { d =>
      docs.select(explode(TextOps.ngramsAll(col("text"), d + 1))
          .as("gram"))
        .select(substring_index(col("gram"), " ", 1).as("a"),
          substring_index(col("gram"), " ", -1).as("b"))
    }.reduce(_ unionByName _)
    val pairs = ends.select(col("a").as("w"), col("b").as("c"))
      .unionByName(ends.select(col("b").as("w"), col("a").as("c")))
    val nwc = pairs.groupBy(col("w"), col("c"))
      .agg(count(lit(1)).as("n_wc"))
    val nw = pairs.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
    val nc = pairs.groupBy(col("c")).agg(count(lit(1)).as("n_c"))
    val tot = pairs.agg(count(lit(1)).as("t"))
    nwc.filter(col("n_wc") >= minCount)
      .join(nw, Seq("w"))
      .join(nc, Seq("c"))
      .crossJoin(broadcast(tot))
      .select(col("w"), col("c"), col("n_wc"),
        greatest(round(log(col("n_wc").cast("double") *
            col("t").cast("double") /
            (col("n_w").cast("double") * col("n_c").cast("double"))), 6),
          lit(0.0)).as("ppmi"))
      .filter(col("ppmi") > 0.0)
      .orderBy(col("ppmi").desc, col("w"), col("c"))
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

  /** LM QUALITY BY SOURCE — the per-source roll-up of
    * [[bigramScore]]: macro-averaged per-doc log-probability under
    * the corpus bigram LM, per source. The triage read a mixing
    * recipe starts from: a source whose macro avg_logp sits far below
    * the corpus norm is off-distribution (boilerplate, other
    * language, markup soup) BEFORE any manual inspection.
    *
    * Determinism: per-doc avg_logp is already 6-dp-rounded by the
    * scorer, so the 1e-6 fixed-point snap recovers an exact integer
    * per doc — group sums are order-free; one division per source.
    */
  def lmBySource(docs: DataFrame): DataFrame = {
    val scored = bigramScore(docs)
    scored
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("source"), col("n_bigrams"),
        round(col("avg_logp") * 1e6, 0).cast("long").as("lp_fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        round(sum(col("lp_fp")).cast("double")
          / (count(lit(1)).cast("double") * 1e6), 6)
          .as("macro_avg_logp"))
  }
}
