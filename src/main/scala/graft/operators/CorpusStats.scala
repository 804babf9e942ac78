package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Corpus-law statistics — the two classical sanity reads a training
  * corpus gets before anything expensive is trained on it (no reference
  * counterpart; the reference is AR-only — builder brief extension):
  *
  *  - Zipf fit: is the token frequency spectrum the expected power law
  *    (slope ≈ −1), or has dedup/filtering/boilerplate skewed it?
  *  - Heaps curve: how fast does vocabulary grow with corpus size —
  *    the "is more data still adding new content" read that sizes both
  *    tokenizer vocabularies and marginal-data value.
  *
  * Both are tiny-output aggregates over one tokenized scan: the curve /
  * fit frames are bounded by construction (≤ vmax rows, ≤ buckets
  * rows), so every window here runs on a constant-size frame — the
  * q_oov_rate / q_token_budget discipline.
  */
object CorpusStats {

  /** ZIPF-LAW OLS fit of ln(tf) on ln(rank) over the top-`vmax` token
    * types. Rank is assigned by the distributed take-ordered top
    * (tf desc, tok asc — total order), never a vocab-wide global sort;
    * the row_number window runs on the ≤ `vmax`-row frame that LIMIT
    * already produced (bounded by construction).
    *
    * Engine determinism: ln values are snapped to 1e-6 fixed point and
    * summed as exact longs through the aggregate (the
    * [[Pca]] fixed-point device), so partition order cannot move the
    * sums; the closed-form double math runs once on the 1-row result
    * (the [[graft.query.Analytics.trendSlope]] discipline). Magnitudes:
    * ln ≤ ~25 → xi ≤ 2.5e7, Σxi·yi ≤ vmax·6.3e14 — inside Long for any
    * practical vmax.
    *
    * Output (1 row): n_fit, slope, intercept, r2. A healthy natural
    * corpus fits slope ≈ −1 with r² near 1.
    */
  def zipfFit(docs: DataFrame, vmax: Int = 1000): DataFrame = {
    val tf = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok").asc).limit(vmax)
    val ranked = tf.withColumn("rnk", row_number().over(
      Window.orderBy(col("tf").desc, col("tok").asc)))
    val fixed = ranked.select(
      round(log(col("rnk").cast("double")) * 1e6, 0).cast("long").as("x"),
      round(log(col("tf").cast("double")) * 1e6, 0).cast("long").as("y"))
    val s = fixed.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    val deny = nD * col("syy").cast("double") - syD * syD
    s.select(col("n").as("n_fit"),
      round(when(den =!= lit(0.0), num / den), 6).as("slope"),
      round(when(den =!= lit(0.0),
        (syD - (num / den) * sxD) / nD / 1e6), 6).as("intercept"),
      round(when(den * deny =!= lit(0.0), num * num / (den * deny)), 6)
        .as("r2"))
  }

  /** PER-SOURCE Heaps-law exponents: the [[heapsCurve]] machinery run
    * within each source (per-source doc-id ranges, per-source bigram
    * first appearances) and finished with the [[zipfFit]] OLS
    * closed form in log-log space — V(N) ≈ K·N^β per source, so β is
    * the source's MARGINAL-DATA-VALUE read: a high-β source still
    * yields new types per token (buy more of it), a low-β source has
    * saturated (the cross-source companion to q_lm_by_source's
    * familiarity read, VERDICT r9 #7).
    *
    * Determinism: the curve points are exact longs (cumulative
    * integer sums over the densified per-source bucket grid, keyed
    * window); ln values snap to 1e-6 fixed point and sum as exact
    * longs per source; the closed-form double tree runs once per
    * source on the aggregated row with sums cast to double FIRST —
    * term-for-term the q_zipf_fit twin convention.
    *
    * Output per source: n_fit (buckets with data), beta (the Heaps
    * exponent), ln_k (intercept, = ln K — left in log space: no
    * cross-engine exp() surface), r2.
    */
  def heapsBySource(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val bounds = docs.groupBy(col("source"))
      .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
    def bucketOf(df: DataFrame, idCol: String): DataFrame = df
      .join(broadcast(bounds), Seq("source"))
      .withColumn("bnum", (col(idCol) - col("mn")) * buckets)
      .withColumn("bden", col("mx") - col("mn") + 1)
      .withColumn("bucket",
        least(expr("bnum DIV bden"), lit(buckets - 1L)))
    val firsts = bucketOf(docs
      .select(col("source"), col("doc_id"),
        explode(TextOps.ngramsAll(col("text"), 2)).as("bg"))
      .groupBy(col("source"), col("bg"))
      .agg(min(col("doc_id")).as("first_doc")),
      "first_doc")
      .groupBy(col("source"), col("bucket"))
      .agg(count(lit(1)).as("new_types"))
    val occ = bucketOf(docs
      .select(col("source"), col("doc_id"),
        greatest(TextOps.tokenCount(col("text")) - 1, lit(0))
          .cast("long").as("n_bg")), "doc_id")
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_bg")).as("n_bigrams"))
    val grid = bounds.select(col("source"),
      explode(sequence(lit(0L), lit(buckets - 1L))).as("bucket"))
    val w = Window.partitionBy(col("source")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = grid
      .join(occ, Seq("source", "bucket"), "left_outer")
      .join(firsts, Seq("source", "bucket"), "left_outer")
      .select(col("source"), col("bucket"),
        coalesce(col("n_bigrams"), lit(0L)).as("nb"),
        coalesce(col("new_types"), lit(0L)).as("nt"))
      .select(col("source"),
        sum(col("nb")).over(w).as("n_cum"),
        sum(col("nt")).over(w).as("v_cum"))
      .filter(col("n_cum") > 0 && col("v_cum") > 0)
    val fixed = pts.select(col("source"),
      round(log(col("n_cum").cast("double")) * 1e6, 0).cast("long")
        .as("x"),
      round(log(col("v_cum").cast("double")) * 1e6, 0).cast("long")
        .as("y"))
    val s = fixed.groupBy(col("source")).agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val sxD = col("sx").cast("double")
    val syD = col("sy").cast("double")
    val num = nD * col("sxy").cast("double") - sxD * syD
    val den = nD * col("sxx").cast("double") - sxD * sxD
    val deny = nD * col("syy").cast("double") - syD * syD
    s.select(col("source"), col("n").as("n_fit"),
      round(when(den =!= lit(0.0), num / den), 6).as("beta"),
      round(when(den =!= lit(0.0),
        (syD - (num / den) * sxD) / nD / 1e6), 6).as("ln_k"),
      round(when(den * deny =!= lit(0.0), num * num / (den * deny)), 6)
        .as("r2"))
  }

  /** HEAPS-LAW vocabulary-growth curve over token BIGRAMS: split the
    * corpus into `buckets` equal doc-id ranges (the canonical corpus
    * order), and report, cumulatively, how many bigram occurrences
    * have been seen vs how many DISTINCT bigram types — V(N), the
    * Heaps curve. Bigrams rather than unigrams because a type's curve
    * needs headroom above the unigram vocabulary to show growth.
    *
    * One-pass trick: a type's contribution to the curve is fully
    * determined by its FIRST-appearance bucket (min doc_id over its
    * occurrences), so the whole curve is one keyed min-aggregate over
    * the exploded bigrams + a `buckets`-row bucket count — never a
    * per-prefix re-scan. Occurrence totals come from a pure projection
    * (n_tokens − 1 per doc), no second explode.
    *
    * The doc-id bounds are a 1-row aggregate broadcast onto both
    * per-row bucket assignments (the q_quartiles 1-row-frame family);
    * bucket math is all-integer, and the cumulative window runs on the
    * densified `buckets`-row frame (bounded by construction).
    *
    * Output: bucket, n_docs, n_bigrams_cum, vocab_cum.
    */
  def heapsCurve(docs: DataFrame, buckets: Int = 10): DataFrame = {
    val bounds = docs.agg(min(col("doc_id")).as("mn"),
      max(col("doc_id")).as("mx"))
    // Bucket math is INTEGER division (DIV), never a double `/` + floor:
    // a correctly-rounded double quotient sitting a sub-ulp below an
    // integer can round UP to it and shift the floor by one bucket.
    def bucketOf(df: DataFrame, idCol: String): DataFrame = df
      .crossJoin(broadcast(bounds))
      .withColumn("bnum", (col(idCol) - col("mn")) * buckets)
      .withColumn("bden", col("mx") - col("mn") + 1)
      .withColumn("bucket",
        least(expr("bnum DIV bden"), lit(buckets - 1L)))
    // First-appearance bucket per bigram type → new types per bucket.
    val firsts = bucketOf(docs
      .select(col("doc_id"),
        explode(TextOps.ngramsAll(col("text"), 2)).as("bg"))
      .groupBy(col("bg")).agg(min(col("doc_id")).as("first_doc")),
      "first_doc")
      .groupBy(col("bucket")).agg(count(lit(1)).as("new_types"))
    // Docs + bigram-occurrence totals per bucket (pure projection).
    val occ = bucketOf(docs
      .select(col("doc_id"),
        greatest(TextOps.tokenCount(col("text")) - 1, lit(0))
          .cast("long").as("n_bg")), "doc_id")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"),
        sum(col("n_bg")).as("n_bigrams"))
    val grid = docs.sparkSession.range(buckets.toLong)
      .select(col("id").as("bucket"))
    val w = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(occ, Seq("bucket"), "left_outer")
      .join(firsts, Seq("bucket"), "left_outer")
      .select(col("bucket"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("new_types"), lit(0L)).as("new_types"))
      .select(col("bucket"), col("n_docs"),
        sum(col("n_bigrams")).over(w).as("n_bigrams_cum"),
        sum(col("new_types")).over(w).as("vocab_cum"))
  }

  /** GINI COEFFICIENT of the token-frequency distribution — corpus
    * concentration in one number (0 = every type equally frequent,
    * →1 = a few types own the corpus): the inequality read beside
    * [[zipfFit]]'s shape read, and the before/after check that a
    * dedup/filter pass actually flattened the head.
    *
    * Rank-free formulation: with the tf multiset grouped by DISTINCT
    * value v (c_v types at tf = v, ascending), the Gini rank sum is
    * Σ_v v·(c_v·R_v + c_v(c_v−1)/2) where R_v = 1 + Σ_{u<v} c_u — so
    * the whole statistic needs only a prefix sum over distinct tf
    * VALUES, never a rank over types. The prefix uses the ks_drift
    * two-level idiom: an integer-DIV bucket split, a bucket-offset
    * window over the ≤`nBuckets`-row bucket frame (bounded by
    * construction), and keyed in-bucket cumulatives — no vocab-wide
    * window at any scale. G = 2·S/(n·T) − (n+1)/n on the 1-row result.
    *
    * Determinism: counts and the rank sum are exact integers end to
    * end (the rank-sum terms accumulate as DECIMAL(38,0) — v·c·R
    * can pass the bigint ceiling on a corpus-sized vocabulary, the
    * doremi device); the closed form runs once, in doubles, on the
    * 1-row frame.
    */
  def tokenGini(docs: DataFrame, nBuckets: Int = 256): DataFrame = {
    val tf = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    giniOfValues(tf.select(col("tf").as("v")), nBuckets)
      .withColumnRenamed("n_units", "n_types")
      .withColumnRenamed("total", "n_tokens")
  }

  /** Gini coefficient of ANY positive-long value frame (one row per
    * unit, column `v`) — the machinery behind [[tokenGini]], exposed
    * for other inequality reads (degree distributions, shard sizes).
    * Output: (n_units, total, gini). See [[tokenGini]] for the
    * rank-free formulation and determinism notes.
    */
  def giniOfValues(values: DataFrame, nBuckets: Int = 256): DataFrame = {
    val cnts = values.groupBy(col("v"))
      .agg(count(lit(1)).as("c"))
    val bounds = cnts.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val bucketed = cnts.crossJoin(broadcast(bounds))
      .withColumn("bnum", (col("v") - col("mn")) * nBuckets)
      .withColumn("bden", col("mx") - col("mn") + 1)
      .withColumn("bucket",
        least(expr("bnum DIV bden"), lit(nBuckets - 1L)))
      .select(col("v"), col("c"), col("bucket"))
    val bt = bucketed.groupBy(col("bucket"))
      .agg(sum(col("c")).as("bc"))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val offs = bt.select(col("bucket"),
      coalesce(sum(col("bc")).over(wOff), lit(0L)).as("off"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val ranked = bucketed.join(broadcast(offs), Seq("bucket"))
      .withColumn("rstart",
        lit(1L) + col("off") + coalesce(sum(col("c")).over(wIn), lit(0L)))
      // c(c−1)/2 is integer by construction — keep it in integer DIV,
      // never a decimal division (whose result scale could round).
      .withColumn("halfc", expr("(c * (c - 1)) DIV 2"))
      .select((col("v").cast(dec) *
        (col("c").cast(dec) * col("rstart").cast(dec) +
          col("halfc").cast(dec))).as("rank_x"),
        col("c"), (col("v") * col("c")).as("vc"))
    val s = ranked.agg(sum(col("c")).as("n"),
      sum(col("vc")).as("t"), sum(col("rank_x")).cast(dec).as("srx"))
    val nD = col("n").cast("double")
    val tD = col("t").cast("double")
    s.select(col("n").as("n_units"), col("t").as("total"),
      round(when(col("n") > 1,
        lit(2.0) * col("srx").cast("double") / (nD * tD)
          - (nD + 1.0) / nD), 6).as("gini"))
  }

  /** CHARACTER-CLASS corpus profile per language — the Gopher-rule
    * substrate (symbol/digit/upper ratios) rolled up where the
    * per-doc rules live on doc rows: exact per-class character counts
    * from length deltas (strip the class, diff the lengths — pure
    * codegen'd projections, no explode), summed per language, one
    * rounded division per ratio. ASCII classes only, deliberately:
    * `[0-9] [A-Z] [a-z]` and space mean the same thing to every regex
    * engine, so the differential has no dialect surface.
    */
  def charClassProfile(docs: DataFrame, langCol: String = "lang")
      : DataFrame = {
    def stripped(re: String) =
      length(col("text")) - length(regexp_replace(col("text"), re, ""))
    val perDoc = docs.select(col(langCol).as("lang"),
      length(col("text")).cast("long").as("n_chars"),
      (length(col("text"))
        - length(regexp_replace(col("text"), lit(" "), lit(""))))
        .cast("long").as("n_space"),
      stripped("[0-9]").cast("long").as("n_digit"),
      stripped("[A-Z]").cast("long").as("n_upper"),
      stripped("[a-z]").cast("long").as("n_lower"))
    val g = perDoc.groupBy(col("lang")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
      sum(col("n_space")).as("sp"), sum(col("n_digit")).as("dg"),
      sum(col("n_upper")).as("up"), sum(col("n_lower")).as("lo"))
    def ratio(c: org.apache.spark.sql.Column, as: String) =
      round(c.cast("double") / col("n_chars").cast("double"), 6).as(as)
    g.select(col("lang"), col("n_docs"), col("n_chars"),
      ratio(col("sp"), "space_ratio"), ratio(col("dg"), "digit_ratio"),
      ratio(col("up"), "upper_ratio"), ratio(col("lo"), "lower_ratio"),
      ratio(col("n_chars") - col("sp") - col("dg") - col("up")
        - col("lo"), "other_ratio"))
  }

  /** TERM BURSTINESS — collection frequency over document frequency
    * (cf/df) per type: a term at 1.0 appears once wherever it appears
    * (function-word shape); high values mark terms that CLUMP — the
    * topicality/boilerplate signal (Church & Gale) that tf-idf's df
    * alone misses. Top-`k` over the `minTf` head by the rounded ratio
    * (exact-integer inputs → identical rounding both engines), via
    * TakeOrderedAndProject — never a vocab-wide sort.
    */
  def burstiness(docs: DataFrame, minTf: Long = 10, k: Int = 50)
      : DataFrame = {
    docs.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .filter(col("tf") >= minTf)
      .select(col("tok"), col("tf"), col("df"),
        round(col("tf").cast("double") / col("df").cast("double"), 6)
          .as("burstiness"))
      .orderBy(col("burstiness").desc, col("tok").asc)
      .limit(k)
  }

  /** LEXICAL RICHNESS per source — type–token ratio and Herdan's C
    * (ln V / ln N, the closed-form Heaps-exponent estimate) over
    * bigram types: the "which source still adds new content" read at
    * per-source granularity, where [[heapsCurve]] gives the corpus
    * curve. A source whose C sits far below its peers is repeating
    * itself (template/boilerplate mass) before any dedup run names
    * the culprit passages.
    *
    * One exploded aggregate per source (distinct types via the keyed
    * two-column groupBy, totals via count), integer-exact until the
    * two divisions; ln probed bit-identical cross-engine.
    */
  def lexicalRichness(docs: DataFrame, srcCol: String = "source")
      : DataFrame = {
    val bg = docs.select(col(srcCol).as("source"),
      explode(TextOps.ngramsAll(col("text"), 2)).as("bg"))
    val types = bg.groupBy(col("source"), col("bg")).agg(count(lit(1))
        .as("c"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"), sum(col("c")).as("n_bigrams"))
    types.select(col("source"), col("n_bigrams"), col("n_types"),
      round(col("n_types").cast("double")
        / col("n_bigrams").cast("double"), 6).as("ttr"),
      round(when(col("n_bigrams") > 1,
        log(col("n_types").cast("double"))
          / log(col("n_bigrams").cast("double"))), 6).as("herdan_c"))
  }

  /** HILL tail-index estimator over bigram frequencies — the MLE
    * companion to [[zipfFit]]'s OLS: α̂ = k / Σᵢ ln(x(i)/x(k+1)) over
    * the top-k order statistics. Where the OLS slope averages the
    * whole head, Hill reads ONLY the tail exponent — the number that
    * says how heavy the frequency tail really is (α near 1 = Zipfian;
    * larger = thinner tail after dedup/filtering). Bigrams, not
    * unigrams, for the same reason as [[heapsCurve]]: the estimator
    * needs order statistics, so the vocabulary must outnumber k.
    *
    * Shapes: distributed take-ordered top-(k+1) (never a vocab-wide
    * sort), the rank window on the ≤k+1-row frame (bounded by
    * construction), the 1-row x(k+1) frame broadcast back, ln terms
    * snapped to 1e-6 fixed point and summed as exact longs, one
    * division. Fewer than k+1 types → an honest (0, NULL) row, not an
    * estimate from a vocabulary that cannot support one.
    */
  def hillTail(docs: DataFrame, k: Int = 200): DataFrame = {
    val top = docs
      .select(explode(TextOps.ngramsAll(col("text"), 2)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("bg").asc).limit(k + 1)
    val ranked = top.withColumn("rnk", row_number().over(
      Window.orderBy(col("tf").desc, col("bg").asc)))
    val xk = ranked.filter(col("rnk") === k + 1)
      .select(col("tf").as("xk"))
    val s = ranked.filter(col("rnk") <= k)
      .crossJoin(broadcast(xk))
      .select(round((log(col("tf").cast("double"))
        - log(col("xk").cast("double"))) * 1e6, 0).cast("long")
        .as("term_fp"))
      .agg(count(lit(1)).as("k_used"), sum(col("term_fp")).as("st"))
    s.select(col("k_used"),
      round(when(col("st") > 0,
        col("k_used").cast("double") * 1e6 / col("st").cast("double")),
        6).as("alpha"))
  }

  /** MUTUAL INFORMATION between two metadata dimensions — "does
    * source predict language" as one number: I(X;Y) =
    * Σ p(x,y)·ln(p(x,y)/(p(x)p(y))) over the |X|·|Y| contingency
    * cells, with both marginal entropies and the normalized
    * NMI = I/√(H(X)H(Y)). High NMI between source and lang says the
    * two stratifications are redundant (mixing by one implicitly
    * mixes by the other); near-zero says they cut independently —
    * the read that decides whether a sampling scheme needs both keys.
    *
    * Determinism ([[hillTail]]'s device): every ln term is snapped to
    * a 1e-6 fixed-point long and SUMMED AS EXACT INTEGERS — no float
    * fold order anywhere; the three output ratios are fixed double
    * chains over the integer sums, rounded 6 dp.
    *
    * Scale shape: one (x, y) keyed count (map-side partials — the
    * contingency table is |X|·|Y| rows no matter the corpus), two
    * marginal aggregates of that table, a 1-row total broadcast
    * (allowlisted). Nothing data-sized moves after the first
    * aggregate.
    */
  def mutualInfo(docs: DataFrame, xCol: String = "source",
                 yCol: String = "lang"): DataFrame = {
    val cells = docs.groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("n")).localCheckpoint(false)
    val mx = cells.groupBy(col("x")).agg(sum(col("n")).as("nx"))
    val my = cells.groupBy(col("y")).agg(sum(col("n")).as("ny"))
    val nn = cells.agg(sum(col("n")).as("nn"))
    val smi = cells.join(broadcast(mx), Seq("x"))
      .join(broadcast(my), Seq("y")).crossJoin(broadcast(nn))
      .select(round((col("n").cast("double") / col("nn"))
        * log((col("n") * col("nn")).cast("double")
          / (col("nx") * col("ny")).cast("double")) * 1e6, 0)
        .cast("long").as("t"))
      .agg(sum(col("t")).as("smi"))
    def entSum(m: DataFrame, c: String, as: String) =
      m.crossJoin(broadcast(nn))
        .select(round((col(c).cast("double") / col("nn"))
          * log(col(c).cast("double") / col("nn")) * 1e6, 0)
          .cast("long").as("t"))
        .agg(sum(col("t")).as(as))
    smi.crossJoin(broadcast(entSum(mx, "nx", "shx")))
      .crossJoin(broadcast(entSum(my, "ny", "shy")))
      .select(
        round(col("smi").cast("double") / 1e6, 6).as("mi"),
        round(-col("shx").cast("double") / 1e6, 6).as("h_x"),
        round(-col("shy").cast("double") / 1e6, 6).as("h_y"),
        round((col("smi").cast("double") / 1e6)
          / sqrt((-col("shx").cast("double") / 1e6)
            * (-col("shy").cast("double") / 1e6)), 6).as("nmi"))
  }

  /** GOOD-TURING missing mass + CHAO1 richness per source — the
    * "how much vocabulary haven't we seen yet" pair that prices
    * additional data from the same source (the marginal-value read
    * beside [[heapsBySource]]'s growth exponent):
    *
    *   missing_mass  P₀ = N₁/N (Good '53; Gale & Sampson '95): the
    *                 probability the NEXT token is an unseen type —
    *                 the singleton share of tokens;
    *   chao1         V + N₁(N₁−1)/(2(N₂+1)) (Chao '84, bias-
    *                 corrected form — defined even when no doubletons
    *                 exist): the abundance-based floor on the true
    *                 vocabulary size.
    *
    * Everything is integer until the two final divisions — no ln, no
    * fixed point needed. Scale shape: one (source, token) keyed
    * aggregate (map-side combinable) and one source-keyed rollup of
    * frequency-of-frequency indicators; output is |sources| rows.
    */
  def missingMass(docs: DataFrame): DataFrame = {
    val types = docs.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    types.groupBy(col("source")).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singletons"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n_doubletons"))
      .select(col("source"), col("n_tokens"), col("n_types"),
        col("n_singletons"), col("n_doubletons"),
        round(col("n_singletons").cast("double")
          / col("n_tokens").cast("double"), 6).as("missing_mass"),
        round(col("n_types").cast("double")
          + col("n_singletons").cast("double")
            * (col("n_singletons") - 1).cast("double")
            / (lit(2.0) * (col("n_doubletons") + 1).cast("double")), 6)
          .as("chao1"))
  }

  /** LEAVE-ONE-SOURCE-OUT influence (the jackknife at the source
    * grain): how much does each source pull the corpus-wide mean of
    * an integer metric? influence_s = mean_all − mean_without_s,
    * entirely closed-form from the global (Σ, n) and the per-source
    * (Σ_s, n_s) — no second scan, no resampling. The data-valuation
    * companion to [[missingMass]]: a large positive influence means
    * the source inflates the metric, a large negative one that it
    * drags it down — either way, the first screen for "should we
    * renegotiate this feed".
    *
    * Scale shape: ONE keyed aggregate over the scan plus a 1-row
    * broadcast; integer sums until the three divisions per output
    * row. |sources| rows out.
    */
  def sourceInfluence(docs: DataFrame): DataFrame = {
    val per = docs.select(col("source"),
        col("n_chars").cast("long").as("x"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("x")).as("sx"))
    val tot = per.agg(sum(col("n_docs")).as("n"), sum(col("sx")).as("s"))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"),
        round(col("n_docs").cast("double") / col("n").cast("double"), 6)
          .as("doc_share"),
        round(col("s").cast("double") / col("n").cast("double"), 6)
          .as("mean_all"),
        round((col("s") - col("sx")).cast("double")
          / (col("n") - col("n_docs")).cast("double"), 6)
          .as("mean_without"),
        round(col("s").cast("double") / col("n").cast("double")
          - (col("s") - col("sx")).cast("double")
            / (col("n") - col("n_docs")).cast("double"), 6)
          .as("influence"))
  }

  /** Per-source unigram KL DIVERGENCE to the corpus distribution —
    * the drift/outlier read at the source grain (which feed no longer
    * speaks like the corpus): KL(p_s ‖ q) with add-one smoothing on
    * the source side over the corpus vocabulary V (so p_s sums to 1
    * and KL ≥ 0), q the corpus MLE.
    *
    * The scale device is the ABSENT-WORD CLOSED FORM: the naive sum
    * ranges over |sources| × V pairs, but every word absent from a
    * source contributes the SAME p₀ = 1/(N_s + V), so
    * Σ_absent p₀·(ln p₀ − ln q_w) = p₀·[(V − V_s)·ln p₀ −
    * (L_all − L_present)] with L = Σ ln q_w — and the whole absent
    * side collapses into per-source 1-row arithmetic from two integer
    * sums. Only PRESENT (source, word) pairs are enumerated — the
    * frame that already exists.
    *
    * Determinism: one ln per vocab word (lnq, rounded once to 1e6
    * fixed point) and one per present pair (the term, rounded once);
    * both sums are integer; the finish is per-source 1-row doubles.
    */
  def sourceKl(docs: DataFrame): DataFrame = {
    // Three consumers of the (source, token) count frame.
    val src = docs.select(col("source"),
        explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .cache()
    val corpus = src.groupBy(col("tok")).agg(sum(col("c")).as("cw"))
    val tot = corpus.agg(sum(col("cw")).as("n"), count(lit(1)).as("v"))
    val lnq = corpus.crossJoin(broadcast(tot))
      .select(col("tok"),
        round(log(col("cw").cast("double") / col("n").cast("double"))
          * 1e6).cast("long").as("lnq_fp"))
    val lAll = lnq.agg(sum(col("lnq_fp")).as("l_all_fp"))
    val per = src.groupBy(col("source"))
      .agg(sum(col("c")).as("n_s"), count(lit(1)).as("v_s"))
    val present = src.join(lnq, Seq("tok"))
      .join(broadcast(per), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("p", (col("c") + 1).cast("double")
        / (col("n_s") + col("v")).cast("double"))
      .withColumn("term_fp",
        round(col("p") * (log(col("p"))
          - col("lnq_fp").cast("double") / lit(1e6)) * lit(1e6))
          .cast("long"))
      .groupBy(col("source"))
      .agg(sum(col("term_fp")).as("pres_fp"),
        sum(col("lnq_fp")).as("l_pres_fp"))
    val out = per.join(present, Seq("source"))
      .crossJoin(broadcast(tot)).crossJoin(broadcast(lAll))
      .withColumn("p0",
        lit(1.0) / (col("n_s") + col("v")).cast("double"))
      .select(col("source"), col("n_s").as("n_tokens"),
        col("v_s").as("n_types"),
        round(col("pres_fp").cast("double") / lit(1e6)
          + col("p0") * ((col("v") - col("v_s")).cast("double")
            * log(col("p0"))
            - (col("l_all_fp") - col("l_pres_fp")).cast("double")
              / lit(1e6)), 6).as("kl"))
      .localCheckpoint()
    src.unpersist()
    out
  }
}
