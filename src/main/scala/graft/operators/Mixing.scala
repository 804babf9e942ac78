package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Corpus mixing — the "data recipe" step of LLM training-set assembly:
  * given a target share per source (web 60%, code 20%, books 10%, …),
  * down-sample each source deterministically so the OUTPUT composition
  * approaches the recipe, without ever shuffling the corpus.
  *
  * Per-source keep probability: p_s = min(1, share_s · N / n_s) — a
  * source already under its target keeps everything (p=1; mixing only
  * removes, it cannot invent rows; up-weighting under-represented
  * sources is the training loader's job via epochs/repetition). The
  * keep decision is a salted content-hash lottery
  * (`Sampling.hashBucket` idiom): a row's fate is a pure function of
  * its key — reproducible across runs, retries and engines, and the
  * whole plan (counts included) carries a DuckDB differential.
  *
  * Scale shape: one per-source count aggregate (|sources| rows), a
  * 1-row total, a broadcast join of the tiny plan table onto the
  * corpus, and a codegen'd hash predicate per row. The corpus itself
  * never shuffles, so this composes with any downstream stage.
  */
object Mixing {

  /** Annotate EVERY row with its source's keep probability and the
    * deterministic keep verdict. `targets` is (sourceCol, share) with
    * shares summing to ≤ 1 over the sources present. A source the
    * recipe does not mention PASSES THROUGH at p = 1 (left join +
    * default) — an incomplete recipe must not silently delete a source;
    * mixing only removes what the recipe names.
    */
  def mixPlan(docs: DataFrame, sourceCol: String, keyCol: String,
              targets: DataFrame): DataFrame = {
    val counts = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
    val total = counts.agg(sum(col("n_s")).as("n_total"))
    val plan = counts
      .crossJoin(broadcast(total))
      .join(targets, Seq(sourceCol), "left")
      .select(col(sourceCol),
        when(col("share").isNull, lit(1.0))
          .otherwise(least(lit(1.0),
            col("share") * col("n_total").cast("double")
              / col("n_s").cast("double"))).as("p"))
    docs.join(broadcast(plan), Seq(sourceCol))
      .withColumn("keep",
        pmod(TextOps.fingerprint64(
            concat(col(keyCol).cast("string"), lit(":mix"))),
          lit(1000000L)) <
          floor(col("p") * lit(1000000.0)).cast("long"))
  }

  /** The mixed corpus: rows whose lottery draw survives the recipe. */
  def mix(docs: DataFrame, sourceCol: String, keyCol: String,
          targets: DataFrame): DataFrame =
    mixPlan(docs, sourceCol, keyCol, targets)
      .filter(col("keep")).drop("p", "keep")

  /** TEMPERATURE-derived recipe (the multilingual-sampling rule,
    * α = 1/2): target share_s ∝ n_s^α — flattens the source
    * distribution toward uniform, upweighting tail sources relative to
    * their raw frequency (α=1 is proportional, α=0 uniform). α is
    * fixed at ½ so the power is `sqrt`, which is correctly-rounded
    * IEEE in both engines (a general `pow` can differ in the last
    * ULP); the normalizer folds the per-source weights in source order
    * — the sorted-fold idiom — so the derived shares are bit-identical
    * cross-engine and the whole recipe+lottery pipeline stays under
    * one differential. Feed the result to [[mixPlan]]/[[mix]].
    *
    * Scale: |sources| rows throughout — counts aggregate + a 1-row
    * normalizer broadcast; nothing touches the corpus until mixPlan.
    */
  def temperatureTargets(docs: DataFrame, sourceCol: String): DataFrame = {
    val w = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_s"))
      .select(col(sourceCol), sqrt(col("n_s").cast("double")).as("w"))
    val z = w
      .agg(array_sort(collect_list(struct(col(sourceCol), col("w"))))
        .as("ws"))
      .select(aggregate(transform(col("ws"), _.getField("w")),
        lit(0.0), _ + _).as("z"))
    w.crossJoin(broadcast(z))
      .select(col(sourceCol), (col("w") / col("z")).as("share"))
  }

  /** LARGEST-REMAINDER apportionment (Hamilton's method) of an exact
    * sample `budget` across sources — the integer-exact complement to
    * [[mix]]'s hash-lottery: when the release contract says "exactly
    * 100k documents, proportional to source size", rounding quotas
    * naively over- or under-shoots; Hamilton floors every quota and
    * hands the leftover seats to the largest fractional remainders
    * (ties to the smaller source name — fully deterministic).
    * Σ alloc == budget ALWAYS, each alloc within 1 of its real quota.
    *
    * Scale shape: one |sources|-row aggregate, 1-row totals broadcast,
    * and a ranking window over the |sources|-row frame (bounded by the
    * source dimension, not data — same argument as the bucket frames).
    * Entirely integer arithmetic: quota = budget·n_s, base = ⌊·/N⌋,
    * remainder = mod — no floats to disagree on.
    */
  def apportion(docs: DataFrame, sourceCol: String,
                budget: Long): DataFrame = {
    val counts = docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum(col("n_docs")).as("n_total"))
    // base via true INTEGER division (`div`, long→long) — Column.divide
    // is double-typed and exact only while budget·n_docs < 2^53; `div`
    // matches the oracle's `//` for all long inputs (ADVICE r7). Both
    // operands are non-negative, so truncating and floor division agree.
    val exact = counts.crossJoin(broadcast(totals))
      .select(col(sourceCol), col("n_docs"), col("n_total"),
        (lit(budget) * col("n_docs")).as("q_num"))
      .withColumn("base", expr("q_num div n_total"))
      .withColumn("rem", col("q_num") % col("n_total"))
      .drop("q_num")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col(sourceCol))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    exact
      .withColumn("leftover", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(w))
      .select(col(sourceCol), col("n_docs"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
  }

  /** DoReMi-STYLE iterative domain reweighting (Xie et al. '23 shape,
    * with the polynomial multiplicative-weights update of
    * Arora–Hazan–Kale instead of the exponentiated one — same
    * fixed point, no cross-engine `exp`): starting from the
    * proportional baseline w⁰_d = n_docs_d / N, each of `steps` rounds
    * upweights domains whose loss EXCEEDS the current mix's expected
    * loss and renormalizes:
    *
    *   excess_t(d) = ℓ(d) − Σ_d w_t(d)·ℓ(d)
    *   w_{t+1}(d) ∝ w_t(d) · (1 + η·excess_t(d))
    *
    * with ℓ(d) the domain's per-token cross-entropy under the CORPUS
    * unigram LM, min-max normalized to [0,1] so 1 + η·excess stays in
    * [1−η, 1+η] — strictly positive, no clipping branch to disagree
    * on. The loss is the trained signal: domains the corpus-level
    * model compresses badly (rare vocabulary) read as high-loss and
    * gain weight — the DoReMi effect of boosting underfit domains.
    *
    * Determinism: the per-token ln contributions are rounded once to
    * 1e-9 fixed point and summed as DECIMAL(20,0) — exact 128-bit-
    * capable integer addition in BOTH engines (Spark decimal sums,
    * DuckDB hugeint-backed decimals), which removes the bigint
    * ceiling a corpus-scale ln sum would hit (unlike PageRank, this
    * mass is NOT bounded by 1 — it grows with tokens-per-domain, so
    * the 64-bit counter would overflow near ~10⁹ tokens·domain⁻¹).
    * The per-step expected-loss and normalizer sums run over the
    * |domains|-row frame as BIN-ORDERED sorted folds (the psiDrift
    * idiom), and every other op is +/·/÷ in a shared tree.
    *
    * Scale shape: one token scan (exploded once), a |V|-row term
    * frequency broadcast back onto it, one keyed per-domain aggregate
    * — everything after is |domains|-row with 1-row broadcasts per
    * step; `steps` is a constant. Output per domain: baseline share,
    * normalized loss, final weight.
    */
  def doremiWeights(docs: DataFrame, sourceCol: String,
                    steps: Int = 5, eta: Double = 0.5): DataFrame = {
    val toks = docs
      .select(col(sourceCol), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val tot = tf.agg(sum(col("tf")).as("nt"))
    val perDom = toks.join(broadcast(tf), Seq("tok"))
      .crossJoin(broadcast(tot))
      .select(col(sourceCol),
        round(log(col("tf").cast("double") / col("nt").cast("double"))
          * 1e9).cast("decimal(20,0)").as("c"))
      .groupBy(col(sourceCol))
      .agg(sum(col("c")).as("s"), count(lit(1)).as("n_tok"))
      .select(col(sourceCol), col("n_tok"),
        (negate(col("s").cast("double")) / 1e9 /
          col("n_tok").cast("double")).as("loss"))
    val nd = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val ndTot = nd.agg(sum(col("n_docs")).as("n_total"))
    val lb = perDom.agg(min(col("loss")).as("lmin"), max(col("loss")).as("lmax"))
    // |domains|-row working frame: (source, n_docs, lnorm, w).
    var dom = perDom.join(nd, Seq(sourceCol))
      .crossJoin(broadcast(ndTot)).crossJoin(broadcast(lb))
      .select(col(sourceCol), col("n_docs"),
        when(col("lmax") === col("lmin"), lit(0.0))
          .otherwise((col("loss") - col("lmin")) /
            (col("lmax") - col("lmin"))).as("lnorm"),
        (col("n_docs").cast("double") / col("n_total").cast("double"))
          .as("w"))
      .localCheckpoint()
    val base = dom.select(col(sourceCol), col("w").as("w_base"))
    for (_ <- 1 to steps) {
      val el = dom.select(col(sourceCol), (col("w") * col("lnorm")).as("x"))
        .agg(array_sort(collect_list(struct(col(sourceCol), col("x"))))
          .as("parts"))
        .select(aggregate(transform(col("parts"), _.getField("x")),
          lit(0.0), _ + _).as("el"))
      val up = dom.crossJoin(broadcast(el))
        .select(col(sourceCol), col("n_docs"), col("lnorm"),
          (col("w") * (lit(1.0) + lit(eta) * (col("lnorm") - col("el"))))
            .as("w"))
      val z = up.select(col(sourceCol), col("w").as("x"))
        .agg(array_sort(collect_list(struct(col(sourceCol), col("x"))))
          .as("parts"))
        .select(aggregate(transform(col("parts"), _.getField("x")),
          lit(0.0), _ + _).as("z"))
      dom = up.crossJoin(broadcast(z))
        .select(col(sourceCol), col("n_docs"), col("lnorm"),
          (col("w") / col("z")).as("w"))
        .localCheckpoint()
    }
    dom.join(base, Seq(sourceCol))
      .select(col(sourceCol), col("n_docs"),
        round(col("lnorm"), 6).as("loss_norm"),
        round(col("w_base"), 6).as("w_base"),
        round(col("w"), 6).as("w_final"))
  }

  /** UNIMAX token-budget allocation (Chung et al. '23): spend a
    * total budget B over sources so that no source exceeds
    * `maxEpochs` repetitions and the leftover is split UNIFORMLY —
    * the fairness alternative to temperature sampling that provably
    * minimizes the maximum per-source epoch count. Greedy over
    * sources in ascending capacity c_i = n_i·E: a source below the
    * running fair share keeps its full capacity, everyone after the
    * crossing point gets an equal split of what remains.
    *
    * The single-pass device: with caps sorted ascending, the greedy's
    * "capped" prefix satisfies c_i·(S−i+1) ≤ B − Σ_{j<i} c_j — an
    * INTEGER test per row, and the ascending sort makes it monotone
    * (substituting the failed test at k into the test at j > k with
    * c_j ≥ c_k forces failure there too) — so the whole
    * iterative loop collapses into one ranking window over the
    * |sources|-row frame plus one conditional aggregate. Integer
    * exact until the one uniform-share division.
    *
    * Scale shape: one keyed token-count aggregate over the scan; the
    * window ranks the |sources|-row frame (dimension-bounded — the
    * q_apportion argument); B defaults to half the corpus
    * (n_corpus DIV budgetShare).
    */
  def unimax(docs: DataFrame, sourceCol: String = "source",
             budgetShare: Int = 2, maxEpochs: Int = 4): DataFrame = {
    val counts = docs.groupBy(col(sourceCol))
      .agg(sum(TextOps.tokenCount(col("text")).cast("long"))
        .as("n_tokens"))
    val totals = counts.agg(sum(col("n_tokens")).as("n_corpus"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap").asc, col(sourceCol).asc)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val ranked = counts.crossJoin(broadcast(totals))
      .withColumn("b", expr(s"n_corpus div $budgetShare"))
      .withColumn("cap", col("n_tokens") * maxEpochs)
      .withColumn("i", row_number().over(w))
      .withColumn("prefix", coalesce(sum(col("cap")).over(
        w.rowsBetween(org.apache.spark.sql.expressions
          .Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("s_total", count(lit(1)).over(wAll))
      .withColumn("capped",
        col("cap") * (col("s_total") - col("i") + 1)
          <= col("b") - col("prefix"))
    val agg = ranked.agg(
      sum(when(col("capped"), col("cap")).otherwise(0L))
        .as("capped_sum"),
      sum(when(!col("capped"), 1L).otherwise(0L)).as("n_uncapped"))
    ranked.crossJoin(broadcast(agg))
      .withColumn("alloc_tokens",
        round(when(col("capped"), col("cap").cast("double"))
          .otherwise((col("b") - col("capped_sum")).cast("double")
            / col("n_uncapped").cast("double")), 6))
      .select(col(sourceCol), col("n_tokens"), col("cap"),
        col("capped"), col("alloc_tokens"),
        round(col("alloc_tokens") / col("n_tokens").cast("double"), 6)
          .as("epochs_used"))
  }
}
