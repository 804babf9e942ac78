package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Trained multinomial Naive Bayes text classifier — the
  * fastText/CCNet-quality-filter shape (train a cheap linear classifier
  * on a labeled slice, score the whole corpus): add-one-smoothed token
  * likelihoods per class plus a document-count prior, argmax of the
  * per-class log-posterior. Complements the n-gram PROFILE langid
  * (`LangModel.trainedLangId`, Cavnar–Trenkle rank distance) with the
  * probabilistic-classifier mechanism: trained log-odds SUMS, a prior,
  * and a posterior margin — the thing you threshold when the classifier
  * gates corpus admission.
  *
  * Model, for class c and token t over the TRAIN split:
  *   P(t|c) = (count(t,c) + 1) / (tokens(c) + V)       V = train vocab
  *   P(c)   = docs(c) / docs                            (doc-count prior)
  *   score(d,c) = ln P(c) + Σ_{positions i} ln P(t_i|c)
  * prediction = argmax_c score(d,c), ties to the lexicographically
  * first class.
  *
  * DETERMINISM: the position-ordered sorted fold (the float idiom every
  * score surface here uses) makes the per-(doc, class) ln-sum
  * order-free; ln is probed bit-identical JVM↔DuckDB; the emitted
  * score is rounded to 6 dp AFTER the argmax, which compares full
  * doubles (ties at full precision are broken by class name, so both
  * engines pick identically — a cross-engine score tie below 1 ulp is
  * not reachable with these count ratios).
  *
  * Scale shape: training = two keyed aggregates ((class, token) and
  * (class)) over one tokenization pass — map-side-combinable counts,
  * never pairs. Scoring = explode test tokens, ONE broadcast-able join
  * onto the (class, token) likelihood table keyed by token (classes
  * per token ≤ |C|, so the fan-out is |C|, constant), then a
  * (doc, class) aggregate and a |C|-row-per-doc argmax window. A 100 TB
  * corpus trains in one shuffle keyed by (class, token); the model —
  * |C|·V rows — broadcasts when V is vocabulary-sized, and falls back
  * to a keyed shuffle join when it is not. Unseen test tokens hit the
  * smoothing floor via the class-likelihood left join (each class
  * contributes ln(1/(tokens(c)+V)) — exactly the add-one floor).
  */
object TextClassify {

  /** (doc_id, pred, score, actual, correct) for every doc in the TEST
    * slice (`doc_id % testMod == 0`), trained on the rest. `labelCol`
    * is the class column (catalog: `lang`).
    */
  def naiveBayes(docs: DataFrame, labelCol: String = "lang",
                 testMod: Int = 5): DataFrame =
    rankedScores(docs, labelCol, testMod)
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("pred"),
        round(col("score"), 6).as("score"), col("actual"),
        (col("cls") === col("actual")).as("correct"))

  /** The full ranked per-(doc, class) log-posterior frame
    * (doc_id, actual, cls, score, rk) the classifier ranks over —
    * exposed so [[naiveBayes]] (rk = 1 verdicts) and
    * [[nbCalibration]] (rk = 1 vs rk = 2 margin) share one trainer +
    * scorer chain; scores are UNROUNDED here (the argmax compares
    * full doubles; consumers round at their own edge).
    */
  def rankedScores(docs: DataFrame, labelCol: String = "lang",
                   testMod: Int = 5): DataFrame = {
    val toks = docs.select(col("doc_id"), col(labelCol).as("cls"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
    val train = toks.filter(col("doc_id") % testMod =!= 0)
    val test = toks.filter(col("doc_id") % testMod === 0)

    // Trainer: (class, token) counts, per-class token totals, vocab
    // size, doc-count priors — all plain keyed aggregates.
    val ct = train.groupBy(col("cls"), col("tok"))
      .agg(count(lit(1)).as("n_tc"))
    val cTot = train.groupBy(col("cls")).agg(count(lit(1)).as("n_c"))
    val vocab = train.agg(countDistinct(col("tok")).as("vsz"))
    val trainDocs = docs.filter(col("doc_id") % testMod =!= 0)
    val priors = trainDocs.groupBy(col(labelCol).as("cls"))
      .agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(trainDocs.agg(count(lit(1)).as("n_all"))))
      .select(col("cls"),
        log(col("n_docs").cast("double") / col("n_all")).as("log_prior"))

    // Scorer: every test token position × every class; the (cls, tok)
    // likelihood join is LEFT so unseen tokens take the smoothing
    // floor. Classes come from the trained prior frame (|C| rows,
    // broadcast), so a test-only label can never invent a class.
    val scored = test.select(col("doc_id"), col("pos"), col("tok"),
        col("cls").as("actual"))
      .join(broadcast(priors.select(col("cls"))), lit(true))
      .join(ct, Seq("cls", "tok"), "left")
      .join(cTot, Seq("cls"))
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("actual"), col("cls"), col("pos"),
        log((coalesce(col("n_tc"), lit(0L)) + 1).cast("double") /
          (col("n_c") + col("vsz")).cast("double")).as("logp"))
    val perClass = scored
      .groupBy(col("doc_id"), col("actual"), col("cls"))
      .agg(array_sort(collect_list(struct(col("pos"), col("logp"))))
        .as("parts"))
      .join(priors, Seq("cls"))
      .select(col("doc_id"), col("actual"), col("cls"),
        (col("log_prior") +
          aggregate(transform(col("parts"), _.getField("logp")),
            lit(0.0), _ + _)).as("score"))
    perClass
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("cls").asc)))
  }

  /** MARGIN-CALIBRATION (reliability) bins for the trained classifier
    * — does confidence MEAN anything: test docs are binned by the
    * argmax margin (top log-posterior minus runner-up — the quantity
    * a gating threshold actually cuts on), and each bin reports its
    * population, empirical accuracy, and mean margin. A
    * well-calibrated-for-gating classifier shows accuracy rising
    * monotonically with margin; a flat curve says the margin carries
    * no signal and thresholding it is theater. Margin, not softmax:
    * the margin is the same decision variable with no cross-engine
    * exp() surface.
    *
    * DETERMINISM: the margin is snapped once to 1e-6 fixed point;
    * bins are integer DIV buckets of the fixed-point value (width
    * `binWidthFp`·1e-6 nats, capped at `maxBin`); populations and
    * correct-counts are exact integers; accuracy and mean margin are
    * one division each on the bin row.
    *
    * Scale shape: [[rankedScores]]' chain plus one (doc)-keyed join
    * of the rk = 1 and rk = 2 frames and one ≤(maxBin+1)-row
    * aggregate. Output: (bin, n_docs, n_correct, accuracy,
    * mean_margin).
    */
  def nbCalibration(docs: DataFrame, labelCol: String = "lang",
                    testMod: Int = 5, binWidthFp: Long = 2000000L,
                    maxBin: Int = 9): DataFrame = {
    // Materialize the ranked frame ONCE (localCheckpoint): the rk=1
    // and rk=2 legs would otherwise each re-run the whole
    // trainer+scorer chain.
    val ranked = rankedScores(docs, labelCol, testMod)
      .localCheckpoint(false)
    val top = ranked.filter(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("pred"), col("actual"),
        col("score").as("s1"))
    val second = ranked.filter(col("rk") === 2)
      .select(col("doc_id"), col("score").as("s2"))
    top.join(second, Seq("doc_id"))
      .select((col("pred") === col("actual")).as("correct"),
        round((col("s1") - col("s2")) * 1e6, 0).cast("long").as("mfp"))
      .withColumn("bin",
        least(expr(s"mfp DIV $binWidthFp"), lit(maxBin.toLong))
          .cast("int"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("n_correct"),
        sum(col("mfp")).as("sm"))
      .select(col("bin"), col("n_docs"), col("n_correct"),
        round(col("n_correct").cast("double")
          / col("n_docs").cast("double"), 6).as("accuracy"),
        round(col("sm").cast("double")
          / col("n_docs").cast("double") / 1e6, 6).as("mean_margin"))
  }

  /** ONE-VS-REST AUC per class for the trained classifier — the
    * threshold-free ranking quality beside [[naiveBayes]]'s point
    * accuracy and [[nbCalibration]]'s reliability: for each class c,
    * rank every test doc by its c-margin (score(c) minus the best
    * OTHER class's score — the same decision variable the gate
    * thresholds) and read AUC off the Mann-Whitney U identity
    *
    *   AUC = (Σ_{positives} midrank − n₊(n₊+1)/2) / (n₊ · n₋)
    *
    * with ties at the exact DOUBLED midrank (the [[graft.query
    * .Analytics]] mannWhitney r₂ device — 2·rank + tiecount − 1), so
    * everything is exact integers until the one division. Margins
    * are snapped once to 1e-6 fixed point ([[nbCalibration]]'s
    * discipline). Gini = 2·AUC − 1 rides along.
    *
    * Scale shape: [[rankedScores]]' chain (materialized once), two
    * doc-keyed joins, then rank windows PARTITIONED by class — the
    * same |segment|-sized rank-window shape as mannWhitney/spearman
    * (per-class partitions are test-split-sized; at corpus scale the
    * standard move is scoring a held-out sample, which this operator
    * inherits from its input slice).
    */
  def nbAuc(docs: DataFrame, labelCol: String = "lang",
            testMod: Int = 5): DataFrame = {
    val ranked = rankedScores(docs, labelCol, testMod)
      .localCheckpoint(false)
    val m1 = ranked.filter(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("a1"), col("score").as("s1"))
    val m2 = ranked.filter(col("rk") === 2)
      .select(col("doc_id"), col("score").as("s2"))
    val marg = ranked.join(m1, Seq("doc_id")).join(m2, Seq("doc_id"))
      .select(col("cls"), (col("actual") === col("cls")).as("y"),
        round(when(col("cls") === col("a1"), col("score") - col("s2"))
          .otherwise(col("score") - col("s1")) * lit(1e6), 0)
          .cast("long").as("sfp"))
    val r2 = (lit(2L) * rank().over(
      Window.partitionBy(col("cls")).orderBy(col("sfp")))
      + count(lit(1)).over(Window.partitionBy(col("cls"), col("sfp")))
      - 1L)
    val auc = ((col("spos2") - col("n_pos") * (col("n_pos") + 1L))
      .cast("double")
      / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
    marg.withColumn("r2", r2)
      .groupBy(col("cls"))
      .agg(sum(when(col("y"), col("r2")).otherwise(0L)).as("spos2"),
        sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("y"), 0L).otherwise(1L)).as("n_neg"))
      .select(col("cls"), col("n_pos"), col("n_neg"),
        round(when(col("n_pos") > 0L && col("n_neg") > 0L, auc), 6)
          .as("auc"),
        round(when(col("n_pos") > 0L && col("n_neg") > 0L,
          lit(2.0) * auc - lit(1.0)), 6).as("gini"))
  }

  /** ISOTONIC CALIBRATION of the [[nbCalibration]] reliability bins
    * (Zadrozny & Elkan '02 — the calibration map that only assumes
    * monotonicity): fit the least-squares MONOTONE accuracy curve
    * over the margin bins via the MINIMAX closed form
    *
    *   ŷ_j = max_{i≤j} min_{k≥j} (C_k − C_{i−1}) / (N_k − N_{i−1})
    *
    * (C/N cumulative correct/count) — the pool-adjacent-violators
    * solution WITHOUT the sequential pooling loop, which is what
    * makes it a fixed plan AND a plain SQL twin: with B ≤ 10 bins
    * the (i, j, k) enumeration is ≤ B³ rows of exact-integer-ratio
    * doubles, and min/max over identical doubles is engine-exact.
    *
    * Scale shape: everything after the (corpus-sized) bin build runs
    * on ≤ B-row frames — the windows and inequality joins are
    * constant-bounded by construction.
    */
  def isotonicCalibration(docs: DataFrame, labelCol: String = "lang",
                          testMod: Int = 5): DataFrame =
    isotonicFit(nbCalibration(docs, labelCol, testMod)
      .localCheckpoint(false))

  /** The minimax fit over an arbitrary (bin, n_docs, n_correct,
    * accuracy) bin frame — exposed for direct unit anchoring.
    */
  private[graft] def isotonicFit(calib: DataFrame): DataFrame = {
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.orderBy(col("bin"))
    val cum = calib.select(col("bin"),
        sum(col("n_docs")).over(wCum).as("nc"),
        sum(col("n_correct")).over(wCum).as("cc"))
      .localCheckpoint(false)
    val lo = cum.select(col("bin").as("i"),
      coalesce(lag(col("nc"), 1).over(wLag), lit(0L)).as("n0"),
      coalesce(lag(col("cc"), 1).over(wLag), lit(0L)).as("c0"))
    val pairs = lo.join(broadcast(cum.select(col("bin").as("k"),
        col("nc"), col("cc"))), col("i") <= col("k"))
      .select(col("i"), col("k"),
        ((col("cc") - col("c0")).cast("double")
          / (col("nc") - col("n0")).cast("double")).as("avg"))
    val iso = calib.select(col("bin").as("j"))
      .join(broadcast(pairs), col("i") <= col("j") && col("k") >= col("j"))
      .groupBy(col("j"), col("i")).agg(min(col("avg")).as("minavg"))
      .groupBy(col("j")).agg(max(col("minavg")).as("cal"))
    calib.join(iso.withColumnRenamed("j", "bin"), Seq("bin"))
      .select(col("bin"), col("n_docs"), col("accuracy"),
        round(col("cal"), 6).as("calibrated"))
  }

  /** CONFIDENT-LEARNING label-noise matrix (Northcutt, Jiang & Chuang
    * '21): estimate WHICH labels are wrong by counting docs into
    * C[given label i][confident class j], where a doc counts for
    * class j only when its self-confidence for j clears the
    * CLASS-TYPICAL threshold t_j (the mean self-confidence of docs
    * labeled j). Off-diagonal cells are the suspected-mislabel mass —
    * the triage queue a labeled-data pipeline re-reviews first.
    *
    * Self-confidence is the MARGIN variant (cleanlab's normalized-
    * margin ranking), not the softmax probability: m_j = score_j −
    * max_{k≠j} score_k, i.e. the argmax margin for the top class and
    * −(deficit to the top) for the rest. Softmax would put a
    * cross-engine exp() on the surface; the margin is the same
    * decision variable with none (the [[nbCalibration]] argument),
    * and the CL framework is agnostic to the self-confidence choice.
    *
    * DETERMINISM: margins snap once to 1e-6 fixed point; thresholds
    * stay RATIONAL (Σfp, n) and the clearing test cross-multiplies
    * (fp·n ≥ Σfp) — no float mean anywhere; the per-doc confident
    * class is an integer argmax with the (fp DESC, cls ASC)
    * tie-break. Docs clearing no threshold are skipped (the CL
    * convention).
    *
    * Scale shape: [[rankedScores]]' chain (materialized once), two
    * doc-keyed joins to attach s1/s2, one |C|-row threshold aggregate
    * broadcast back, a doc-partitioned argmax window, one |C|²-row
    * count. Output: (label, pred_class, n_docs, suspect).
    */
  def labelNoise(docs: DataFrame, labelCol: String = "lang",
                 testMod: Int = 5): DataFrame = {
    val ranked = rankedScores(docs, labelCol, testMod)
      .localCheckpoint(false)
    val s1 = ranked.filter(col("rk") === 1)
      .select(col("doc_id"), col("cls").as("top_cls"),
        col("score").as("s1"))
    val s2 = ranked.filter(col("rk") === 2)
      .select(col("doc_id"), col("score").as("s2"))
    val rel = ranked.join(s1, Seq("doc_id")).join(s2, Seq("doc_id"))
      .select(col("doc_id"), col("actual"), col("cls"),
        round(when(col("cls") === col("top_cls"),
            col("score") - col("s2"))
          .otherwise(col("score") - col("s1")) * 1e6, 0)
          .cast("long").as("fp"))
    val th = rel.filter(col("actual") === col("cls"))
      .groupBy(col("cls"))
      .agg(sum(col("fp")).as("sfp"), count(lit(1)).as("n_lbl"))
    val qual = rel.join(broadcast(th), Seq("cls"))
      .filter(col("fp") * col("n_lbl") >= col("sfp"))
    val pick = qual.withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("fp").desc, col("cls").asc)))
      .filter(col("rn") === 1)
    pick.groupBy(col("actual").as("label"),
        col("cls").as("pred_class"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("suspect", col("label") =!= col("pred_class"))
  }

  /** PER-CLASS precision / recall / F1 over any (pred, actual) frame —
    * the held-out evaluation read that decides whether a trained
    * filter ships (pairs with the corpus-level chance-corrected
    * [[graft.query.Analytics.cohenKappa]]: κ says "better than
    * chance", this says WHERE it fails). One confusion aggregate:
    * per class, tp / predicted-count / actual-count, then the three
    * ratios; absent denominators yield 0 by convention (the
    * scikit-learn zero_division=0 behavior), not NULL/NaN.
    *
    * DETERMINISM: integer counts; each ratio is one rounded division;
    * F1 composed from the UNROUNDED p and r (2·p·r/(p+r)) and rounded
    * once at the edge — identical trees both engines.
    *
    * Scale shape: classes-present = the union of pred and actual
    * domains (|C| rows); three keyed count aggregates over the
    * verdict frame joined back on the class key. The verdict frame is
    * evaluation-set-sized, never the corpus.
    */
  def classifierEval(verdicts: DataFrame): DataFrame = {
    val classes = verdicts.select(col("pred").as("cls"))
      .unionByName(verdicts.select(col("actual").as("cls"))).distinct()
    val tp = verdicts.filter(col("pred") === col("actual"))
      .groupBy(col("pred").as("cls")).agg(count(lit(1)).as("n_tp"))
    val np = verdicts.groupBy(col("pred").as("cls"))
      .agg(count(lit(1)).as("n_pred"))
    val na = verdicts.groupBy(col("actual").as("cls"))
      .agg(count(lit(1)).as("n_actual"))
    val j = classes
      .join(tp, Seq("cls"), "left").join(np, Seq("cls"), "left")
      .join(na, Seq("cls"), "left")
      .select(col("cls"), coalesce(col("n_tp"), lit(0L)).as("n_tp"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"))
    val p = when(col("n_pred") > 0,
      col("n_tp").cast("double") / col("n_pred").cast("double"))
      .otherwise(lit(0.0))
    val r = when(col("n_actual") > 0,
      col("n_tp").cast("double") / col("n_actual").cast("double"))
      .otherwise(lit(0.0))
    j.select(col("cls"), col("n_tp"), col("n_pred"), col("n_actual"),
      round(p, 6).as("precision"), round(r, 6).as("recall"),
      round(when(p + r > 0, lit(2.0) * p * r / (p + r))
        .otherwise(lit(0.0)), 6).as("f1"))
  }

  /** χ² FEATURE SELECTION (the Yang & Pedersen '97 ranking) — the
    * step BEFORE the classifier: per label, the tokens whose document
    * presence is most dependent on the label, by the 2×2 contingency
    * χ² with one degree of freedom:
    *
    *   χ²(t, c) = N·(ad − bc)² / (n_c·(N − n_c)·g·(N − g))
    *
    * (a = docs in c with t, g = global docs with t, n_c = docs in c;
    * b, c, d follow). Distinct from the Dirichlet log-odds
    * distinctive terms: χ² measures association strength on the
    * document-presence contingency, not frequency prominence. Only
    * PRESENT (label, token) pairs are scored — the standard sparse
    * implementation; a term's conspicuous absence from a label
    * surfaces through its high χ² on the labels it concentrates in.
    *
    * Exactness: a, g, n_c, N are exact integer DOCUMENT counts
    * (presence, not frequency); ad − bc is an exact long; the square
    * and the single division run in doubles through one shared tree
    * (cross-engine identical on identical integers). The per-label
    * top-k ranks on that exact quotient with the token tie-break and
    * emits the 6-dp rounding.
    *
    * Scale shape: one distinct (doc, label, token) projection, two
    * keyed aggregates ((label, token) and token), vocabulary-sized
    * frames after that; the rank window partitions by label.
    */
  def chi2Features(docs: DataFrame, labelCol: String = "lang",
                   minDf: Int = 5, k: Int = 10): DataFrame = {
    val items = docs
      .select(col("doc_id"), col(labelCol).as("label"),
        explode(array_distinct(split(col("text"), " "))).as("token"))
      .distinct()
    val nDocs = docs.agg(count(lit(1)).as("nn"))
    val perLabel = docs.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("n_c"))
    val global = items.groupBy(col("token"))
      .agg(count(lit(1)).as("g"))
      .filter(col("g") >= minDf)
    val a = items.join(global, Seq("token"))
      .groupBy(col("label"), col("token"))
      .agg(count(lit(1)).as("a"))
    val scored = a
      .join(global, Seq("token"))
      .join(perLabel, Seq("label"))
      .crossJoin(broadcast(nDocs))
      .withColumn("adbc",
        (col("a") * (col("nn") - col("n_c") - col("g") + col("a"))
          - (col("n_c") - col("a")) * (col("g") - col("a")))
          .cast("double"))
      .withColumn("chi2_raw",
        // g = N (token everywhere) or n_c = N (one label) zeroes the
        // denominator with a zero numerator — independence, chi2 0.
        when(col("nn") > col("g") && col("nn") > col("n_c"),
          col("nn").cast("double") * col("adbc") * col("adbc")
            / (col("n_c").cast("double")
              * (col("nn") - col("n_c")).cast("double")
              * col("g").cast("double")
              * (col("nn") - col("g")).cast("double")))
          .otherwise(lit(0.0)))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("label"))
          .orderBy(col("chi2_raw").desc, col("token").asc)))
      .filter(col("rnk") <= k)
      .select(col("label"), col("token"), col("a").as("df_label"),
        col("g").as("df_global"), col("rnk"),
        round(col("chi2_raw"), 6).as("chi2"))
  }
}
