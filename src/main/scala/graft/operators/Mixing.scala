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
}
