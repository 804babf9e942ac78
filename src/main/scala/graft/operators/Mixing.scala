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
}
