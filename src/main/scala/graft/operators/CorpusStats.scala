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
}
