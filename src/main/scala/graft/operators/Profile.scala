package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-level data-quality profiling — the one-pass pre-flight every
  * large ingest runs before committing a 100 TB table: per-column
  * row/null/distinct counts and value bounds, the numbers that back
  * schema drift alarms, join-key sanity checks (is the FK domain what
  * the dimension promises?), and partition-planner inputs.
  */
object Profile {

  /** Per-column profile of integer key/measure columns: one row per
    * column — (column, n_rows, n_null, n_distinct, min_val, max_val).
    *
    * Scale shape: ONE aggregate over ONE scan closes every metric for
    * every column at once — the scan is the whole cost at 100 TB, so
    * the profiler must never pay it per column. The multiple exact
    * COUNT(DISTINCT) land in a single Expand-based aggregate
    * (Catalyst's standard multi-distinct plan: the scan is read once,
    * expanded |cols| ways, each leg partially aggregated map-side);
    * swap in HLL/KMV sketch columns from [[Sketch]] on the same plan
    * when approximate distincts suffice. The per-column rows come from
    * exploding a literal struct array over the single aggregate row —
    * driver-free, |cols| rows total.
    */
  def keyColumnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"cnt_$c"),
      countDistinct(col(c)).as(s"nd_$c"),
      min(col(c)).cast("long").as(s"min_$c"),
      max(col(c)).cast("long").as(s"max_$c")))
    val all = count(lit(1)).as("n_rows") +: aggs
    val one = df.agg(all.head, all.tail: _*)
    val rows = cols.map(c => struct(
      lit(c).as("column"),
      col("n_rows"),
      (col("n_rows") - col(s"cnt_$c")).as("n_null"),
      col(s"nd_$c").as("n_distinct"),
      col(s"min_$c").as("min_val"),
      col(s"max_$c").as("max_val")))
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Referential-integrity audit — per foreign key, how many fact rows
    * reference a key absent from its dimension (the orphan count every
    * warehouse ingest checks before exposing a join, and the number
    * that catches a partial dimension load or a key-domain drift).
    * One row per audited FK: (fk, n_rows, n_orphans).
    *
    * Scale shape: each leg is a single-column scan of the fact (column
    * -pruned parquet read) + ONE broadcast left join against the
    * dimension's distinct key set + one two-cell aggregate — the fact
    * never shuffles. Dimensions are broadcast-sized by definition
    * here; a fact-sized "dimension" would swap the broadcast for a
    * keyed left join on the same plan (or a [[Bloom]] probe when an
    * approximate audit suffices).
    */
  def fkOrphanAudit(fact: DataFrame,
                    fks: Seq[(String, DataFrame, String)]): DataFrame =
    fks.map { case (fkCol, dim, pkCol) =>
      fact.select(col(fkCol).as("fk_val"))
        .join(broadcast(dim.select(col(pkCol).as("fk_val")).distinct()
          .withColumn("present", lit(1))), Seq("fk_val"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("present").isNull, 1L).otherwise(0L))
            .as("n_orphans"))
        .select(lit(fkCol).as("fk"), col("n_rows"), col("n_orphans"))
    }.reduce(_ unionByName _)

  /** PSI DISTRIBUTION DRIFT — the population stability index, the
    * standard "did this feature's distribution move between snapshots"
    * monitor (banking scorecard lineage; the same number ML feature
    * stores alarm on): over fixed equal-width bins,
    * PSI = Σ_bins (p_curr − p_prev) · ln(p_curr / p_prev), with
    * add-one count smoothing so empty bins stay finite — rule of
    * thumb: < 0.1 stable, > 0.25 shifted enough to investigate.
    * Complements [[graft.operators.Similarity.embeddingDrift]] (per-ID
    * vector drift): PSI sees POPULATION moves with no id alignment.
    *
    * DETERMINISM: fixed bin edges (never data-derived quantiles —
    * cross-snapshot comparability requires frozen bins), integer
    * counts, smoothed shares (n+1)/(N+bins) as doubles with a mirrored
    * operation tree, and the PSI total folded over bins in BIN ORDER
    * (a ≤nBins-element sorted fold). Rounding only at the output edge.
    *
    * Scale shape: one keyed count aggregate per snapshot (map-side
    * combinable), densified against an nBins-row literal range; totals
    * and the PSI sum are 1-row broadcasts. The scans dominate;
    * everything after is bin-count-sized.
    */
  def psiDrift(prev: DataFrame, curr: DataFrame, valueCol: String,
               binWidth: Long = 100, nBins: Int = 10): DataFrame = {
    val bins = prev.sparkSession.range(nBins.toLong)
      .select(col("id").cast("int").as("bin"))
    def hist(df: DataFrame, as: String) = bins.join(
      df.select(least(floor(col(valueCol) / binWidth),
          lit(nBins - 1)).cast("int").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(as)),
      Seq("bin"), "left")
      .select(col("bin"), coalesce(col(as), lit(0L)).as(as))
    val h = hist(prev, "n_prev").join(hist(curr, "n_curr"), Seq("bin"))
    val tot = h.agg(sum(col("n_prev")).as("tp"),
      sum(col("n_curr")).as("tc"))
    val shares = h.crossJoin(broadcast(tot))
      .select(col("bin"), col("n_prev"), col("n_curr"),
        ((col("n_prev") + 1).cast("double") /
          (col("tp") + nBins).cast("double")).as("p_prev"),
        ((col("n_curr") + 1).cast("double") /
          (col("tc") + nBins).cast("double")).as("p_curr"))
      .withColumn("contrib",
        (col("p_curr") - col("p_prev")) *
          log(col("p_curr") / col("p_prev")))
    val psi = shares
      .agg(array_sort(collect_list(struct(col("bin"), col("contrib"))))
        .as("parts"))
      .select(aggregate(transform(col("parts"), _.getField("contrib")),
        lit(0.0), _ + _).as("psi"))
    shares.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_prev"), col("n_curr"),
        round(col("p_prev"), 6).as("p_prev"),
        round(col("p_curr"), 6).as("p_curr"),
        round(col("contrib"), 6).as("contrib"),
        round(col("psi"), 6).as("psi"))
  }

  /** PSI TIMELINE — [[psiDrift]] unrolled over time: the
    * population stability index of the event-value distribution for
    * EVERY epoch-week period against the first period (integer
    * epoch-day DIV 7 — an engine-exact grain, unlike locale-bound
    * week-of-year strings), one row per period — the
    * drift monitor as a monitored time series rather than a
    * two-snapshot compare (the shape a feature-store dashboard
    * actually plots). Same frozen equal-width bins, add-one
    * smoothing, and bin-ordered fold as the pairwise operator; the
    * reference period's own PSI is exactly 0.
    *
    * Scale shape: one (period, bin) keyed count over the scan,
    * densified against the periods × nBins literal grid (both
    * calendar/constant-bounded), a broadcast of the 10-row reference
    * histogram, and a per-period ≤nBins fold. Output is |periods|
    * rows.
    */
  def psiTimeline(events: DataFrame, binWidth: Double = 50.0,
                  nBins: Int = 10): DataFrame = {
    val base = events.select(
      expr("CAST(datediff(to_date(ts), DATE '1970-01-01') DIV 7 " +
        "AS INT)").as("period"),
      least(greatest(floor(col("value") / binWidth), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("int").as("bin"))
    val months = base.select(col("period")).distinct()
    val bins = events.sparkSession.range(nBins.toLong)
      .select(col("id").cast("int").as("bin"))
    val dense = months.crossJoin(bins)
      .join(base.groupBy(col("period"), col("bin"))
        .agg(count(lit(1)).as("n")), Seq("period", "bin"), "left")
      .select(col("period"), col("bin"),
        coalesce(col("n"), lit(0L)).as("n"))
    val tot = dense.groupBy(col("period")).agg(sum(col("n")).as("t"))
    val refMonth = months.agg(min(col("period")).as("ref_period"))
    val withP = dense.join(tot, Seq("period"))
      .select(col("period"), col("bin"), col("n"), col("t"),
        ((col("n") + 1).cast("double")
          / (col("t") + nBins).cast("double")).as("p"))
    val ref = withP.crossJoin(broadcast(refMonth))
      .filter(col("period") === col("ref_period"))
      .select(col("bin"), col("p").as("p_ref"))
    withP.join(broadcast(ref), Seq("bin"))
      .withColumn("contrib",
        (col("p") - col("p_ref")) * log(col("p") / col("p_ref")))
      .groupBy(col("period"))
      .agg(max(col("t")).as("n_events"),
        round(aggregate(
          transform(array_sort(collect_list(struct(col("bin"),
            col("contrib")))), _.getField("contrib")),
          lit(0.0), _ + _), 6).as("psi"))
      .withColumn("alert", col("psi") > 0.25)
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic D = max_v |F_a(v) −
    * F_b(v)| between the `valueCol` distributions of the rows where
    * `groupCol` = `aVal` vs `bVal` — the BINLESS drift read beside
    * [[psiDrift]]: PSI needs a bin recipe and saturates on
    * within-bin shifts; KS compares the exact empirical CDFs at every
    * observed value, so it catches any distributional change and its
    * null distribution is the standard table test.
    *
    * The global-CDF problem is the same one `orderBy` at 100 TB has —
    * a cumulative count needs a total order. This uses the two-level
    * prefix sum the token-budget operator established (the
    * scale-safe alternative to one global window): distinct-value
    * counts (one keyed aggregate, |distinct| rows), each value zoned
    * into one of 256 equal-width buckets from a broadcast min/max;
    * per-bucket subtotals (≤256 rows) get their running offsets from
    * a window over that CONSTANT-SIZE frame, and the per-value
    * cumulative is a bucket-partitioned (keyed) window plus the
    * broadcast offset. Offsets + in-bucket cumulatives are exact
    * integer sums, so F_a/F_b are each ONE long/long double division
    * — identical arithmetic to the oracle's plain windowed CDF, and
    * the max over identical per-value doubles is engine-order-free.
    *
    * Scale shape: one scan with indicator columns (both samples in a
    * single pass), one keyed value aggregate, bucket-count-sized
    * frames after that; the only unpartitioned window runs over ≤256
    * rows by construction. Output: 1 row (ks_stat, n_a, n_b).
    */
  def ksDrift(df: DataFrame, valueCol: String, groupCol: String,
              aVal: String, bVal: String,
              nBuckets: Int = 256): DataFrame = {
    val u = df.filter(col(groupCol).isin(aVal, bVal))
      .select(col(valueCol).cast("double").as("v"),
        when(col(groupCol) === aVal, lit(1L)).otherwise(lit(0L)).as("ina"),
        when(col(groupCol) === bVal, lit(1L)).otherwise(lit(0L)).as("inb"))
    val cnts = u.groupBy(col("v"))
      .agg(sum(col("ina")).as("na"), sum(col("inb")).as("nb"))
    val bounds = cnts.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val bucketed = cnts.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        when(col("mx") === col("mn"), lit(0))
          .otherwise(least(
            floor((col("v") - col("mn")) /
              ((col("mx") - col("mn")) / nBuckets)),
            lit(nBuckets - 1).cast("long"))).cast("int"))
      .select(col("v"), col("na"), col("nb"), col("bucket"))
    val bt = bucketed.groupBy(col("bucket"))
      .agg(sum(col("na")).as("ba"), sum(col("nb")).as("bb"))
    val wOff = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bt.select(col("bucket"),
      coalesce(sum(col("ba")).over(wOff), lit(0L)).as("offa"),
      coalesce(sum(col("bb")).over(wOff), lit(0L)).as("offb"))
    val totals = bt.agg(sum(col("ba")).as("ta"), sum(col("bb")).as("tb"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diffs = bucketed.join(broadcast(offs), Seq("bucket"))
      .crossJoin(broadcast(totals))
      .select(
        (((col("offa") + sum(col("na")).over(wIn)).cast("double") /
          col("ta").cast("double")) -
          ((col("offb") + sum(col("nb")).over(wIn)).cast("double") /
            col("tb").cast("double"))).as("d"))
    diffs.agg(max(abs(col("d"))).as("ks"))
      .crossJoin(broadcast(totals))
      .select(round(col("ks"), 6).as("ks_stat"),
        col("ta").as("n_a"), col("tb").as("n_b"))
  }

  /** SHARD DIVERSITY — Shannon entropy (nats) of the source mix inside
    * each [[Shard.rendezvousShard]] shard: the post-routing check that
    * sharding did not accidentally segregate sources (a shard serving
    * one crawl trains a skewed sub-model and hot-spots per-source
    * failures). H near ln(n_sources) = well mixed; near 0 = a
    * single-source shard.
    *
    * Determinism: per-(shard, source) share terms −p·ln p are snapped
    * to 1e-9 fixed point and summed as exact longs (the fixed-point
    * device every ln surface here uses), one division on the
    * shard-count-sized result. Two keyed aggregates + one broadcast
    * join — the corpus is touched once, by the codegen'd shard
    * projection.
    */
  def shardDiversity(docs: DataFrame, srcCol: String = "source",
                     shards: Int = 16): DataFrame = {
    val assigned = docs.select(
      Shard.rendezvousShard(col("doc_id"), shards).as("shard"),
      col(srcCol).as("source"))
    val cs = assigned.groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("c"))
    val per = cs.groupBy(col("shard"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_sources"))
    val p = col("c").cast("double") / col("n").cast("double")
    cs.join(broadcast(per), Seq("shard"))
      .select(col("shard"), col("n"), col("n_sources"),
        round(-(p * log(p)) * 1e9, 0).cast("long").as("term_fp"))
      .groupBy(col("shard"))
      .agg(min(col("n")).as("n_docs"),
        min(col("n_sources")).as("n_sources"),
        round(sum(col("term_fp")).cast("double") / 1e9, 6).as("entropy"))
  }

  /** EMBEDDING NORM profile per label — the vector-hygiene read before
    * any cosine/IP index is trusted: a label whose norms collapse
    * toward 0 (dead encoder head) or spread wildly (mixed
    * normalization) breaks inner-product ranking assumptions. Norms
    * are snapped to 1e-6 fixed point per row (array fold in fixed
    * element order), so the group sums are exact integers; divisions
    * happen once per label row.
    */
  def embedNormProfile(embeddings: DataFrame): DataFrame = {
    val sq = aggregate(
      transform(col("embedding"), x => x.cast("double") * x.cast("double")),
      lit(0.0), _ + _)
    embeddings
      .select(col("label"),
        round(sqrt(sq) * 1e6, 0).cast("long").as("norm_fp"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(sum(col("norm_fp")).cast("double")
          / (count(lit(1)).cast("double") * 1e6), 6).as("mean_norm"),
        round(min(col("norm_fp")).cast("double") / 1e6, 6).as("min_norm"),
        round(max(col("norm_fp")).cast("double") / 1e6, 6).as("max_norm"))
  }
}
