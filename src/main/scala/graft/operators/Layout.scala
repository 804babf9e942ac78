package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the piece of a
  * 100 TB deployment that lives in the WRITER, not the reader: parquet
  * row-group min/max statistics prune a scan only if rows with nearby
  * key values sit in the same row groups. A sort by one key clusters
  * that key perfectly and scatters every other; Z-ORDERING (Morton
  * curve) interleaves the bits of several keys so a range predicate on
  * ANY of them touches O(few) row groups — the same technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a pure Column expression
  * usable with plain `df.repartitionByRange(col).sortWithinPartitions`
  * before any parquet write.
  *
  * The interleave is the classic magic-number bit spread — six
  * constant-shift/mask steps per key, all codegen-friendly integer ops
  * (no UDF, no loop), replicated verbatim by the DuckDB oracle since
  * both engines share 64-bit two's-complement `&`/`|`/`<<` semantics.
  * Keys wider than 32 bits must be range-bucketed first (a z-curve
  * interleaves fixed-width words); this matches how table formats
  * z-order on truncated/bucketed key prefixes.
  */
object Layout {

  /** Spread the low 32 bits of `c` into the even bit positions (0, 2,
    * 4, …, 62) of a long.
    */
  private def spread(c: Column): Column = {
    val x0 = c.bitwiseAND(lit(0xFFFFFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 16))
      .bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 8))
      .bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 4))
      .bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val x4 = x3.bitwiseOR(shiftleft(x3, 2))
      .bitwiseAND(lit(0x3333333333333333L))
    x4.bitwiseOR(shiftleft(x4, 1))
      .bitwiseAND(lit(0x5555555555555555L))
  }

  /** 64-bit Morton code of two 32-bit keys: `a`'s bits land on even
    * positions, `b`'s on odd. Adjacent z-values are adjacent in BOTH
    * keys — the clustering property row-group pruning needs.
    */
  def zorder2(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1))

  /** Hilbert curve index of two keys (order 21; wider keys must be
    * range-bucketed first, as with [[zorder2]]) — the no-diagonal-jump
    * locality layout: a range of the index always covers a tighter key
    * rectangle than the same-length Morton range, so range predicates
    * touch fewer row groups. Backed by the native codegen'd
    * [[graft.expressions.HilbertIndex]] (the xy2d walk is sequential
    * per row — unrolled projections would invite exponential
    * expression inlining; a loop in generated code keeps it one fused
    * call).
    */
  def hilbert2(a: Column, b: Column): Column =
    call_function("graft_hilbert", a.cast("long"), b.cast("long"))

  /** Small-file COMPACTION planner (the lakehouse `OPTIMIZE` bin-pack
    * step): assign contiguously-ordered file stats to target-sized
    * output groups, `bin = floor(cum_bytes_before / target)`. Every
    * bin's total lands in [target·bin, target·(bin+1) + max_file), so
    * output files approximate `targetBytes` without ever moving a file
    * across its partition — rewrites stay partition-local, exactly how
    * Delta/Iceberg compaction schedules rewrite groups.
    *
    * Scale shape: this is a planner over file METADATA (one row per
    * file — a 100 TB table is ~10⁵ rows of stats, not data), so the
    * per-partition window is trivially cheap; the expensive part, the
    * rewrite itself, reads only the files whose bin has >1 member. The
    * window is partitioned by `partCols` — never a global sort.
    *
    * `orderCol` must be a deterministic total order within each
    * partition (file path, commit sequence); cumulative sums over ties
    * would otherwise be plan-dependent.
    */
  def compactionBins(files: DataFrame, partCols: Seq[String],
                     orderCol: String, sizeCol: String,
                     targetBytes: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    files.withColumn("bin",
      floor(coalesce(sum(col(sizeCol)).over(w), lit(0L))
        / lit(targetBytes)).cast("int"))
  }

  /** Append a scale-adaptive zone id: rows are zoned by the TOP
    * `topBits` bits of `layoutKey`'s observed value range (zone =
    * key >> (bitlen(max_key) − topBits)), emulating the row-group /
    * file boundaries a `repartitionByRange(layoutKey)` write would
    * produce. The shift derives from a 1-row broadcast MAX — zone
    * count stays ≈ 2^topBits at ANY data scale, with no global sort
    * and no row_number (the bucket is a pure value function, so two
    * engines agree bit-for-bit). All-integer arithmetic: the divisor
    * is `shiftleft(1L, shift)`, never a double `pow`.
    */
  private def zoned(df: DataFrame, layoutKey: Column,
                    topBits: Int): DataFrame = {
    val keyed = df.withColumn("zm_key", layoutKey.cast("long"))
    val mx = keyed.agg(max(col("zm_key")).as("zm_max"))
    keyed.crossJoin(broadcast(mx)).withColumn("bucket",
      expr(s"zm_key div shiftleft(CAST(1 AS BIGINT), " +
        s"greatest(0, length(bin(zm_max)) - $topBits))"))
  }

  /** ZONE MAP (min/max statistics index) over a layout key — the
    * writer-side stats table behind parquet row-group / Delta file
    * skipping: one row per zone with row count and per-column min/max.
    * A reader prunes a zone when its [min, max] box cannot intersect
    * the predicate — which only WORKS if the layout key clusters the
    * stat columns (the point of [[zorder2]]).
    *
    * Scale shape: one keyed aggregate over the scan; the output is
    * zone-count-sized (≈ 2^topBits rows) — metadata, not data. At
    * 100 TB this frame IS the skipping index a planner broadcasts.
    */
  def zoneMap(df: DataFrame, layoutKey: Column, statCols: Seq[String],
              topBits: Int = 8): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: statCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    zoned(df, layoutKey, topBits)
      .groupBy(col("bucket"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Data-skipping EFFECTIVENESS summary for a 2-d box predicate
    * (`aLo ≤ a ≤ aHi AND bLo ≤ b ≤ bHi`) under a given layout: builds
    * the [[zoneMap]], keeps the zones whose min/max boxes intersect
    * the predicate box, and reports one row —
    * (layout, n_buckets, n_candidates, rows_total, rows_scanned,
    * rows_matched). `rows_scanned` is what a pruning reader pays;
    * `rows_matched` (computed from the data, not the stats) proves
    * skipped zones held no matches — pruning is output-transparent by
    * construction, and the differential gates exactly that.
    *
    * Run once with the natural layout key and once with [[zorder2]] to
    * measure the z-curve's pruning win — the number that justifies an
    * OPTIMIZE ZORDER rewrite before paying for one.
    */
  def zonePruneSummary(df: DataFrame, layoutName: String,
                       layoutKey: Column,
                       a: String, aLo: Long, aHi: Long,
                       b: String, bLo: Long, bHi: Long,
                       topBits: Int = 8): DataFrame = {
    val zm = zoneMap(df, layoutKey, Seq(a, b), topBits)
    val cand = !(col(s"max_$a") < aLo || col(s"min_$a") > aHi ||
      col(s"max_$b") < bLo || col(s"min_$b") > bHi)
    val summary = zm.agg(
      count(lit(1)).as("n_buckets"),
      sum(when(cand, 1L).otherwise(0L)).as("n_candidates"),
      sum(col("n_rows")).as("rows_total"),
      sum(when(cand, col("n_rows")).otherwise(0L)).as("rows_scanned"))
    val matched = df
      .filter(col(a).between(aLo, aHi) && col(b).between(bLo, bHi))
      .agg(count(lit(1)).as("rows_matched"))
    summary.crossJoin(broadcast(matched))
      .select(lit(layoutName).as("layout"), col("n_buckets"),
        col("n_candidates"), col("rows_total"), col("rows_scanned"),
        col("rows_matched"))
  }

  /** RANGE-PARTITION boundary planner — the writer-side half of a
    * 100 TB global sort (Spark's own `RangePartitioner` shape, made
    * deterministic and sortless): pick `parts`−1 boundary values so
    * that sorting rows into [b₀,b₁), [b₁,b₂) … yields near-equal
    * partitions, then AUDIT the plan against the actual data — per
    * planned partition its row count, key bounds, and balance ratio
    * (n·parts/N; 1.0 = ideal, 2.0 = a straggler holding twice its
    * share). This is the number you read before committing to a
    * `repartitionByRange` of a 100 TB table: a bad key (heavy ties)
    * shows up here as an empty partition next to a fat one, for the
    * cost of one aggregate instead of a failed 6-hour sort.
    *
    * Boundaries come from the HDR bin-count sketch
    * ([[Sketch.hdrQuantiles]]'s integer-exact bin chain), NOT a
    * sample sort: one keyed aggregate to ≤ ~16·64 bin cells, windows
    * only over that bounded cell frame, boundary ranks in pure
    * integer arithmetic (⌈i·N/parts⌉ as `(i·N + parts−1) div parts` —
    * exact for any N, no double division). Each row's partition is
    * then 1 + |{boundary bins < its bin}|, a broadcast array fold —
    * the whole planner never sorts or shuffles anything value-shaped.
    * Ties share a bin, so a duplicated boundary (heavy skew) yields
    * deliberately-empty ranges — visible in the audit as balance 0.
    */
  def rangePlan(df: DataFrame, valueCol: String,
                parts: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    require(parts >= 2, "a range plan needs at least 2 partitions")
    val vcRaw = (col(valueCol).cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val d = df.filter(vcRaw >= 1).select(vcRaw.as("vc"))
      .withColumn("bin", Sketch.hdrBinCol(col("vc")))
    val counts = d.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val bounds = counts
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy(col("bin"))))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy()))
      .withColumn("i", explode(sequence(lit(1), lit(parts - 1))))
      .withColumn("rank", expr(s"(i * n + ${parts - 1}) div $parts"))
      .filter(col("cum") >= col("rank"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("i")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
      .agg(sort_array(collect_list(col("bin"))).as("bs"))
    val nrow = d.agg(count(lit(1)).as("n"))
    d.crossJoin(broadcast(bounds))
      .select(col("vc"),
        (size(filter(col("bs"), b => col("bin") > b)) + 1).as("pid"))
      .groupBy(col("pid"))
      .agg(count(lit(1)).as("n_rows"), min(col("vc")).as("min_cents"),
        max(col("vc")).as("max_cents"))
      .crossJoin(broadcast(nrow))
      .select(col("pid"), col("n_rows"), col("min_cents"),
        col("max_cents"),
        round((col("n_rows") * lit(parts.toLong)).cast("double") /
          col("n").cast("double"), 6).as("balance"))
  }
}
