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
}
