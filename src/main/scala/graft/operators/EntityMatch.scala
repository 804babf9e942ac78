package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution — blocked approximate string matching of a
  * dirty feed against a clean catalog (the record-linkage shape every
  * ingest pipeline grows once upstream systems disagree on spelling):
  *
  *   1. BLOCK: candidate pairs only within small blocks keyed by cheap
  *      string features — here the union of TWO keys (first two chars,
  *      last two chars, both lowercased). Multi-key blocking is the
  *      standard recall device: a single-character edit can break one
  *      key but (for strings longer than 4) never both, so every true
  *      match within edit distance 1 of either string end surviving is
  *      guaranteed a candidate.
  *   2. VERIFY: exact Levenshtein distance on the candidates only,
  *      keep pairs within `maxDist`.
  *   3. RESOLVE: best match per dirty record by (distance, key) — a
  *      per-dirty-record top-1 window, deterministic tie-break.
  *
  * The dirty feed is derived from the catalog itself (a deterministic
  * single-character drop keyed on the entity id — never the first or
  * last character, so the multi-key recall argument above applies
  * exactly), making the end-to-end pipeline a pure function of the
  * catalog that the DuckDB oracle replicates; Levenshtein is the same
  * integer DP in both engines, so the entire surface is
  * integer/string-exact — no rounding anywhere.
  *
  * Scale shape: two equi-joins on the block keys (never all-pairs;
  * block sizes are bounded by key selectivity, and a hot block is a
  * data-quality signal, not a plan hazard), a distinct on the union,
  * the O(|s|·|t|) verify only on candidates, and a per-dirty-id top-1
  * window. At 100 TB the catalog side is typically the small one —
  * broadcast it per block key and the dirty stream never shuffles.
  */
object EntityMatch {

  private def k1(name: Column): Column = substring(lower(name), 1, 2)
  private def k2(name: Column): Column =
    call_function("right", lower(name), lit(2))

  /** Deterministic dirty feed: every `every`-th catalog row with one
    * character dropped at 1-based position (key % (len−2)) + 2 — an
    * interior position, never the first or last character.
    */
  def dirtyFeed(catalog: DataFrame, keyCol: String, nameCol: String,
                every: Int = 7): DataFrame = {
    val pos = (col(keyCol) % (length(col(nameCol)) - 2)) + 2
    catalog.filter(col(keyCol) % every === 0)
      .select(col(keyCol).as("dirty_id"),
        concat(substring(col(nameCol), lit(1), pos - 1),
          call_function("substring", col(nameCol), pos + 1)).as("dirty_name"))
  }

  /** (dirty_id, dirty_name, matched_key, matched_name, lev): best
    * catalog match per dirty record within `maxDist` edits.
    */
  def resolve(dirty: DataFrame, catalog: DataFrame, keyCol: String,
              nameCol: String, maxDist: Int = 2): DataFrame = {
    val cat = catalog.select(col(keyCol).as("matched_key"),
      col(nameCol).as("matched_name"),
      k1(col(nameCol)).as("ck1"), k2(col(nameCol)).as("ck2"))
    val d = dirty.select(col("dirty_id"), col("dirty_name"),
      k1(col("dirty_name")).as("dk1"), k2(col("dirty_name")).as("dk2"))
    val byFirst = d.join(cat, col("dk1") === col("ck1"))
    val byLast = d.join(cat, col("dk2") === col("ck2"))
    byFirst.unionByName(byLast)
      .select(col("dirty_id"), col("dirty_name"),
        col("matched_key"), col("matched_name"))
      .distinct()
      .withColumn("lev",
        levenshtein(col("dirty_name"), col("matched_name")))
      .filter(col("lev") <= maxDist)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("dirty_id"))
          .orderBy(col("lev").asc, col("matched_key").asc)))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("dirty_name"), col("matched_key"),
        col("matched_name"), col("lev"))
  }
}
