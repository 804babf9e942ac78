package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution — blocked approximate string matching of a
  * dirty feed against a clean catalog (the record-linkage shape every
  * ingest pipeline grows once upstream systems disagree on spelling):
  *
  *   1. BLOCK: candidate pairs only within small blocks keyed by cheap
  *      string features — here the union of TWO keys (first three
  *      chars, last three chars, both lowercased). Multi-key blocking
  *      is the standard recall device: a single-character edit can
  *      break one key but (for strings of length ≥ 7) never both, so
  *      every string within edit distance 1 of a probe is guaranteed a
  *      candidate. A length band (|Δlen| ≤ maxDist, implied by the
  *      Levenshtein bound) prunes inside the block join.
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

  /** Blocking keys: first/last THREE lowercased characters. One edit
    * (sub/ins/del) changes the first-3 values only when it touches
    * positions 1..3 and the last-3 values only when it touches the
    * final three positions — for strings of length ≥ 7 no single edit
    * can do both, so EVERY string within edit distance 1 of a probe
    * shares at least one key with it (not just the planted true
    * match). 3 chars over 2 chars is a pure block-size win at the same
    * recall bound.
    */
  private def k1(name: Column): Column = substring(lower(name), 1, 3)
  private def k2(name: Column): Column =
    call_function("right", lower(name), lit(3))

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
    // Verify against DISTINCT catalog names, not catalog rows: entity
    // catalogs repeat name strings heavily (here 20k rows share 64
    // names), and for a fixed name only its minimal key can ever win
    // the (lev, key) tie-break — so one groupBy collapses the verify
    // side to |distinct names| with IDENTICAL output. This is the
    // standard ER dedupe-before-verify device; at scale the same trick
    // applies symmetrically to the probe side (resolve per distinct
    // dirty string, broadcast the answers back onto the feed).
    val cat = catalog.groupBy(col(nameCol))
      .agg(min(col(keyCol)).as("matched_key"))
      .select(col("matched_key"), col(nameCol).as("matched_name"),
        k1(col(nameCol)).as("ck1"), k2(col(nameCol)).as("ck2"))
    val d = dirty.select(col("dirty_id"), col("dirty_name"),
      k1(col("dirty_name")).as("dk1"), k2(col("dirty_name")).as("dk2"))
    // Length band: lev <= maxDist implies |len(s)−len(t)| <= maxDist,
    // so the band is output-identical and kills most of the block
    // BEFORE the O(|s|·|t|) verify.
    val band = abs(length(col("dirty_name")) - length(col("matched_name"))) <=
      maxDist
    val byFirst = d.join(cat, col("dk1") === col("ck1") && band)
    val byLast = d.join(cat, col("dk2") === col("ck2") && band)
    // No distinct on the union: a pair surviving via both keys appears
    // twice, but the per-dirty-id top-1 window cannot pick a different
    // winner because duplicate rows are identical in every ordering
    // column — and skipping the dedup saves a full candidate-volume
    // shuffle (the verify work on the ~duplicated fraction is cheaper
    // than shuffling everything once more).
    byFirst.unionByName(byLast)
      .select(col("dirty_id"), col("dirty_name"),
        col("matched_key"), col("matched_name"))
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

  /** SORTED-NEIGHBORHOOD record linkage (Hernández & Stolfo '95) —
    * the second classic blocking family beside [[resolve]]'s key
    * blocking: union the catalog and the dirty feed, sort within
    * first-character blocks on the lowercased name, and compare only
    * records within `window` positions of each other. A typo that
    * breaks both of [[resolve]]'s block keys can survive here as long
    * as the sort still lands the pair adjacent — the complementary
    * recall surface, which is why production ER runs several passes
    * with different sort keys.
    *
    * Distributed shape: the sliding window is NOT a self-join with a
    * range predicate (quadratic per block) — each record joins its
    * rank+j successor for j ∈ 1..window via ONE equi-join on
    * (block, rank+j) after a j-explode, so candidate volume is
    * exactly |records|·window. The rank window partitions by the
    * block character (the multi-pass SNM device — at 100 TB the sort
    * is block-local, never global); exact Levenshtein only on
    * cross-kind candidates; per-dirty-record best by (lev, key).
    * Output contract matches [[resolve]].
    */
  def sortedNeighborhood(dirty: DataFrame, catalog: DataFrame,
                         keyCol: String, nameCol: String,
                         window: Int = 3, maxDist: Int = 2): DataFrame = {
    val cat = catalog.groupBy(col(nameCol))
      .agg(min(col(keyCol)).as("rid"))
      .select(lit("c").as("kind"), col("rid"), col(nameCol).as("nm"))
    val dd = dirty.select(lit("d").as("kind"),
      col("dirty_id").as("rid"), col("dirty_name").as("nm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk"))
      .orderBy(lower(col("nm")), col("kind"), col("rid"))
    val ranked = cat.unionByName(dd)
      .withColumn("blk", substring(lower(col("nm")), 1, 1))
      .withColumn("rn", row_number().over(w))
      .localCheckpoint(false)
    val cands = ranked
      .withColumn("j", explode(array((1 to window).map(lit(_)): _*)))
      .withColumn("rn2", col("rn") + col("j"))
      .join(ranked.select(col("blk"), col("rn").as("rn2"),
          col("kind").as("kind2"), col("rid").as("rid2"),
          col("nm").as("nm2")),
        Seq("blk", "rn2"))
      .filter(col("kind") =!= col("kind2"))
    val pairs = cands.select(
        when(col("kind") === "d", col("rid")).otherwise(col("rid2"))
          .as("dirty_id"),
        when(col("kind") === "d", col("nm")).otherwise(col("nm2"))
          .as("dirty_name"),
        when(col("kind") === "d", col("rid2")).otherwise(col("rid"))
          .as("matched_key"),
        when(col("kind") === "d", col("nm2")).otherwise(col("nm"))
          .as("matched_name"))
      .withColumn("lev",
        levenshtein(col("dirty_name"), col("matched_name")))
      .filter(col("lev") <= maxDist)
    pairs.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("dirty_id"))
          .orderBy(col("lev"), col("matched_key"))))
      .filter(col("rn") === 1)
      .select(col("dirty_id"), col("dirty_name"), col("matched_key"),
        col("matched_name"), col("lev").cast("int").as("lev"))
  }

  /** Blocked candidate pairs with a FELLEGI-SUNTER comparison vector
    * and a planted-truth label: the same two-key blocking as
    * [[resolve]], but keeping every candidate (deduplicated — the
    * stats below must not double-count pairs surviving via both
    * keys) and the dirty row's ORIGIN name, so is_match is exact
    * ground truth (the catalog name the dirty string was derived
    * from). Comparison fields: first-3 agreement, last-3 agreement,
    * equal length, Levenshtein ≤ 1.
    */
  def fsCandidates(catalog: DataFrame, keyCol: String,
                   nameCol: String): DataFrame = {
    val pos = (col(keyCol) % (length(col(nameCol)) - 2)) + 2
    val dirty = catalog.filter(col(keyCol) % 7 === 0)
      .select(col(keyCol).as("dirty_id"),
        col(nameCol).as("orig_name"),
        concat(substring(col(nameCol), lit(1), pos - 1),
          call_function("substring", col(nameCol), pos + 1))
          .as("dirty_name"))
      .select(col("dirty_id"), col("orig_name"), col("dirty_name"),
        k1(col("dirty_name")).as("dk1"), k2(col("dirty_name")).as("dk2"))
    val cat = catalog.groupBy(col(nameCol))
      .agg(min(col(keyCol)).as("matched_key"))
      .select(col("matched_key"), col(nameCol).as("matched_name"),
        k1(col(nameCol)).as("ck1"), k2(col(nameCol)).as("ck2"))
    val band = abs(length(col("dirty_name"))
      - length(col("matched_name"))) <= 2
    dirty.join(cat, col("dk1") === col("ck1") && band)
      .unionByName(dirty.join(cat, col("dk2") === col("ck2") && band))
      .select(col("dirty_id"), col("orig_name"), col("dirty_name"),
        col("matched_key"), col("matched_name"))
      .distinct()
      .select(col("dirty_id"), col("matched_key"), col("matched_name"),
        (col("matched_name") === col("orig_name")).as("is_match"),
        (k1(col("dirty_name")) === k1(col("matched_name")))
          .cast("long").as("a_first3"),
        (k2(col("dirty_name")) === k2(col("matched_name")))
          .cast("long").as("a_last3"),
        (length(col("dirty_name")) === length(col("matched_name")))
          .cast("long").as("a_len"),
        (levenshtein(col("dirty_name"), col("matched_name")) <= 1)
          .cast("long").as("a_lev1"))
  }

  /** FELLEGI-SUNTER linkage weights ('69, "A theory for record
    * linkage") trained on the planted-truth candidates: per
    * comparison field, m = P(agree | match) and u = P(agree |
    * non-match) with add-half smoothing, and the log-likelihood-ratio
    * weights w_agree = ln(m/u), w_disagree = ln((1−m)/(1−u)) a scorer
    * adds per field. The trainer is INSIDE the differential — both
    * engines estimate m/u from the same candidate set and take the
    * same four lns on 4-row output, nothing data-sized crosses a
    * float fold.
    *
    * Scale shape: the field unpivot is a 4× in-map explode collapsing
    * straight into one keyed aggregate (≤ 4×2 cells per mapper);
    * everything after is closed-form on a 4-row frame.
    */
  def fellegiSunterWeights(catalog: DataFrame, keyCol: String,
                           nameCol: String): DataFrame = {
    val c = fsCandidates(catalog, keyCol, nameCol)
    val unpivoted = c.select(col("is_match"), explode(array(
        struct(lit("first3").as("field"), col("a_first3").as("agree")),
        struct(lit("last3").as("field"), col("a_last3").as("agree")),
        struct(lit("len").as("field"), col("a_len").as("agree")),
        struct(lit("lev1").as("field"), col("a_lev1").as("agree"))))
        .as("fa"))
      .select(col("is_match"), col("fa.field").as("field"),
        col("fa.agree").as("agree"))
    unpivoted.groupBy(col("field")).agg(
        sum(when(col("is_match"), 1L).otherwise(0L)).as("n_match"),
        sum(when(!col("is_match"), 1L).otherwise(0L)).as("n_nonmatch"),
        sum(when(col("is_match"), col("agree")).otherwise(0L))
          .as("am"),
        sum(when(!col("is_match"), col("agree")).otherwise(0L))
          .as("au"))
      .withColumn("m", (col("am").cast("double") + 0.5)
        / (col("n_match").cast("double") + 1.0))
      .withColumn("u", (col("au").cast("double") + 0.5)
        / (col("n_nonmatch").cast("double") + 1.0))
      .select(col("field"), col("n_match"), col("n_nonmatch"),
        round(col("m"), 6).as("m"), round(col("u"), 6).as("u"),
        round(log(col("m") / col("u")), 6).as("w_agree"),
        round(log((lit(1.0) - col("m")) / (lit(1.0) - col("u"))), 6)
          .as("w_disagree"))
  }

  /** The trained weights applied back to the candidates: per-pair
    * F-S score as the INTEGER sum of 1e6 fixed-point field weights
    * (one ln per field on the 4-row weight frame — the fixed-point
    * device keeps the per-pair 4-term addition engine-exact), top-k
    * by the exact (score, dirty_id, matched_key) order, with the
    * planted-truth label riding along as the separation read-out.
    */
  def fellegiSunterScores(catalog: DataFrame, keyCol: String,
                          nameCol: String, k: Int = 20): DataFrame = {
    val c = fsCandidates(catalog, keyCol, nameCol)
    val w = fellegiSunterWeights(catalog, keyCol, nameCol)
      .select(col("field"),
        round(log(col("m") / col("u")) * 1e6).cast("long").as("wa"),
        round(log((lit(1.0) - col("m")) / (lit(1.0) - col("u")))
          * 1e6).cast("long").as("wd"))
      .groupBy().pivot("field", Seq("first3", "last3", "len", "lev1"))
      .agg(first(col("wa")).as("wa"), first(col("wd")).as("wd"))
    c.crossJoin(broadcast(w))
      .withColumn("score_fp",
        col("a_first3") * col("first3_wa")
          + (lit(1L) - col("a_first3")) * col("first3_wd")
          + col("a_last3") * col("last3_wa")
          + (lit(1L) - col("a_last3")) * col("last3_wd")
          + col("a_len") * col("len_wa")
          + (lit(1L) - col("a_len")) * col("len_wd")
          + col("a_lev1") * col("lev1_wa")
          + (lit(1L) - col("a_lev1")) * col("lev1_wd"))
      .orderBy(col("score_fp").desc, col("dirty_id"), col("matched_key"))
      .limit(k)
      .select(col("dirty_id"), col("matched_key"), col("is_match"),
        round(col("score_fp").cast("double") / 1e6, 6).as("fs_score"))
  }
}
