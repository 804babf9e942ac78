package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deterministic Bloom-filter membership — the incremental-ingest dedup
  * primitive: "which of today's crawl keys might already be in the
  * trillion-row index?" answered WITHOUT joining the index, by building
  * a fixed-size bit array over the index keys once and broadcasting it.
  *
  * Everything is md5-derived (TextOps.fingerprint64 idiom), no RNG and
  * no engine-private hash, so the filter's exact bit pattern — and
  * therefore every probe verdict, false positives included — is
  * reproducible in any engine with md5: the whole build+probe pipeline
  * carries a row-level DuckDB differential.
  *
  * Representation: the m-bit array lives as a DataFrame of 32-bit words
  * `(word_idx, bits)` — only non-zero words are materialized. Build is
  * one explode + keyed `bit_or` aggregate (map-side partials OR
  * per-partition sub-filters — the classic distributed Bloom build);
  * probe explodes each key's k positions, broadcast-joins the word
  * table, and AND-reduces the bit tests. At m = 2²⁶ the dense word
  * table is 16 MB — broadcastable; the index itself never shuffles.
  * 32 bits per word, not 64: the oracle engine's left shift is
  * range-checked, and 1 << 63 (the sign bit) overflows there — five
  * shift bits keep every mask positive in both engines.
  *
  * Sizing (standard formulas): fpp ≈ (1 − e^(−k·n/m))^k; for a target
  * fpp use m ≈ −n·ln(fpp)/ln²2 and k ≈ (m/n)·ln 2.
  *
  * No false negatives ever (a present key's bits are all set by
  * construction); false positives at the designed rate — the caller
  * treats "maybe" as "verify exactly", e.g. via [[Dedup.exactGroups]]
  * on the maybe-set only.
  */
object Bloom {

  /** The k md5-derived bit positions of a key (salted per hash fn). */
  def bitPositions(key: Column, mBits: Int, kHashes: Int): Column =
    array((0 until kHashes).map(i =>
      pmod(TextOps.fingerprint64(
        concat(key.cast("string"), lit(s":bloom$i"))), lit(mBits.toLong))): _*)

  /** Build the filter over `keys(keyCol)` → (word_idx: long, bits: long),
    * non-zero words only.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Int = 1 << 20,
            kHashes: Int = 4): DataFrame =
    keys
      .select(explode(bitPositions(col(keyCol), mBits, kHashes)).as("p"))
      .select(shiftright(col("p"), 5).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("m"))
      .groupBy(col("word_idx"))
      .agg(bit_or(col("m")).as("bits"))

  /** Probe: (key, maybe_present) — one row per DISTINCT key of
    * `keys(keyCol)` (the groupBy that AND-reduces the bit tests also
    * dedups; a duplicate-keyed probe batch collapses to one verdict,
    * which downstream joins re-attach by key, not position).
    * `words` must come from [[build]] with the SAME mBits/kHashes.
    */
  def probe(keys: DataFrame, keyCol: String, words: DataFrame,
            mBits: Int = 1 << 20, kHashes: Int = 4): DataFrame =
    keys
      .select(col(keyCol).as("key"),
        explode(bitPositions(col(keyCol), mBits, kHashes)).as("p"))
      .select(col("key"), shiftright(col("p"), 5).as("word_idx"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("m"))
      .join(broadcast(words), Seq("word_idx"), "left")
      .groupBy(col("key"))
      .agg((sum(when(coalesce(col("bits"), lit(0L))
          .bitwiseAND(col("m")) =!= 0, 0).otherwise(1)) === 0)
        .as("maybe_present"))

  /** The sparse (word_idx, bits) filter as ONE dense word-array row —
    * the broadcastable artifact [[filteredJoin]] probes per fact row
    * without exploding or re-grouping the fact side.
    */
  def denseWords(words: DataFrame, mBits: Int): DataFrame =
    words
      .groupBy()
      .agg(map_from_arrays(collect_list(col("word_idx")),
        collect_list(col("bits"))).as("wm"))
      .select(transform(sequence(lit(0L), lit((mBits >> 5) - 1L)),
        i => coalesce(element_at(col("wm"), i), lit(0L))).as("bloom_words"))

  /** RUNTIME-FILTER join — Spark's own bloom runtime filter
    * (spark.sql.optimizer.runtime.bloomFilter), made explicit and
    * deterministic: build the filter over the dim join keys, broadcast
    * it as one dense word array, and drop fact rows that cannot join
    * BEFORE the join's shuffle. Output is provably the plain inner
    * join: a true-joining fact row passes (no false negatives, by
    * construction), and a false-positive survivor is eliminated by the
    * join itself — the filter changes shuffle VOLUME only, which is
    * the entire point at 100 TB when the fact side is huge, the dim
    * side is too big to broadcast whole (so the join must shuffle
    * both sides), but the dim KEY SET compresses into an m-bit filter.
    * With a selective dim predicate, the fact shuffle shrinks by the
    * filter's pass rate; the m-bit probe costs k md5s per row,
    * map-side, in whole-stage codegen.
    *
    * The join is hinted shuffle-hash on the dim side — the
    * not-broadcastable scenario this operator exists for; at real
    * scale AQE may still pick better strategies per partition.
    */
  /** [[filteredJoin]] with the filter SIZED FROM THE KEY SET — the
    * scale-robust catalog form (r8: the sf1 probe measured the fixed
    * 64 Kbit filter's pass rate collapsing as the key count grew 10×;
    * a bloom filter's false-positive rate is a function of BITS PER
    * KEY, so m must scale with |keys| or the prefilter silently decays
    * into a no-op that still costs k md5s per fact row). One
    * dim-side count sizes m at ~`bitsPerKey` bits/key (10 bits/key ≈
    * 1% FP at k=4), rounded up to a power of two, floored at 64 Kbit
    * and capped at 2²⁷ bits = 16 MB — past the cap the right move is
    * the next bitsPerKey budget down, never a bigger broadcast. The
    * count is dim-bounded by this operator's own premise (the dim KEY
    * SET compresses; the dim itself may not broadcast). Output is the
    * plain inner join either way — sizing changes shuffle volume only.
    */
  def filteredJoinAuto(fact: DataFrame, factKey: String,
                       dim: DataFrame, dimKey: String,
                       bitsPerKey: Int = 10, kHashes: Int = 4): DataFrame = {
    val n = dim.count()
    val wanted = java.lang.Long.highestOneBit(
      math.max(1L, n * bitsPerKey) * 2 - 1)
    val mBits = math.min(math.max(wanted, 1L << 16), 1L << 27).toInt
    filteredJoin(fact, factKey, dim, dimKey, mBits, kHashes)
  }

  def filteredJoin(fact: DataFrame, factKey: String,
                   dim: DataFrame, dimKey: String,
                   mBits: Int = 1 << 20, kHashes: Int = 4): DataFrame = {
    val dense = denseWords(build(dim, dimKey, mBits, kHashes), mBits)
    val passes = forall(bitPositions(col(factKey), mBits, kHashes),
      p => element_at(col("bloom_words"),
          (shiftright(p, 5) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(p, lit(32L)).cast("int")))
        =!= 0)
    fact.crossJoin(broadcast(dense))
      .filter(passes)
      .drop("bloom_words")
      .join(dim.hint("shuffle_hash"), col(factKey) === col(dimKey))
  }
}
