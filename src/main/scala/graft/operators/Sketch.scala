package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** K-minimum-values (KMV) distinct-count sketch — the deterministic
  * alternative to HLL for cardinality estimation at scale.
  *
  * Spark's `approx_count_distinct` is a fine HLL++ but its sketch is
  * engine-private: no cross-engine differential, no mergeable artifact
  * another system can read. KMV keeps the k SMALLEST distinct md5-derived
  * hash values; with hashes uniform on [0, 2⁶⁰), the k-th smallest h₍ₖ₎
  * estimates the distinct count as (k−1)·2⁶⁰/h₍ₖ₎ (Bar-Yossef et al.'s
  * classic estimator, std error ≈ 1/√(k−2)). Every byte of the sketch is
  * a pure function of the key set — DuckDB replicates it row-for-row.
  *
  * Scale shape: a typed Aggregator holds ≤ k longs per group PER MAP
  * PARTITION (bounded distinct-heap), so the shuffle carries k·partitions
  * longs per group — never the distinct value set itself (a plain
  * `countDistinct` shuffles every distinct value; HLL ships ~1.5 KB
  * registers — KMV at k=256 ships 2 KB, same order). Sketches merge by
  * distinct-union-truncate, so partial results compose across days/shards
  * — the property warehouse rollups need.
  */
object Sketch {

  /** Bounded distinct bottom-k of hash values. Buffer is sorted distinct
    * ascending, capped at k — insertion skips anything ≥ the cap once
    * full, so per-row cost is a binary-search-free compare in the common
    * case.
    */
  class KmvAggregator(k: Int)
      extends Aggregator[Long, Seq[Long], KmvSketch] {
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], h: Long): Seq[Long] =
      if (buf.sizeIs >= k && buf.last <= h) buf
      else if (buf.contains(h)) buf
      else ((buf :+ h).sorted).take(k)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      (a ++ b).distinct.sorted.take(k)
    def finish(r: Seq[Long]): KmvSketch =
      KmvSketch(r.size, if (r.isEmpty) 0L else r.last)
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[KmvSketch] = Encoders.product[KmvSketch]
  }

  /** The (k−1)·2⁶⁰/h₍ₖ₎ estimator over a finished sketch — ONE home for
    * the arithmetic so the batch column expression and the streaming
    * path (StreamingSketch) cannot drift. Below-k sketches saw every
    * distinct hash: exact count.
    */
  def estimate(k: Int, s: KmvSketch): Double =
    if (s.k_actual < k) s.k_actual.toDouble
    else (k - 1).toDouble * math.pow(2, 60) / s.hk.toDouble

  /** Per-group distinct estimate of `valueCol` (string-castable), keyed
    * by `groupCol`: (group, k_actual, hk, estimate). k_actual < k means
    * the group's distinct count was observed exactly.
    */
  def kmvDistinctByGroup(df: DataFrame, groupCol: String, valueCol: String,
                         k: Int = 64): DataFrame = {
    val hashed = df.select(col(groupCol).cast("string").as("g"),
      TextOps.fingerprint64(col(valueCol).cast("string")).as("h"))
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    hashed.groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(Encoders.scalaLong)
      .agg(new KmvAggregator(k).toColumn.name("s"))
      .toDF(groupCol, "s")
      .select(col(groupCol), col("s.k_actual").as("k_actual"),
        col("s.hk").as("hk"),
        // column twin of [[estimate]] — same branches, same double ops
        // (the oracle SQL mirrors this expression; keep all three
        // in sync)
        when(col("s.k_actual") < k, col("s.k_actual").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(math.pow(2, 60))
            / col("s.hk").cast("double"))
          .as("estimate"))
  }
  /** Count–min sketch (Cormode–Muthukrishnan '05) heavy hitters:
    * `depth` hash rows × `width` buckets of summed counts; a token's
    * estimate is the MIN over its `depth` cells — always ≥ the true
    * count (collisions only ever inflate), with overestimate bounded by
    * ~2·N/width w.p. 1 − (1/2)^depth. Emitted next to the exact counts
    * for the corpus's top-`k` tokens, so the differential gates sketch
    * arithmetic, collisions and all.
    *
    * Hashing is md5-salted per row (not xxhash64) so DuckDB reproduces
    * every bucket — the same cross-engine rationale as the whole sketch
    * family. Scale shape: the sketch build is ONE keyed aggregate over
    * (row, bucket) — depth·width cells total regardless of corpus size
    * (the entire point of a sketch); the top-k probe is a
    * TakeOrderedAndProject plus a broadcast-sized join against the
    * depth·width cell table. Exact counts ride the same token aggregate
    * that feeds the sketch, so the corpus is tokenized once.
    */
  def cmsHeavyHitters(docs: DataFrame, depth: Int = 3, width: Int = 256,
                      k: Int = 20): DataFrame = {
    val counts = docs
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .cache()
    def rb(r: Int) = struct(lit(r).as("r"),
      pmod(TextOps.fingerprint64(concat(col("token"), lit(s":cms:$r"))),
        lit(width.toLong)).as("b"))
    val hashed = (c: DataFrame) => c.select(col("token"), col("exact_n"),
        explode(array((0 until depth).map(rb): _*)).as("rb"))
      .select(col("token"), col("exact_n"),
        col("rb.r").as("r"), col("rb.b").as("b"))
    val cells = hashed(counts)
      .groupBy(col("r"), col("b")).agg(sum(col("exact_n")).as("cell"))
    val top = counts.orderBy(col("exact_n").desc, col("token")).limit(k)
    hashed(top).join(cells, Seq("r", "b"))
      .groupBy(col("token"), col("exact_n"))
      .agg(min(col("cell")).as("cms_est"))
  }

  /** Per-GROUP count-min heavy hitters — the multi-tenant variant of
    * [[cmsHeavyHitters]]: every group (language, source, tenant) gets
    * its own depth×width counter matrix and top-`k`, so one dominant
    * tenant can't evict everyone else's hitters from a shared sketch.
    * Same md5-salted bucket arithmetic; the shuffle carries
    * |groups|·depth·width cells, still corpus-size-independent. Exact
    * counts ride the same token aggregate so the corpus tokenizes
    * once; the top-k is a per-group window over the (group, token)
    * count frame, never global.
    */
  def cmsHeavyHittersByGroup(docs: DataFrame, groupCol: String,
                             depth: Int = 3, width: Int = 256,
                             k: Int = 5): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("g"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("g"), col("token")).agg(count(lit(1)).as("exact_n"))
      .cache()
    def rb(r: Int) = struct(lit(r).as("r"),
      pmod(TextOps.fingerprint64(concat(col("token"), lit(s":cms:$r"))),
        lit(width.toLong)).as("b"))
    val hashed = (c: DataFrame) => c
      .select(col("g"), col("token"), col("exact_n"),
        explode(array((0 until depth).map(rb): _*)).as("rb"))
      .select(col("g"), col("token"), col("exact_n"),
        col("rb.r").as("r"), col("rb.b").as("b"))
    val cells = hashed(counts)
      .groupBy(col("g"), col("r"), col("b"))
      .agg(sum(col("exact_n")).as("cell"))
    val top = counts.withColumn("rk", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("exact_n").desc, col("token"))))
      .filter(col("rk") <= k).drop("rk")
    hashed(top).join(cells, Seq("g", "r", "b"))
      .groupBy(col("g"), col("token"), col("exact_n"))
      .agg(min(col("cell")).as("cms_est"))
      .select(col("g").as(groupCol), col("token"), col("exact_n"),
        col("cms_est"))
  }

  /** SELF-JOIN SIZE estimation from count-min state (Alon-Matias-
    * Szegedy F₂ via the CMS inner product, Cormode & Muthukrishnan
    * §4.2): exact F₂ = Σₖ cnt(k)² is what a join planner needs to
    * price a self-equi-join (and its skew) on `keyCol`; the sketch
    * answers it from depth×width counters — min over rows r of
    * Σ_b cell[r][b]² — a one-sided OVER-estimate, like every CMS
    * read. At 100 TB the per-key count table this query's exact leg
    * builds is itself a giant frame; the sketch is mergeable
    * fixed-size state a planner can keep per partition/day and sum,
    * which is the whole point — the exact leg rides along here so the
    * differential gates the estimator against truth at test scale.
    *
    * Same md5-salted bucket arithmetic as [[cmsHeavyHitters]] (the
    * oracle replicates every cell). Scale shape: ONE keyed aggregate
    * over the scan builds per-key counts; everything after is
    * depth·width-sized. Output one row:
    * (n_rows, n_distinct, exact_f2, cms_f2_est, rel_err).
    */
  def cmsSelfJoinSize(df: DataFrame, keyCol: String, depth: Int = 3,
                      width: Int = 256): DataFrame = {
    val counts = df.select(col(keyCol).cast("long").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .cache()
    def rb(r: Int) = struct(lit(r).as("r"),
      pmod(TextOps.fingerprint64(
          concat(col("k").cast("string"), lit(s":cms:$r"))),
        lit(width.toLong)).as("b"))
    val cells = counts
      .select(col("n"), explode(array((0 until depth).map(rb): _*)).as("rb"))
      .select(col("n"), col("rb.r").as("r"), col("rb.b").as("b"))
      .groupBy(col("r"), col("b")).agg(sum(col("n")).as("cell"))
    val est = cells
      .groupBy(col("r")).agg(sum(col("cell") * col("cell")).as("ip"))
      .agg(min(col("ip")).as("cms_f2_est"))
    val exact = counts.agg(
      sum(col("n")).as("n_rows"),
      count(lit(1)).as("n_distinct"),
      sum(col("n") * col("n")).as("exact_f2"))
    exact.crossJoin(broadcast(est))
      .withColumn("rel_err",
        round((col("cms_f2_est") - col("exact_f2")).cast("double") /
          col("exact_f2").cast("double"), 6))
  }

  /** HyperLogLog distinct estimate (Flajolet et al. '07), m = 64
    * registers — the industry-standard cardinality sketch, here in its
    * deterministic md5-derived form so the full register state and the
    * estimator arithmetic are oracle-replicable (Spark's own
    * `approx_count_distinct` is HLL++ with an engine-private sketch —
    * no differential possible; [[kmvDistinctByGroup]] is the
    * order-statistics alternative, this is the register one).
    *
    * Per value: a 60-bit hash splits into a 6-bit register index and a
    * 54-bit remainder whose leading-zero run sets ρ (1‥55); registers
    * keep max ρ. Estimate = α·m²/Σ2^−Mⱼ with the linear-counting
    * small-range correction (m·ln(m/zeros) when E ≤ 2.5m and empty
    * registers exist). The Σ folds registers in index order — the
    * sorted-fold idiom every float surface here uses — and 2^−Mⱼ terms
    * are exact dyadic doubles, so both engines compute bit-identical
    * sums; ln is probed bit-identical; the emitted estimate is rounded
    * to 6 dp like every float surface.
    *
    * Scale shape: one aggregate keyed (group, register) with map-side
    * MAX partials — 64 longs per group cross the shuffle, never the
    * distinct values. `exact_n` (a real countDistinct, which DOES
    * shuffle distinct values) rides along only to make the differential
    * also gate the estimate against truth at test scale.
    */
  def hllDistinctByGroup(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val m = 64
    val h = TextOps.fingerprint64(col(valueCol).cast("string"))
    val rest = shiftright(h, 6) // 54-bit remainder
    // ρ = position (1-based) of the highest set bit's leading-zero run
    // end: smallest r with bit (54 − r) set; all-zero remainder → 55.
    // Native expression (graft.expressions.HllRho, one nlz instruction);
    // the declarative 54-element transform→filter→array_min chain it
    // replaced is kept as `rhoDeclarative` below for the bit-identity
    // spec — per-row it WAS the whole of this operator's bench cost.
    val rho = call_function("graft_hll_rho", rest)
    val regs = df
      .select(col(groupCol).cast("string").as("g"),
        pmod(h, lit(m.toLong)).as("idx"), rho.as("rho"))
      .groupBy(col("g"), col("idx")).agg(max(col("rho")).as("mj"))
    val exact = df.groupBy(col(groupCol).cast("string").as("g"))
      .agg(countDistinct(col(valueCol)).as("exact_n"))
    hllEstimateFromRegs(regs,
        df.select(col(groupCol).cast("string").as("g")).distinct())
      .join(exact, Seq("g"))
      .select(col("g").as(groupCol), col("zeros"), col("estimate"),
        col("exact_n"))
  }

  /** The ONE home of the HLL estimator fold (densify → Σ2^−Mⱼ → α
    * correction → round 6): both the direct path above and the
    * shard-merge path below end here, so the arithmetic cannot drift
    * between them — the same single-home discipline as [[estimate]]
    * for KMV. `regs` is the sparse (g, idx, mj) state; `groups` the
    * distinct-g frame to densify over.
    */
  private def hllEstimateFromRegs(regs: DataFrame,
                                  groups: DataFrame): DataFrame = {
    // Dense 64-register state per group (unseen register → Mⱼ = 0).
    val dense = groups
      .crossJoin(spark_range_64)
      .join(regs, Seq("g", "idx"), "left")
      .select(col("g"), col("idx"),
        coalesce(col("mj"), lit(0)).as("mj"))
    val folded = dense.groupBy(col("g"))
      .agg(array_sort(collect_list(struct(col("idx"), col("mj"))))
        .as("rs"),
        sum(when(col("mj") === 0, 1).otherwise(0)).as("zeros"))
      .withColumn("sum_inv",
        aggregate(transform(col("rs"),
            s => lit(1.0) / element_at(typedlit((0 to 55).map(1L << _)),
              s.getField("mj") + 1).cast("double")),
          lit(0.0), _ + _))
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(64.0))
    val raw = alpha * lit(64.0) * lit(64.0) / col("sum_inv")
    val est = when(raw <= lit(2.5 * 64) && col("zeros") > 0,
      lit(64.0) * log(lit(64.0) / col("zeros").cast("double")))
      .otherwise(raw)
    folded.select(col("g"), col("zeros"), round(est, 6).as("estimate"))
  }

  /** Sparse per-(group, epoch) HLL register SHARDS — the mergeable
    * artifact a warehouse materializes per day/partition so period
    * rollups never re-read raw data. Each shard is ≤ 64 (idx, mj)
    * rows; register state is the same max-ρ as [[hllDistinctByGroup]].
    */
  def hllRegisterShards(df: DataFrame, groupCol: String, epochCol: String,
                        valueCol: String): DataFrame = {
    val h = TextOps.fingerprint64(col(valueCol).cast("string"))
    df.select(col(groupCol).cast("string").as("g"),
        col(epochCol).as("epoch"),
        pmod(h, lit(64L)).as("idx"),
        call_function("graft_hll_rho", shiftright(h, 6)).as("rho"))
      .groupBy(col("g"), col("epoch"), col("idx"))
      .agg(max(col("rho")).as("mj"))
  }

  /** Register-wise MAX merge of [[hllRegisterShards]] into one
    * per-group estimate: because max∘max = max, the merged estimate is
    * BIT-IDENTICAL to running [[hllDistinctByGroup]] directly over the
    * union — the algebraic property that makes HLL the rollup sketch
    * warehouses exchange (Druid/BigQuery sketch columns). The shuffle
    * carries ≤ 64 longs per (group, epoch), never values; the merge
    * aggregate sees |groups|·|epochs|·64 rows of state regardless of
    * corpus size.
    */
  def hllMergeEstimate(shards: DataFrame): DataFrame = {
    val regs = shards.groupBy(col("g"), col("idx"))
      .agg(max(col("mj")).as("mj"))
    hllEstimateFromRegs(regs, shards.select(col("g")).distinct())
  }

  /** The 64 register indices as a one-column frame — a constant-range
    * helper (the `crossJoin` side is 64 rows; Catalyst folds it).
    */
  private def spark_range_64: DataFrame = {
    val s = org.apache.spark.sql.SparkSession.active
    s.range(64).select(col("id").cast("int").as("idx"))
  }

  /** KMV set-INTERSECTION estimate (the theta-sketch composition,
    * Dasgupta et al.): two KMV sketches answer |A ∩ B| without either
    * side shipping its value set. θ = the k-th smallest distinct hash
    * of the UNION (the union sketch's threshold); every common hash
    * below θ is a uniform sample point of A ∩ B at sampling rate
    * θ/2⁶⁰, so est = n_common · 2⁶⁰ / θ — the same estimator algebra
    * as [[estimate]] with the threshold imported from the union. The
    * exact intersection count rides along so the differential gates
    * accuracy, not just arithmetic.
    *
    * Scale shape: each side reduces to ≤ k longs (the KMV bound);
    * θ is a 1-row broadcast; the common-hash join is sketch-sized.
    * Nothing value-shaped crosses the shuffle — the property that lets
    * warehouses intersect per-day audience sketches without re-reading
    * days.
    */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame, valueCol: String,
                           k: Int = 64): DataFrame = {
    def hashes(df: DataFrame) = df
      .select(TextOps.fingerprint64(col(valueCol).cast("string")).as("h"))
      .distinct()
    val ha = hashes(a).cache()
    val hb = hashes(b).cache()
    val theta = ha.union(hb).distinct()
      .orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("theta"))
    val common = ha.join(hb, Seq("h"))
      .crossJoin(broadcast(theta))
      .filter(col("h") <= col("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_common"))
    val exact = a.select(col(valueCol).as("v")).distinct()
      .join(b.select(col(valueCol).as("v")).distinct(), Seq("v"))
      .agg(count(lit(1)).as("exact_n"))
    common.crossJoin(exact)
      .select(col("theta"), col("n_common"),
        round(col("n_common").cast("double") * lit(math.pow(2, 60))
          / col("theta").cast("double"), 6).as("est_intersection"),
        col("exact_n"))
  }

  /** KMV/theta A-NOT-B: distinct-count estimate of the set DIFFERENCE
    * |A \ B| from the same two ≤ k-hash sketches as
    * [[kmvIntersectEstimate]] (completing the sketch set algebra:
    * union = merge, intersection, difference — the theta-sketch
    * trio warehouses ship). Same union-derived threshold θ; the
    * retained sample is A's hashes ≤ θ with B's removed by an
    * anti-join; estimate = n_only · 2⁶⁰/θ. Exact difference rides
    * along to gate accuracy.
    *
    * Scale shape: identical to the intersection — each side reduces
    * to ≤ k longs before anything joins; nothing value-shaped crosses
    * the shuffle.
    */
  def kmvDifferenceEstimate(a: DataFrame, b: DataFrame, valueCol: String,
                            k: Int = 64): DataFrame = {
    def hashes(df: DataFrame) = df
      .select(TextOps.fingerprint64(col(valueCol).cast("string")).as("h"))
      .distinct()
    val ha = hashes(a).cache()
    val hb = hashes(b).cache()
    val theta = ha.union(hb).distinct()
      .orderBy(col("h")).limit(k)
      .agg(max(col("h")).as("theta"))
    val only = ha.join(hb, Seq("h"), "left_anti")
      .crossJoin(broadcast(theta))
      .filter(col("h") <= col("theta"))
      .groupBy(col("theta"))
      .agg(count(lit(1)).as("n_only"))
    val exact = a.select(col(valueCol).as("v")).distinct()
      .join(b.select(col(valueCol).as("v")).distinct(), Seq("v"), "left_anti")
      .agg(count(lit(1)).as("exact_n"))
    only.crossJoin(exact)
      .select(col("theta"), col("n_only"),
        round(col("n_only").cast("double") * lit(math.pow(2, 60))
          / col("theta").cast("double"), 6).as("est_difference"),
        col("exact_n"))
  }

  /** The declarative ρ (pre-r7 form): 2^0‥2^55 single-bit masks as a
    * literal lookup (the Scala DSL's shiftleft/shiftright only take
    * constant shifts, so variable bit-tests go through element_at).
    * Kept ONLY as the bit-identity anchor for
    * [[graft.expressions.HllRho]] — SketchSpec compares the two over
    * the full events substrate.
    */
  private[graft] def rhoDeclarative(rest: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val pow2 = typedlit((0 to 55).map(1L << _))
    coalesce(
      array_min(filter(
        transform(sequence(lit(1), lit(54)),
          r => when(rest.bitwiseAND(element_at(pow2, lit(55) - r)) > 0, r)),
        x => x.isNotNull)),
      lit(55))
  }

  /** Scala home of the HLL register update for the streaming twin
    * ([[graft.streaming.StreamingSketch.hllStream]]) — same role as
    * [[estimate]] plays for KMV: [[hllDistinctByGroup]]'s column
    * expressions are the oracle-replicable batch twin of this
    * arithmetic, and StreamingSketchSpec pins the two bit-for-bit
    * (zeros AND the 6-dp estimate) through sliced micro-batches.
    *
    * `h` is [[TextOps.fingerprint64]] output — non-negative, 60 bits —
    * so idx = h mod 64 matches the batch pmod and the 54-bit remainder
    * sets ρ = (leading-zero count within 54 bits) + 1, i.e. the
    * smallest r with bit (54 − r) set; all-zero remainder → 55.
    */
  def hllUpdate(regs: Vector[Int], h: Long): Vector[Int] = {
    val idx = (h % 64).toInt
    val rest = h >> 6
    val rho =
      if (rest == 0L) 55
      else java.lang.Long.numberOfLeadingZeros(rest) - 9
    if (rho > regs(idx)) regs.updated(idx, rho) else regs
  }

  /** Scala home of the HLL estimator: fold 2^−Mⱼ in register-index
    * order (the batch twin folds its struct-sorted register list the
    * same way, term-for-term — exact dyadic doubles, bit-identical
    * sums), α·m²/Σ with the linear-counting small-range correction,
    * rounded exactly as Spark's `round(_, 6)` (BigDecimal.valueOf +
    * HALF_UP — the Round expression's own arithmetic).
    */
  def hllEstimate(regs: Vector[Int]): Double = {
    val sumInv = regs.foldLeft(0.0)((a, mj) => a + 1.0 / (1L << mj).toDouble)
    val zeros = regs.count(_ == 0)
    val alpha = 0.7213 / (1.0 + 1.079 / 64.0)
    val raw = alpha * 64.0 * 64.0 / sumInv
    val est =
      if (raw <= 2.5 * 64 && zeros > 0) 64.0 * math.log(64.0 / zeros)
      else raw
    java.math.BigDecimal.valueOf(est)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** EXACT per-group distinct count over a bounded integer key domain,
    * via dense-bitmap aggregation — the non-approximate sibling of KMV
    * and HLL, and the dense-array form of the roaring-bitmap distinct
    * that Druid/ClickHouse/Kylin ship for dictionary-encoded keys.
    *
    * Why not `countDistinct`: Spark plans that as a two-phase
    * expand+re-aggregate whose shuffle carries every (group, key) pair
    * — at 100 TB with hot groups, that is the distinct VALUE SET on the
    * wire. The bitmap buffer is a fixed `(maxKey+1)/64` longs per group
    * per map partition (8 KB at maxKey=65535) regardless of row count:
    * map-side partials absorb any key frequency, the shuffle carries
    * |groups|·partitions bitmaps, and merge is a word-wise OR. Bitmaps
    * also make the artifact REUSABLE: ORed across days for rollups,
    * ANDed across groups for exact set intersections — the same
    * mergeability contract as the sketches above, but exact.
    *
    * Domain contract: keys must lie in [0, maxKey] (dictionary-encoded
    * or surrogate ids — [[graft.ingest.Normalize]]'s surrogate keys are
    * exactly this shape); an out-of-range key fails fast rather than
    * silently aliasing. For unbounded domains use KMV/HLL instead.
    */
  class BitmapAggregator(maxKey: Int)
      extends Aggregator[Long, Array[Long], Long] {
    def zero: Array[Long] = new Array[Long]((maxKey >>> 6) + 1)
    def reduce(b: Array[Long], k: Long): Array[Long] = {
      require(k >= 0 && k <= maxKey,
        s"key $k outside bitmap domain [0, $maxKey]")
      b((k >>> 6).toInt) |= 1L << (k & 63)
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Long = {
      var i = 0; var n = 0L
      while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
      n
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** [[bitmapDistinctByGroup]] over an AUTO-BUILT key dictionary — the
    * scale-robust catalog form (the r8 sf1 probe caught the raw form's
    * failure mode: a fixed maxKey=65535 fails fast the moment keys are
    * re-strided, and widening maxKey to the raw key SPAN would pay
    * span/8 bytes per buffer for a sparse domain — 11 MB at a 90 M-key
    * span holding only 20 k distinct keys).
    *
    * This is the dictionary-encode-then-bitmap shape the scaladoc above
    * already assumes ("dictionary-encoded or surrogate ids") and the
    * one columnar stores ship: distinct keys → dense ids [0, |dict|) →
    * bitmap sized by dictionary CARDINALITY, never key span. The
    * dictionary build is one distinct over the key column (dimension-
    * bounded by definition — a key set too big to dictionary-encode is
    * the documented KMV/HLL cutover) with the same bounded global
    * row_number idiom as the dimension surrogate key
    * ([[graft.ingest.Normalize]]); the broadcast join back is
    * |dict|-sized. The `dict.count()` action sizes the buffer exactly —
    * a metadata-cheap dim aggregate, same contract as
    * `semanticDedupPairsAuto`'s count. Bitmap semantics (exactness,
    * OR/AND mergeability) are unchanged: any key↔id bijection preserves
    * per-group bit counts.
    */
  def bitmapDistinctDict(df: DataFrame, groupCol: String,
                         keyCol: String): DataFrame = {
    val dict = df.select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("dict_id",
        (row_number().over(Window.orderBy("k")) - 1).cast("long"))
    val n = dict.count() // dimension-bounded; sizes the bitmap exactly
    val encoded = df
      .join(broadcast(dict), df(keyCol).cast("long") === col("k"))
      .select(col(groupCol), col("dict_id"))
    bitmapDistinctByGroup(encoded, groupCol, "dict_id",
      math.max(n - 1, 0).toInt)
  }

  /** (group, n_distinct): exact distinct `keyCol` per `groupCol` via
    * [[BitmapAggregator]].
    */
  def bitmapDistinctByGroup(df: DataFrame, groupCol: String,
                            keyCol: String, maxKey: Int): DataFrame = {
    val typed = df.select(col(groupCol).cast("string").as("g"),
      col(keyCol).cast("long").as("k"))
      .as[(String, Long)](Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
    typed.groupByKey(_._1)(Encoders.STRING)
      .mapValues(_._2)(Encoders.scalaLong)
      .agg(new BitmapAggregator(maxKey).toColumn.name("n_distinct"))
      .toDF(groupCol, "n_distinct")
  }

  /** HDR-histogram quantile sketch (integer log₂ bins + 4-bit
    * sub-bucket — the HdrHistogram/DDSketch design point): per-group
    * approximate quantiles whose state is BIN COUNTS, not values.
    * Values are fixed-point cents; a value's bin is its octave
    * (⌊log₂⌋, computed as length(bin(v)) − 1 — an integer path, no
    * floating log anywhere) refined by the next 4 mantissa bits, so
    * relative error ≤ 1/32 ≈ 3%; values < 16 cents get exact unit
    * bins. The p-quantile is the first bin whose cumulative count
    * reaches ⌈p·n⌉ (rank semantics shared with the oracle), estimated
    * at the bin midpoint — every column integer or exact decimal, the
    * only sketch in the family with a float-free surface end to end.
    *
    * Scale shape: one projection pass (whole-stage codegen: bin() /
    * shifts / masks), ONE keyed aggregate to (group, bin) counts —
    * ≤ ~16·64 cells per group regardless of row count, map-side
    * combined — then windows over those cell frames (partitioned by
    * group; bin-count-sized, never data-sized). `explode` over the
    * 3-element p array replaces any quantile×bins join. Bin counts
    * merge by SUM, so per-day shards roll up like
    * [[hllRegisterShards]] — and unlike percentile_approx's private
    * KLL state, the artifact is plain (bin, count) rows any engine can
    * merge. A global exact percentile at 100 TB would instead sort the
    * full column — this never moves anything value-shaped.
    */
  /** The bin of a positive fixed-point value (COLUMN twin of
    * [[hdrBin]]): msb = ⌊log₂ v⌋ via binary-string length —
    * integer-exact in both engines (Spark bin() and DuckDB bin() both
    * emit the bare binary digits, probed identical).
    */
  private[operators] def hdrBinCol(vc: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val msb = (length(bin(vc)) - 1).cast("int")
    when(vc < 16, vc)
      .otherwise((msb - 3).cast("long") * 16 +
        call_function("shiftright", vc, msb - 4).bitwiseAND(lit(15L)))
  }

  def hdrQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                   ps: Seq[String] = Seq("0.50", "0.95", "0.99"))
      : DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // Through DECIMAL(18,2) first: double→long truncates in Spark but
    // rounds in DuckDB (~5% of rows differ on this data); the Money
    // cast is the repo's proven-identical rounding point, and
    // decimal·100 → long is then exact in both engines.
    val vc = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast("long")
    val binned = df.filter(vc >= 1)
      .select(col(groupCol).cast("string").as("g"), vc.as("vc"))
      .select(col("g"), hdrBinCol(col("vc")).as("bin"))
    val counts = binned.groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val wRun = Window.partitionBy(col("g")).orderBy(col("bin"))
    val wAll = Window.partitionBy(col("g"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(wRun))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("p", explode(array(ps.map(p =>
        lit(new java.math.BigDecimal(p)).cast(DecimalType(4, 2))): _*)))
      .withColumn("rank", ceil(col("p") * col("n")).cast("long"))
      .filter(col("cum") >= col("rank"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("p")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
    // Bin midpoint in double-cents (all integer): bins < 16 are exact
    // cent values; bin b ≥ 16 covers [(16+b%16)·2^s, +2^s) with
    // s = b÷16 − 1.
    val shift = (col("bin") / 16).cast("int") - 1
    val lower = call_function("shiftleft",
      (col("bin") % 16) + 16, shift)
    val width = call_function("shiftleft", lit(1L), shift)
    val x2 = when(col("bin") < 16, col("bin") * 2)
      .otherwise(lower * 2 + width)
    cum.select(col("g").as(groupCol), col("p"), col("n"), col("rank"),
      col("bin"),
      (x2.cast(DecimalType(18, 3)) *
        lit(new java.math.BigDecimal("0.005")).cast(DecimalType(4, 3)))
        .cast(DecimalType(18, 3)).as("est"))
  }

  /** JVM twin of [[hdrQuantiles]]'s bin arithmetic for the streaming
    * path (63 − nlz ≡ length(bin(v)) − 1) — the same single-home
    * discipline as [[hllUpdate]]/[[hllEstimate]]; StreamingSketchSpec
    * pins stream == batch through sliced micro-batches. All integer.
    */
  def hdrBin(vc: Long): Long =
    if (vc < 16) vc
    else {
      val msb = 63 - java.lang.Long.numberOfLeadingZeros(vc)
      (msb - 3).toLong * 16 + ((vc >> (msb - 4)) & 15L)
    }

  /** Bin midpoint in HALF-CENTS (2× cents, integer-exact): the batch
    * `est` column is exactly x2/200 at scale 3.
    */
  def hdrMidpointX2(b: Long): Long =
    if (b < 16) b * 2
    else {
      val shift = (b / 16).toInt - 1
      ((b % 16 + 16) << shift) * 2 + (1L << shift)
    }

  /** DECILE bucketing from the sketch — assign every row its decile
    * WITHOUT a global sort: the 9 boundary bins come out of the
    * bin-count sketch (the [[hdrQuantiles]] chain at p = 0.1‥0.9),
    * collect into ONE 9-element array, broadcast, and each row's
    * decile is 1 + |{boundaries < its bin}| — a pure array fold per
    * row. This is how a 100 TB curriculum/price-band bucketing
    * actually runs: the alternative (ntile over a global window) sorts
    * the entire fact table on one partition. Ties share the boundary's
    * decile in both engines (strict `>` compare).
    *
    * The cumulative window here is over the BIN frame (≤ ~16·64 rows
    * by construction), not data — the same bounded-frame argument as
    * q_token_budget's bucket window (allowlisted).
    */
  def hdrDecileBuckets(df: DataFrame, idCol: String,
                       valueCol: String): DataFrame = {
    // same Money-decimal rounding point as hdrQuantiles
    val vcRaw = (col(valueCol)
      .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("long")
    val d = df.filter(vcRaw >= 1)
      .select(col(idCol), vcRaw.as("vc"))
      .withColumn("bin", hdrBinCol(col("vc")))
    val counts = d.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val wRun = Window.orderBy(col("bin"))
    val wAll = Window.partitionBy()
    val bounds = counts
      .withColumn("cum", sum(col("cnt")).over(wRun))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("p", explode(array((1 to 9).map(k =>
        lit(new java.math.BigDecimal(s"0.$k"))
          .cast(org.apache.spark.sql.types.DecimalType(4, 2))): _*)))
      .withColumn("rank", ceil(col("p") * col("n")).cast("long"))
      .filter(col("cum") >= col("rank"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p")).orderBy(col("bin"))))
      .filter(col("rn") === 1)
      .agg(sort_array(collect_list(col("bin"))).as("bs"))
    d.crossJoin(broadcast(bounds))
      .select(col(idCol), col("vc"), col("bin"),
        (size(filter(col("bs"), b => col("bin") > b)) + 1).as("decile"))
  }

  /** Quantile read-out over a bin-count state: per p (decimal string),
    * (p, n, rank = ⌈p·n⌉, chosen bin, midpoint ×2-cents) — the same
    * rank semantics as the batch column chain. Empty state → empty.
    */
  def hdrQuantilesFromBins(bins: Map[Long, Long], ps: Seq[String])
      : Seq[(String, Long, Long, Long, Long)] =
    if (bins.isEmpty) Seq.empty
    else {
      val sorted = bins.toSeq.sortBy(_._1)
      val n = sorted.iterator.map(_._2).sum
      ps.map { p =>
        val rank = (BigDecimal(p) * n)
          .setScale(0, BigDecimal.RoundingMode.CEILING).toLong
        var cum = 0L
        val bin = sorted.collectFirst {
          case (b, c) if { cum += c; cum >= rank } => b
        }.getOrElse(sorted.last._1)
        (p, n, rank, bin, hdrMidpointX2(bin))
      }
    }
}

/** Sketch summary: how many mins were kept and the k-th smallest. */
case class KmvSketch(k_actual: Int, hk: Long)
