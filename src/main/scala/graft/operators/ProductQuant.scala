package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Product quantization (Jégou et al. '11) — the third leg of the
  * vector-compression family next to SQ8 ([[ScalarQuant]]) and the
  * coarse quantizer ([[Quantizer]]): split each `d`-dim vector into `m`
  * subvectors of d/m dims, train an independent `ksub`-centroid
  * codebook per subspace, and store each vector as `m` small codes —
  * 64 float dims (256 B) become 8 bytes/vector at m=8/ksub=256-class
  * codes, the compression that makes billion-vector indexes fit in
  * memory.
  *
  * Search is ADC (asymmetric distance computation): the query stays
  * full-precision; per (subspace, centroid) inner products form a
  * m·ksub lookup table, and a stored vector's score is the sum of its
  * `m` table entries — Σₘ ⟨q_m, C_m[code_m(x)]⟩, the inner-product
  * approximation ⟨q, x̂⟩ of the decomposed reconstruction. No stored
  * vector is ever decoded.
  *
  * Determinism: each subspace trainer is the same Lloyd's-as-DataFrame
  * loop as [[Quantizer.fit]] — lowest-vec_id init, sorted-fold means —
  * just keyed by (m, cell) instead of (cell), so the ENTIRE pipeline
  * (m parallel trainers, encoding, LUT, ADC ranking) is a pure function
  * of the corpus that the DuckDB oracle replicates bit-for-bit.
  *
  * Scale shape: training assigns against m·ksub broadcast centroids
  * (one shuffle keyed (vec_id, m) per iteration, re-estimation keyed
  * (m, cell, pos)); the LUT is |queries|·m·ksub rows — broadcast; the
  * ADC scan streams the CODES table (m ints per vector, the 32×
  * narrower surrogate of the embedding column) and aggregates by
  * (query, neighbor) with map-side partials. The float corpus is
  * touched only at train/encode time — the 100 TB search never reads
  * it.
  */
object ProductQuant {

  private def dbl(c: Column): Column = transform(c, _.cast("double"))

  private def dot(x: Column, y: Column): Column =
    aggregate(zip_with(x, y, _ * _), lit(0.0), _ + _)

  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** (vec_id, m, sv): the m-th `ds`-dim subvector of each embedding. */
  private def subvectors(vecs: DataFrame, m: Int, ds: Int): DataFrame =
    vecs.select(col("vec_id"), dbl(col("embedding")).as("e"))
      .select(col("vec_id"), explode(array((0 until m).map(i =>
        struct(lit(i).as("m"),
          slice(col("e"), i * ds + 1, ds).as("sv"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))

  /** Per-(vec, subspace) nearest codebook entry by (d², cell). */
  private def assign(sub: DataFrame, codebook: DataFrame): DataFrame =
    sub.join(broadcast(codebook), Seq("m"))
      .withColumn("d2", dist2(col("sv"), col("centroid")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
        first(col("sv")).as("sv"))

  /** Train the m×ksub codebook: (m, cell, centroid). Init = the `ksub`
    * lowest-vec_id vectors' subvectors (cell = id rank); each iteration
    * re-estimates per-(m, cell, pos) means with the sorted fold.
    *
    * NEGATIVE PROBE, recorded (r16): ending each iteration in an
    * eager `localCheckpoint()` of the m·ksub-row centroid frame — the
    * move that fixed [[Quantizer.fit]]'s nested-lineage waste in r14 —
    * measured 2.4× SLOWER here at sf0.1 (q_knn_pq 1.70→4.10 min,
    * q_knn_ivf_pq 1.69→3.98, residual 2.13→5.09; controls 1.01×) for
    * only a marginal sf1 gain (0.77–0.80× against a 0.89× control).
    * Unlike Quantizer's k-row frame, the nested plan here is ONE job
    * whose repeated `sub` exchange ReuseExchange already deduplicates;
    * per-iteration checkpoints break that reuse and pay iters extra
    * jobs, each re-scanning the subvector explode. Reverted same
    * round — the nested single-job plan IS the cheap form.
    */
  def fit(vecs: DataFrame, m: Int = 8, ksub: Int = 16,
          iters: Int = 3): DataFrame = {
    val ds = 64 / m
    val sub = subvectors(vecs, m, ds)
    val init = vecs.select(col("vec_id")).orderBy(col("vec_id")).limit(ksub)
      .select(col("vec_id"),
        (row_number().over(Window.orderBy(col("vec_id"))) - 1)
          .cast("int").as("cell"))
    var cents = sub.join(broadcast(init), Seq("vec_id"))
      .select(col("m"), col("cell"), col("sv").as("centroid"))
    for (_ <- 1 to iters) {
      cents = assign(sub, cents)
        .select(col("m"), col("cell"), posexplode(col("sv")))
        .groupBy(col("m"), col("cell"), col("pos"))
        .agg(sort_array(collect_list(col("col"))).as("vals"))
        .select(col("m"), col("cell"), col("pos"),
          (aggregate(col("vals"), lit(0.0), _ + _) / size(col("vals")))
            .as("mu"))
        .groupBy(col("m"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mu"))))
          .as("pm"))
        .select(col("m"), col("cell"),
          transform(col("pm"), _.getField("mu")).as("centroid"))
    }
    cents
  }

  /** PQ codes: (vec_id, m, cell) — the m-bytes-per-vector index. */
  def encode(vecs: DataFrame, codebook: DataFrame, m: Int = 8): DataFrame =
    assign(subvectors(vecs, m, 64 / m), codebook)
      .select(col("vec_id"), col("m"), col("cell"))

  /** ADC top-k: rank the corpus by the PQ inner-product approximation.
    * Output contract matches the knn family (query_id, neighbor_id,
    * rnk, score) with score = the rounded ADC sum — the approximation
    * IS the contract, so the differential is exact (same story as the
    * LSH and IVF paths).
    */
  def adcTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              m: Int = 8, ksub: Int = 16, iters: Int = 3): DataFrame = {
    val cb = fit(corpus, m, ksub, iters).cache()
    val codes = encode(corpus, cb, m)
      .select(col("vec_id").as("neighbor_id"), col("m"), col("cell"))
    val lut = subvectors(queries, m, 64 / m)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("cell"),
        dot(col("sv"), col("centroid")).as("ip"))
    val scored = codes.join(broadcast(lut), Seq("m", "cell"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("ip"))))
        .as("parts"))
      .select(col("query_id"), col("neighbor_id"),
        round(aggregate(transform(col("parts"), _.getField("ip")),
          lit(0.0), _ + _), 6).cast(DecimalType(10, 6)).as("score"))
    Similarity.rank(scored, k)
  }

  /** IVF-PQ — the FAISS IndexIVFPQ composition with RAW-vector codes
    * (see [[ivfPqResidualTopK]] for the residual-coded default): a
    * LEARNED coarse quantizer
    * ([[Quantizer.fit]]) routes each query to its `nProbe` nearest
    * cells, and within those cells the corpus is scanned in PQ-code
    * form via the ADC lookup table. The levers multiply: IVF cuts the
    * scanned FRACTION to ~nProbe/kCells, PQ cuts the BYTES per scanned
    * vector 32× (m codes vs 64 floats) — beyond [[ScalarQuant
    * .ivfSq8TopK]]'s 4×. Both trainers are the deterministic Lloyd's
    * loop, so the whole pipeline carries a row-level differential.
    */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                kCells: Int = 8, iters: Int = 3, nProbe: Int = 1,
                m: Int = 8, ksub: Int = 16): DataFrame = {
    val cells = Quantizer.fit(corpus, kCells, iters).cache()
    val coarse = Quantizer.assign(corpus, cells)
      .select(col("vec_id").as("neighbor_id"), col("cell").as("ccell"))
    val cb = fit(corpus, m, ksub, iters).cache()
    val codes = encode(corpus, cb, m)
      .select(col("vec_id").as("neighbor_id"), col("m"), col("cell"))
    val probes = Quantizer.probeCells(queries, cells, nProbe)
      .select(col("query_id"), col("cell").as("ccell"))
    val lut = subvectors(queries, m, 64 / m)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("cell"),
        dot(col("sv"), col("centroid")).as("ip"))
    val scored = codes.join(coarse, Seq("neighbor_id"))
      .join(broadcast(probes), Seq("ccell"))
      .join(broadcast(lut), Seq("query_id", "m", "cell"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("ip"))))
        .as("parts"))
      .select(col("query_id"), col("neighbor_id"),
        round(aggregate(transform(col("parts"), _.getField("ip")),
          lit(0.0), _ + _), 6).cast(DecimalType(10, 6)).as("score"))
    Similarity.rank(scored, k)
  }

  /** IVF-PQ with RESIDUAL coding — the refinement [[ivfPqTopK]]'s doc
    * names as next (and the FAISS IndexIVFPQ default): the PQ codebook
    * is trained on r = x − c(x), each vector's offset from its coarse
    * centroid, instead of on x itself. Residuals live in a ball of
    * cell-radius around the origin — a far tighter distribution than
    * the raw corpus — so the same m·ksub code budget spends its
    * quantization resolution where the vectors actually are; the
    * reconstruction error drops from ~cell diameter to ~cell-local
    * spread, which is what a real recall budget at 100 TB feels first.
    *
    * Scoring decomposes exactly: ⟨q, x⟩ ≈ ⟨q, c(x)⟩ + ⟨q, r̂⟩. The first
    * term is one inner product per (query, probed cell) — computed on
    * the tiny probe frame; the second is the standard ADC table sum
    * over the SHARED residual codebook (cell-independent, so the LUT
    * stays |queries|·m·ksub and broadcast). Plan shape is identical to
    * [[ivfPqTopK]] — codes-only scan, broadcast probes and LUT — plus
    * one broadcast join of the k-cell centroid frame at encode time;
    * both trainers remain the deterministic Lloyd's loop, so the whole
    * composition carries the row-level DuckDB differential.
    */
  def ivfPqResidualTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                        kCells: Int = 8, iters: Int = 3, nProbe: Int = 1,
                        m: Int = 8, ksub: Int = 16): DataFrame = {
    val cells = Quantizer.fit(corpus, kCells, iters).cache()
    val assigned = Quantizer.assign(corpus, cells)
    val coarse = assigned
      .select(col("vec_id").as("neighbor_id"), col("cell").as("ccell"))
    val residuals = assigned.join(broadcast(cells), Seq("cell"))
      .select(col("vec_id"),
        zip_with(dbl(col("embedding")), col("centroid"), _ - _)
          .as("embedding"))
    val cb = fit(residuals, m, ksub, iters).cache()
    val codes = encode(residuals, cb, m)
      .select(col("vec_id").as("neighbor_id"), col("m"), col("cell"))
    val probes = Quantizer.probeCells(queries, cells, nProbe)
      .join(broadcast(cells), Seq("cell"))
      .select(col("query_id"), col("cell").as("ccell"),
        dot(dbl(col("qe")), col("centroid")).as("qc_ip"))
    val lut = subvectors(queries, m, 64 / m)
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(cb), Seq("m"))
      .select(col("query_id"), col("m"), col("cell"),
        dot(col("sv"), col("centroid")).as("ip"))
    val scored = codes.join(coarse, Seq("neighbor_id"))
      .join(broadcast(probes), Seq("ccell"))
      .join(broadcast(lut), Seq("query_id", "m", "cell"))
      .groupBy(col("query_id"), col("neighbor_id"), col("qc_ip"))
      .agg(array_sort(collect_list(struct(col("m"), col("ip"))))
        .as("parts"))
      .select(col("query_id"), col("neighbor_id"),
        round(col("qc_ip") +
          aggregate(transform(col("parts"), _.getField("ip")),
            lit(0.0), _ + _), 6).cast(DecimalType(10, 6)).as("score"))
    Similarity.rank(scored, k)
  }
}
