package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns — the memory/IO lever
  * for vector search at 100 TB: a 64-dim float32 embedding (256 B)
  * becomes 64 uint8 codes (64 B), shrinking scan, shuffle and broadcast
  * volume 4× at a bounded recall cost. This is the standard "SQ8" IVF
  * companion (FAISS's IndexIVFScalarQuantizer shape): train per-dim
  * [lo, hi] ranges once, encode x → ⌊(x−lo)/(hi−lo)·255 + 0.5⌋,
  * search on dequantized approximations, optionally exact-rerank the
  * short list with full-precision vectors.
  *
  * Determinism: the trained stats are per-dim MIN/MAX (exact, order-
  * independent), and encode/decode are fixed IEEE expression trees
  * (⌊·+0.5⌋, not round-half-even), so codes, dequantized values and
  * scores are bit-identical cross-engine — the full train+encode+search
  * pipeline carries a row-level DuckDB differential.
  *
  * Scale shape: fit is one posexplode + (pos) aggregate with map-side
  * partials (64 groups); the stats ride as ONE broadcast row (two
  * 64-double arrays); encode/decode are pure per-row array expressions
  * — no shuffle anywhere in the encode path.
  */
object ScalarQuant {

  private def dbl(c: Column): Column = transform(c, _.cast("double"))

  /** Per-dimension [lo, hi] over the corpus, as one row of two aligned
    * arrays — the broadcastable codebook.
    */
  def fit(vecs: DataFrame): DataFrame =
    vecs.select(posexplode(dbl(col("embedding"))))
      .groupBy(col("pos"))
      .agg(min(col("col")).as("lo"), max(col("col")).as("hi"))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("lo"), col("hi"))))
        .as("s"))
      .select(transform(col("s"), _.getField("lo")).as("lo"),
        transform(col("s"), _.getField("hi")).as("hi"))

  /** Adds `codes: array<int>` (0..255; a constant dim encodes 0).
    * Clamped to the uint8 range: a vector OUTSIDE the trained [lo, hi]
    * (stats fit on an older corpus snapshot — the standard SQ8
    * situation) saturates at 0/255 like FAISS, instead of silently
    * escaping the int8 envelope the 4× memory story depends on.
    */
  def encode(vecs: DataFrame, stats: DataFrame): DataFrame = {
    val rng = zip_with(col("hi"), col("lo"), _ - _)
    val shifted = zip_with(dbl(col("embedding")), col("lo"), _ - _)
    vecs.crossJoin(broadcast(stats))
      .withColumn("codes",
        zip_with(shifted, rng, (d, r) =>
          when(r === 0d, lit(0))
            .otherwise(greatest(lit(0), least(lit(255),
              floor(d / r * lit(255.0) + lit(0.5)).cast("int"))))))
      .drop("lo", "hi")
  }

  /** Dequantized approximation: x̂ = lo + (code/255)·(hi−lo). */
  def decode(coded: DataFrame, stats: DataFrame): DataFrame = {
    val rng = zip_with(col("hi"), col("lo"), _ - _)
    val scaled = zip_with(col("codes"), rng,
      (c, r) => c.cast("double") / lit(255.0) * r)
    coded.crossJoin(broadcast(stats))
      .withColumn("dq", zip_with(col("lo"), scaled, _ + _))
      .drop("lo", "hi")
  }

  /** Exact-contract top-k over the QUANTIZED corpus: float queries
    * scored against dequantized neighbors (Similarity.bruteTopK's shape
    * and output schema; scores differ from exact by the quantization
    * error — recall is test-gated, the score arithmetic oracle-gated).
    * Declarative cosine, not the native expression: the dequantized
    * side is ARRAY<DOUBLE> and the two forms are bit-identical anyway.
    */
  def bruteTopKQuantized(queries: DataFrame, corpus: DataFrame,
                         k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val stats = fit(corpus)
    val c = decode(encode(corpus, stats), stats)
      .select(col("vec_id").as("neighbor_id"), col("dq").as("ce"))
    val q = queries.select(col("vec_id").as("query_id"),
      dbl(col("embedding")).as("qe"))
    Similarity.rank(c.crossJoin(broadcast(q))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qe"), col("ce")), 6)
          .cast(DecimalType(10, 6)).as("score")), k)
  }

  /** IVF-SQ8 — the production vector-index composition (FAISS's
    * IndexIVFScalarQuantizer shape): a LEARNED coarse quantizer routes
    * each query to its `nProbe` nearest cells, and within those cells
    * the corpus is scanned in its int8-encoded form (global SQ8
    * codebook; per-cell residual coding is the next refinement). The
    * two levers compose multiplicatively: IVF cuts the scanned FRACTION
    * to ~nProbe/kCells, SQ8 cuts the BYTES per scanned vector 4× —
    * which is the whole 100 TB story in one plan. Determinism carries
    * through both trainers, so the full pipeline (Lloyd's + codebook +
    * encode + probe + rank) is oracle-replicated.
    */
  def ivfSq8TopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 kCells: Int = 8, iters: Int = 3,
                 nProbe: Int = 1): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cells = Quantizer.fit(corpus, kCells, iters).cache()
    val stats = fit(corpus)
    val c = decode(encode(Quantizer.assign(corpus, cells), stats), stats)
      .select(col("vec_id").as("neighbor_id"), col("dq").as("ce"),
        col("cell"))
    val probes = Quantizer.probeCells(queries, cells, nProbe)
    Similarity.rank(c.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        round(Similarity.cosine(col("qe"), col("ce")), 6)
          .cast(DecimalType(10, 6)).as("score")), k)
  }

  /** TWO-STAGE SQ8 search — the complete production pattern: the
    * quantized scan produces a `shortlistFactor`·k candidate shortlist
    * per query (cheap: int8-width corpus), then ONLY those candidates
    * are re-scored against full-precision vectors and re-ranked. Final
    * scores are exact cosines, so ranking errors from quantization
    * survive only when the true neighbor fell out of the shortlist —
    * recall strictly ≥ the single-stage quantized search (spec-gated).
    *
    * Plan shape: the shortlist (|queries|·4k ids — tiny) is BROADCAST
    * onto the full-precision corpus scan, so stage two streams the
    * corpus once with a hash join and nothing shuffles; the expensive
    * float vectors are touched only for shortlist members.
    */
  def rerankedTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                   shortlistFactor: Int = 4): DataFrame = {
    val shortlist = bruteTopKQuantized(queries, corpus, k * shortlistFactor)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    val candidates = c.join(
      broadcast(shortlist.join(broadcast(q), Seq("query_id"))),
      Seq("neighbor_id"))
    Similarity.rank(candidates
      .select(col("query_id"), col("neighbor_id"),
        Similarity.score(col("qe"), col("ce")).as("score")), k)
  }
}
