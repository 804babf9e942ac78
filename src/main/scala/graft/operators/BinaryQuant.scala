package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Binary (1-bit sign) quantization + Hamming-distance search — the
  * most aggressive compression point on the ANN spectrum this library
  * covers (float32 → 1 bit/dim = 32× smaller than the raw column, 8×
  * smaller than SQ8, comparable to PQ m=8 but with NO codebook to
  * train): keep only the sign of each dimension, pack the signs into
  * machine words, and rank by Hamming distance — for zero-centered
  * embeddings sign agreement is a monotone proxy for angular
  * similarity (Charikar '02, the same 1-bit hyperplane idea behind
  * [[Similarity.lshBucket]], here applied to the NATURAL basis and
  * used as a distance, not a bucket key).
  *
  * Packing is 32 sign bits per BIGINT lane (not 64) for the same
  * reason [[Bloom]] packs 32-bit words: the differential oracle's
  * range-checked `1::BIGINT << 63` would overflow, and two lanes of 32
  * cost the same storage. A 64-dim embedding becomes `array(w0, w1)` —
  * 16 bytes/vector through scan, shuffle, and broadcast.
  *
  * Distance is integer-exact (bit_count of XOR per lane, summed), so
  * the compare needs no rounding or sorted-fold machinery — the one
  * ANN path in the library with a fully integer score surface.
  *
  * Scale shape: identical to [[Similarity.bruteTopK]] — broadcast the
  * packed query set, stream the packed corpus once, per-query top-k
  * window over per-query partitions. At 100 TB the packed corpus
  * column is the thing that makes the stream feasible: 16 B/vector vs
  * 512 B for the raw floats (and any IVF/LSH index in this package
  * composes on top to cut the scanned fraction). The rerank variant
  * broadcasts the (|q|·shortlist)-id frame back onto one full-column
  * scan — the [[ScalarQuant.rerankedTopK]] / [[Similarity.matryoshkaTopK]]
  * two-stage pattern with the cheapest possible coarse stage.
  */
object BinaryQuant {

  /** Sign-bit packing: lane w of the result holds dims [32w, 32w+32)
    * as bits 0..31 (bit i set iff the dimension is > 0). Pure array
    * expression — no shuffle, whole-stage codegen.
    */
  def signPack(e: Column, dim: Int): Column = {
    require(dim % 32 == 0, s"dim $dim not a multiple of the 32-bit lane")
    array((0 until dim / 32).map { w =>
      aggregate(
        zip_with(slice(e, w * 32 + 1, 32), sequence(lit(0), lit(31)),
          (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i))
            .otherwise(lit(0L))),
        lit(0L), (acc, x) => acc.bitwiseOR(x))
    }: _*)
  }

  /** Hamming distance between two packed sign arrays: per-lane
    * bit_count(xor), integer sum across lanes.
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b,
        (x, y) => call_function("bit_count", x.bitwiseXOR(y)).cast("int")),
      lit(0), (acc, x) => acc + x)

  private def packed(df: DataFrame, idAs: String, wAs: String,
                     dim: Int): DataFrame =
    df.select(col("vec_id").as(idAs),
      signPack(col("embedding"), dim).as(wAs))

  /** Top-k by Hamming distance over sign-packed vectors.
    * Returns (query_id, neighbor_id, rnk, hamming) — ascending
    * distance, neighbor_id tie-break.
    */
  def hammingTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  dim: Int = 64): DataFrame =
    packed(corpus, "neighbor_id", "cw", dim)
      .crossJoin(broadcast(packed(queries, "query_id", "qw", dim)))
      .select(col("query_id"), col("neighbor_id"),
        hamming(col("qw"), col("cw")).as("hamming"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("hamming").asc, col("neighbor_id").asc)))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"),
        col("hamming"))

  /** Two-stage: Hamming shortlist (shortlistFactor·k per query, integer
    * coarse stage over the 16 B/vector packed column), then exact
    * full-precision cosine rerank of the shortlist only. Returns the
    * standard ranked-knn frame (query_id, neighbor_id, rnk, score).
    */
  def hammingRerankTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                        dim: Int = 64, shortlistFactor: Int = 4): DataFrame = {
    val shortlist = hammingTopK(queries, corpus, k * shortlistFactor, dim)
      .select(col("query_id"), col("neighbor_id"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"))
    Similarity.rank(
      c.join(broadcast(shortlist), Seq("neighbor_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.score(col("qe"), col("ce")).as("score")), k)
  }
}
