package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top PRINCIPAL COMPONENT of an embedding corpus by power iteration
  * (Mises-Geiringer): v ← normalize(A·v) with A = Σ_x x·xᵀ — without
  * ever materializing the d×d gram matrix, because A·v = Σ_x x·(xᵀ v)
  * distributes as one scan per iteration. The dominant direction of
  * an embedding set is the workhorse of embedding hygiene: the
  * all-but-the-top (ABTT / "common component removal") postprocessor,
  * whitening, and drift diagnostics all start from exactly this
  * vector.
  *
  * Deterministic-distributed-sum device, same as Graph.pageRank: each
  * row's per-dimension contribution x_j·(xᵀv) is rounded ONCE to a
  * fixed-point long (scale 1e9) and summed as integers — associative,
  * engine-independent. 1e9 (vs PageRank's 1e12) buys headroom: with
  * unit-normalized v and |x|∞ ≤ B, per-row scaled contributions are
  * ≤ B²·√d·1e9, so ~1e9/B² rows fit before a 64-bit sum could
  * overflow; pick the scale per corpus bound. Dots and norms are
  * ascending-dimension folds (the sorted-fold idiom), so both engines
  * compute bit-identical doubles.
  *
  * FIXED `iters` power steps from the deterministic all-equal init
  * (1/√d each) — the contract is "k power steps", not convergence,
  * so two engines always agree; k=5 is plenty for the spectral gaps
  * real embedding corpora have. The per-iteration v is DRIVER-SIZED
  * (d doubles — a trained parameter, like a codebook), collected and
  * re-broadcast as a literal; the corpus is scanned once per
  * iteration and never shuffles more than d integer sums.
  *
  * Output: (dim, w) — the unit top component, 6 dp.
  */
object Pca {

  private val Scale = 1e9

  def topComponentPower(emb: DataFrame, embedCol: String = "embedding",
                        dims: Int = 64, iters: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val x = emb
      .select(transform(col(embedCol), c => c.cast("double")).as("x"))
      .cache()
    var v: IndexedSeq[Double] = IndexedSeq.fill(dims)(1.0 / math.sqrt(dims))
    for (_ <- 1 to iters) {
      val vc = typedlit(v)
      val d = aggregate(zip_with(col("x"), vc, (a, b) => a * b),
        lit(0.0), (acc, t) => acc + t)
      val sums = x.select(col("x"), d.as("d"))
        .select(posexplode(col("x")).as(Seq("j", "xj")), col("d"))
        .select(col("j"),
          round(col("xj") * col("d") * Scale).cast("long").as("c"))
        .groupBy(col("j")).agg(sum(col("c")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val s = (0 until dims).map(j => sums.getOrElse(j, 0L).toDouble / Scale)
      val norm = math.sqrt(s.foldLeft(0.0)((a, t) => a + t * t))
      v = s.map(_ / norm)
    }
    v.zipWithIndex.map { case (w, j) => (j, w) }.toDF("dim", "w")
      .select(col("dim"), round(col("w"), 6).as("w"))
  }

  /** ABTT ("all-but-the-top", Mu & Viswanath '18) apply-side: project
    * each embedding onto the [[topComponentPower]] component and
    * report the projection and the residual norm — the dominant-
    * direction removal that measurably improves similarity search on
    * anisotropic embedding sets (and the residual-norm column is the
    * per-vector "how much of you was boilerplate direction"
    * diagnostic). Uses the ROUNDED 6-dp component on both engines so
    * the handoff between trainer and applier is itself part of the
    * differential. One corpus scan; the component is a broadcast
    * literal; folds ascend dimensions as always.
    */
  def abttResiduals(emb: DataFrame, idCol: String = "vec_id",
                    embedCol: String = "embedding",
                    dims: Int = 64, iters: Int = 5): DataFrame = {
    val w = topComponentPower(emb, embedCol, dims, iters)
      .orderBy(col("dim")).collect().map(_.getDouble(1)).toIndexedSeq
    val wc = typedlit(w)
    emb
      .select(col(idCol),
        transform(col(embedCol), c => c.cast("double")).as("x"))
      .withColumn("d",
        aggregate(zip_with(col("x"), wc, (a, b) => a * b),
          lit(0.0), (acc, t) => acc + t))
      .select(col(idCol), round(col("d"), 6).as("proj"),
        round(sqrt(aggregate(
          zip_with(col("x"), wc, (a, b) => (a - col("d") * b) *
            (a - col("d") * b)),
          lit(0.0), (acc, t) => acc + t)), 6).as("r_norm"))
  }
}
