package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Coarse quantizer for IVF-style ANN: Lloyd's k-means expressed as
  * DataFrame operations — no MLlib dependency, no driver-side loops over
  * data (only over the fixed, small iteration count).
  *
  * Determinism: init centroids are the k lowest-id vectors (no RNG), and
  * centroid re-estimation sums each (cell, dim) slice in SORTED order via
  * an explicit fold — not `avg`, whose partial-merge order varies with
  * shuffle arrival and would make the trained cells run-to-run
  * fp-unstable. With sorted folds the whole trainer is a pure function
  * of the corpus, which is what lets the DuckDB oracle replicate the
  * full 3-iteration Lloyd's loop bit-for-bit (list_sort + list_reduce
  * mirror sort_array + aggregate exactly).
  *
  * Scale shape per iteration: assignment is a cross join against k
  * (small) broadcast centroids + a min_by groupBy — one shuffle keyed by
  * vec_id; re-estimation is posexplode → groupBy(cell, pos) sorted-fold
  * mean — one shuffle keyed by (cell, dim-position), holding one
  * (cell, dim) slice (corpus/k doubles) per group. Train on a bounded
  * sample at real scale, as any coarse quantizer does — assignment
  * itself streams the full corpus regardless.
  */
object Quantizer {

  private def dbl(c: Column): Column = transform(c, _.cast("double"))

  /** Squared L2 distance between two double-array columns. */
  private def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Train k cells over `vecs` (vec_id, embedding). Returns
    * (cell, centroid: Array[Double]).
    */
  def fit(vecs: DataFrame, k: Int, iters: Int = 3): DataFrame = {
    val v = vecs.select(col("vec_id"), dbl(col("embedding")).as("e"))
    var centroids = v.orderBy(col("vec_id")).limit(k)
      .select(col("vec_id").as("cell"), col("e").as("centroid"))
      .withColumn("cell",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cell"))) - 1).cast("int"))
    for (_ <- 1 to iters) {
      val assigned = assign(v.withColumnRenamed("e", "embedding"), centroids)
      centroids = assigned
        .select(col("cell"), posexplode(dbl(col("embedding"))))
        .groupBy(col("cell"), col("pos"))
        // deterministic mean: fold the sorted slice, then divide — see
        // the object doc (avg's merge order is shuffle-arrival-dependent)
        .agg(sort_array(collect_list(col("col"))).as("vals"))
        .select(col("cell"), col("pos"),
          (aggregate(col("vals"), lit(0.0), _ + _) / size(col("vals")))
            .as("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("pm"))
        .select(col("cell"), transform(col("pm"), _.getField("m"))
          .as("centroid"))
    }
    centroids
  }

  /** Nearest-cell assignment: adds `cell` to (vec_id, embedding). */
  def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .withColumn("d2", dist2(dbl(col("embedding")), col("centroid")))
      .groupBy(col("vec_id"))
      .agg(min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"),
        first(col("embedding")).as("embedding"))

  /** Query → cell probes: each query tagged with its `nProbe` nearest
    * cells — (query_id, qe, cell), one row per probed cell. Shared by
    * the plain learned IVF and the IVF-SQ8 composition.
    */
  def probeCells(queries: DataFrame, cells: DataFrame,
                 nProbe: Int): DataFrame =
    queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qe"))
      .crossJoin(broadcast(cells))
      .withColumn("d2", dist2(dbl(col("qe")), col("centroid")))
      .withColumn("pr", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("d2"), col("cell"))))
      .filter(col("pr") <= nProbe)
      .select(col("query_id"), col("qe"), col("cell"))

  /** IVF ANN with the LEARNED quantizer: probe the query's `nProbe`
    * nearest cells only. Same output contract as Similarity.bruteTopK.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              kCells: Int = 8, iters: Int = 3, nProbe: Int = 1): DataFrame = {
    val cells = fit(corpus, kCells, iters).cache()
    val c = assign(corpus, cells)
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ce"), col("cell"))
    val qProbes = probeCells(queries, cells, nProbe)
    val scored = c.join(broadcast(qProbes), Seq("cell"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.score(col("qe"), col("ce")).as("score"))
    scored.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"), col("score"))
  }
}
