package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.operators.Sketch

/** Incremental KMV distinct-count over a stream — the sketch's
  * mergeability ([[Sketch.KmvAggregator]]'s fold/merge algebra,
  * property-gated in R5AggregatorProps) carried into Structured
  * Streaming: state per group is the SAME bounded distinct bottom-k the
  * batch aggregator holds (≤ k longs), updated per micro-batch via
  * `mapGroupsWithState`, so after ANY prefix of micro-batches the
  * emitted estimate equals the batch estimate over the rows seen so far
  * — the live-cardinality dashboard primitive (distinct users/tokens so
  * far, per key) with O(k) state per group and no re-scan.
  *
  * Batch execution of the same function (Spark runs mapGroupsWithState
  * per-group once, state discarded) degenerates to exactly
  * [[Sketch.kmvDistinctByGroup]] — StreamingSketchSpec pins streaming
  * == batch through sliced micro-batches.
  */
object StreamingSketch {

  case class GroupHash(g: String, h: Long)
  case class KmvEstimate(g: String, k_actual: Int, hk: Long,
                         estimate: Double)

  def kmvStream(hashed: Dataset[GroupHash], k: Int = 64)
      : Dataset[KmvEstimate] = {
    val agg = new Sketch.KmvAggregator(k)
    hashed
      .groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Seq[Long], KmvEstimate](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupHash],
         state: GroupState[Seq[Long]]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r.h)
          }
          state.update(buf)
          val s = agg.finish(buf)
          KmvEstimate(g, s.k_actual, s.hk, Sketch.estimate(k, s))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[KmvEstimate])
  }

  case class HllEstimate(g: String, zeros: Int, estimate: Double)

  /** Incremental HLL over a stream — the register sketch (the mergeable
    * artifact warehouses actually exchange) next to [[kmvStream]]'s
    * order-statistics one: state per group is the dense 64-register
    * vector (the SAME ≤64-small-ints state the batch aggregate shuffles),
    * updated per micro-batch via [[Sketch.hllUpdate]] and estimated via
    * [[Sketch.hllEstimate]] — so after ANY prefix of micro-batches the
    * emitted (zeros, estimate) equals [[Sketch.hllDistinctByGroup]] over
    * the rows seen so far. O(64) state per group, no re-scan, and the
    * state vector itself merges by per-register max across shards/days.
    */
  def hllStream(hashed: Dataset[GroupHash]): Dataset[HllEstimate] =
    hashed
      .groupByKey(_.g)(Encoders.STRING)
      .mapGroupsWithState[Vector[Int], HllEstimate](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[GroupHash],
         state: GroupState[Vector[Int]]) =>
          val regs = rows.foldLeft(
            state.getOption.getOrElse(Vector.fill(64)(0))) {
            (r, row) => Sketch.hllUpdate(r, row.h)
          }
          state.update(regs)
          HllEstimate(g, regs.count(_ == 0), Sketch.hllEstimate(regs))
      }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(),
        Encoders.product[HllEstimate])
}
