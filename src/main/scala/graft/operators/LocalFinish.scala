package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CAP-GATED DRIVER FINISHES for the contracting iterative family —
  * the [[Graph.boruvkaTrace]] hybrid template (r12) generalized per
  * VERDICT r12 #1. The shape shared by connected components, k-core
  * peeling and seeded label propagation: every distributed round is a
  * full job barrier (2-4 keyed shuffles + a localCheckpoint + a count)
  * over a frame that is either already small (near-dup pair graphs are
  * pairs-sized, not corpus-sized) or contracts monotonically (peeling
  * only deletes). At local[32] the late rounds are pure job-launch
  * latency; on a 1000-executor cluster they are pure scheduling
  * round-trips. So: once the frame provably fits under an explicit row
  * cap, collect it ONCE into primitive arrays and run the remaining
  * rounds as an EXACT emulation of the same loop — same integer
  * arithmetic, same tie-breaks, same round budget — producing a result
  * bit-identical to the distributed fixpoint (each caller's scaladoc
  * argues why). Above the cap nothing changes: the documented
  * distributed loop runs, so the 100 TB path is untouched.
  *
  * Two disciplines inherited from the Borůvka finish:
  *  - the gate is a count() on an ALREADY-CHECKPOINTED frame (one
  *    cheap job, no recomputation of the expensive upstream), and the
  *    collect reads the same checkpoint blocks;
  *  - driver state is primitive (`Array[Long]`, `LongMap`) — the r12
  *    ADVICE heap lesson: 2M boxed tuples cost hundreds of MB, 2M
  *    longs in flat arrays cost 32 MB.
  *
  * Type gate: the emulations compare and min() node/label values as
  * longs, so the driver path only fires when every keyed column is
  * LongType (every catalog substrate is); anything else falls back to
  * the distributed loop rather than risking a schema or collation
  * mismatch with the DuckDB twin.
  */
object LocalFinish {

  /** All columns LongType — the driver-path eligibility gate. */
  def allLong(df: DataFrame, cols: String*): Boolean =
    cols.forall(c => df.schema(c).dataType == LongType)

  /** Collect a two-long-column frame as a flat stride-2 array. */
  private def collectPairs(df: DataFrame, a: String, b: String): Array[Long] = {
    val rows = df.select(col(a), col(b)).collect()
    val out = new Array[Long](rows.length * 2)
    var i = 0
    while (i < rows.length) {
      out(2 * i) = rows(i).getLong(0)
      out(2 * i + 1) = rows(i).getLong(1)
      i += 1
    }
    out
  }

  /** CONNECTED COMPONENTS, min-label contract: (doc_id, canonical_id =
    * component min) for every node incident to `edges`. Union-find with
    * path halving + a min-per-root pass — the unique CC fixpoint both
    * [[Dedup.duplicateClusters]]' min-label propagation and
    * [[Dedup.connectedComponentsStar]]'s star rounds converge to, so
    * emulation here is output-identity, not trace-identity (neither
    * operator exposes its rounds in the result).
    *
    * `edges` must be two long columns (any orientation, duplicates and
    * self-loops fine — a self-loop registers the node, unions nothing).
    */
  def minComponents(edges: DataFrame, aCol: String, bCol: String,
                    outId: String, outCanonical: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val flat = collectPairs(edges, aCol, bCol)
    val idx = new scala.collection.mutable.LongMap[Int]()
    var nNodes = 0
    var i = 0
    while (i < flat.length) {
      if (!idx.contains(flat(i))) { idx(flat(i)) = nNodes; nNodes += 1 }
      i += 1
    }
    val ids = new Array[Long](nNodes)
    idx.foreachEntry((id, j) => ids(j) = id)
    val parent = Array.tabulate(nNodes)(identity)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) {
        parent(x) = parent(parent(x)) // path halving
        x = parent(x)
      }
      x
    }
    i = 0
    while (i < flat.length) {
      val ra = find(idx(flat(i)))
      val rb = find(idx(flat(i + 1)))
      if (ra != rb) {
        // Union by smaller NODE ID at the root — keeps find() depth
        // fine (halving amortizes) and lets the min pass stay trivial.
        if (ids(ra) < ids(rb)) parent(rb) = ra else parent(ra) = rb
      }
      i += 2
    }
    val minOf = new Array[Long](nNodes)
    java.util.Arrays.fill(minOf, Long.MaxValue)
    var j = 0
    while (j < nNodes) {
      val r = find(j)
      if (ids(j) < minOf(r)) minOf(r) = ids(j)
      j += 1
    }
    val out = new Array[(Long, Long)](nNodes)
    j = 0
    while (j < nNodes) { out(j) = (ids(j), minOf(find(j))); j += 1 }
    out.toSeq.toDF(outId, outCanonical)
  }

  /** K-CORE PEEL, exact emulation of [[Graph.kCore]]'s distributed
    * loop from the current edge frame: per round, degree over `src`,
    * keep src-nodes of degree ≥ k, keep rows with BOTH endpoints kept,
    * converge when the row count stops changing, stop at the remaining
    * round budget — so a budget-capped non-converged prefix matches
    * the distributed prefix row-for-row (peeling is deterministic).
    * Returns ((node, degree) of survivors, rounds consumed).
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): (DataFrame, Int) = {
    val spark = edges.sparkSession
    import spark.implicits._
    var flat = collectPairs(edges, "src", "dst")
    var r = 0
    var converged = false
    while (r < rounds && !converged) {
      val deg = new scala.collection.mutable.LongMap[Long]()
      var i = 0
      while (i < flat.length) {
        deg(flat(i)) = deg.getOrElse(flat(i), 0L) + 1L
        i += 2
      }
      val next = new Array[Long](flat.length)
      var n = 0
      i = 0
      while (i < flat.length) {
        if (deg.getOrElse(flat(i), 0L) >= k &&
            deg.getOrElse(flat(i + 1), 0L) >= k) {
          next(n) = flat(i); next(n + 1) = flat(i + 1); n += 2
        }
        i += 2
      }
      converged = n == flat.length
      flat = java.util.Arrays.copyOf(next, n)
      r += 1
    }
    val deg = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    while (i < flat.length) {
      deg(flat(i)) = deg.getOrElse(flat(i), 0L) + 1L
      i += 2
    }
    val out = deg.toSeq.sortBy(_._1).toDF("node", "degree")
    (out, r)
  }

  /** SEEDED LABEL PROPAGATION, exact emulation of
    * [[Graph.labelPropagation]]'s fixed-round loop: per round, each
    * labeled node spreads its label along out-edges; each receiving
    * node takes the (max count, then min label) winner; seed nodes
    * keep their seed label forever; non-seed nodes carry the current
    * round's winner. Counts, max and min are all exact longs — the
    * same integers the distributed aggregates produce.
    */
  def labelPropLocal(edges: DataFrame, seeds: DataFrame,
                     rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val flat = collectPairs(edges, "src", "dst")
    val seedArr = collectPairs(seeds, "node", "label")
    val seedLab = new scala.collection.mutable.LongMap[Long]()
    var i = 0
    while (i < seedArr.length) {
      seedLab(seedArr(i)) = seedArr(i + 1); i += 2
    }
    var lab = seedLab.clone()
    for (_ <- 1 to rounds) {
      val cnt = new scala.collection.mutable.HashMap[(Long, Long), Long]()
      i = 0
      while (i < flat.length) {
        lab.get(flat(i)).foreach { l =>
          val key = (flat(i + 1), l)
          cnt(key) = cnt.getOrElse(key, 0L) + 1L
        }
        i += 2
      }
      // (max count, min label) winner per receiving node.
      val win = new scala.collection.mutable.LongMap[(Long, Long)]()
      cnt.foreachEntry { case ((node, l), c) =>
        win.get(node) match {
          case Some((bc, bl)) if bc > c || (bc == c && bl <= l) => ()
          case _ => win(node) = (c, l)
        }
      }
      val next = seedLab.clone()
      win.foreachEntry((node, cl) =>
        if (!seedLab.contains(node)) next(node) = cl._2)
      lab = next
    }
    lab.toSeq.sortBy(_._1).toDF("node", "label")
  }
}
