package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native HILBERT curve index of two keys — the locality layout one
  * notch above Morton order ([[graft.operators.Layout.zorder2]]): the
  * Hilbert curve has NO long diagonal jumps, so consecutive index
  * values are always grid neighbors and a range of the index covers a
  * tighter key rectangle — measurably fewer row groups touched per
  * range predicate than z-order on the same data (the reason newer
  * table formats expose `OPTIMIZE ... HILBERT`).
  *
  * The classic xy2d walk (quadrant digit + reflect/swap rotation per
  * level, 21 levels → keys masked to 2^21; wider keys must be
  * range-bucketed first, the same contract as zorder2) is an
  * inherently SEQUENTIAL per-row loop — unrolling it as 21 chained
  * projections invites exponential expression blowup when projection
  * collapse inlines each level's x/y into the next (each level reads
  * them 3×). A native expression keeps it one codegen'd static call
  * inside the whole-stage span, like [[CosineSimilarity]]. The DuckDB
  * twin unrolls the same walk as MATERIALIZED CTE stages (the q_kcore
  * device — materialization stops the same exponential re-evaluation).
  *
  * All arithmetic is integer; d < 4^21 ≈ 4.4e12 sits far inside Long.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT, BIGINT) input")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertIndex.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.HilbertIndex.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Curve order: 21 bits per key (2M cells per dimension). */
  val Order = 21

  /** xy2d: quadrant digit accumulation with the reflect-then-swap
    * rotation (ry = 0 branch) — the standard walk, level s = 2^20‥1.
    */
  def compute(x0: Long, y0: Long): Long = {
    val mask = (1L << Order) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
