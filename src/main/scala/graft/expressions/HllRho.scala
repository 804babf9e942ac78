package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native HLL ρ — rank of the leading set bit in the 54-bit hash
  * remainder: the smallest r ∈ 1‥54 whose bit (54 − r) is set, 55 for
  * an all-zero remainder. Bit-identical to the declarative form in
  * `Sketch.hllDistinctByGroup` (a 54-element transform→filter→array_min
  * chain per ROW — the r7 bench measured that chain as the whole of
  * q_hll_distinct's 6.3 s), and to `Sketch.hllUpdate`'s streaming-side
  * arithmetic: one `Long.numberOfLeadingZeros` instruction, fused into
  * whole-stage codegen.
  */
case class HllRho(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT remainder")

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_hll_rho"

  override protected def nullSafeEval(rest: Any): Any = {
    val r = rest.asInstanceOf[Long]
    if (r == 0L) 55 else java.lang.Long.numberOfLeadingZeros(r) - 9
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"($c == 0L ? 55 : java.lang.Long.numberOfLeadingZeros($c) - 9)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
