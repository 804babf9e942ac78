package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native Shannon entropy (bits/byte) of a BINARY payload — the
  * cheap content-type/quality probe for opaque media columns: a
  * well-compressed image/audio stream sits near 8 bits/byte, text
  * near 4-4.5, zero-padded or truncated payloads far lower. Used as a
  * corpus-level media-quality filter the same way token-entropy
  * filters text (`q_token_entropy`), without decoding anything.
  *
  * One O(n) histogram pass per row plus a fixed 256-slot fold, no
  * intermediate Catalyst arrays; codegen emits a static call so
  * whole-stage spans stay fused. Float determinism: the entropy terms
  * −p·ln p are accumulated in ASCENDING BYTE-VALUE order over the
  * values present (the sorted-fold idiom every float surface here
  * uses), and the DuckDB twin folds the identical term list with
  * `list_reduce` — `ln` is probed bit-identical across engines (the
  * HLL estimator precedent).
  */
case class ByteEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires BINARY input")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_byte_entropy"

  override protected def nullSafeEval(b: Any): Any =
    ByteEntropy.compute(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.expressions.ByteEntropy.compute($b);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object ByteEntropy {

  /** Entropy in bits/byte; 0.0 for an empty payload. Term order is
    * ascending byte value over present values — the DuckDB twin's
    * `ORDER BY bv` fold, term-for-term.
    */
  def compute(bytes: Array[Byte]): Double = {
    if (bytes.length == 0) return 0.0
    val hist = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { hist(bytes(i) & 0xFF) += 1; i += 1 }
    val n = bytes.length.toDouble
    var acc = 0.0
    var v = 0
    while (v < 256) {
      val c = hist(v)
      if (c > 0L) { val p = c.toDouble / n; acc += -(p * math.log(p)) }
      v += 1
    }
    acc / math.log(2.0)
  }
}
