package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native perceptual dHash (difference hash) of a BINARY payload's
  * data section: the byte stream after `headerBytes` is bucketed into
  * an 8×9 grid of cells (integer DIV boundaries — cell c covers
  * positions [⌈c·n/72⌉, ⌈(c+1)·n/72⌉)) and each of the 64 output bits
  * records whether a cell's byte-average exceeds its right
  * neighbor's, compared CROSS-MULTIPLIED (`sum_a·cnt_b > sum_b·cnt_a`)
  * so no division — every bit is an exact integer predicate the
  * DuckDB twin reproduces verbatim. Output is the 64-char '0'/'1'
  * signature string (band slicing and Hamming verification operate on
  * substrings, shared with the oracle); NULL when no data bytes
  * remain after the header.
  *
  * One O(n) pass per row, no intermediate Catalyst arrays, no per-byte
  * rows; codegen emits a static call so whole-stage spans stay fused —
  * the reason this is an Expression and not the equivalent
  * sequence/transform/aggregate HOF chain (measured at sf1: the HOF
  * chain's per-byte lambda evals + 15M-row explode shuffle made the
  * signature stage ~10× the cost of this pass).
  */
case class DHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT) input")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dhash"

  override protected def nullSafeEval(b: Any, skip: Any): Any =
    DHash.compute(b.asInstanceOf[Array[Byte]], skip.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val res = nullSafeCodeGen(ctx, ev, (b, s) =>
      s"""${ev.value} = graft.expressions.DHash.compute($b, $s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    res
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native perceptual aHash (average hash) — [[DHash]]'s sibling with
  * a different failure surface: 64 cells over the data section, bit c
  * = cell-average exceeds the GLOBAL average (cross-multiplied:
  * `sum_c · n > total · cnt_c`). Where dHash reads local gradients
  * (robust to global brightness shifts, blind to uniform scaling),
  * aHash reads absolute level — running BOTH and auditing their
  * agreement is the media analog of the text family's
  * method-agreement read (q_dedup_agreement). Same output contract:
  * the 64-char '0'/'1' signature, NULL when no data bytes remain.
  */
case class AHash(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY, INT) input")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ahash"

  override protected def nullSafeEval(b: Any, skip: Any): Any =
    AHash.compute(b.asInstanceOf[Array[Byte]], skip.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, s) =>
      s"""${ev.value} = graft.expressions.AHash.compute($b, $s);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AHash {

  private final val Cells = 64

  /** 64-char '0'/'1' aHash of `bytes[skip..)`; null when empty. */
  def compute(bytes: Array[Byte], skip: Int): UTF8String = {
    val nd = bytes.length - skip
    if (nd <= 0) return null
    val sums = new Array[Long](Cells)
    val cnts = new Array[Long](Cells)
    var total = 0L
    var c = 0
    while (c < Cells) {
      val lo = (c.toLong * nd + Cells - 1) / Cells
      val hi = ((c + 1).toLong * nd + Cells - 1) / Cells
      var i = lo
      var s = 0L
      while (i < hi) { s += (bytes(skip + i.toInt) & 0xFF); i += 1 }
      sums(c) = s
      cnts(c) = hi - lo
      total += s
      c += 1
    }
    val out = new Array[Byte](64)
    c = 0
    while (c < Cells) {
      out(c) = if (sums(c) * nd > total * cnts(c)) '1' else '0'
      c += 1
    }
    UTF8String.fromBytes(out)
  }
}

object DHash {

  private final val Cells = 72
  private final val Cols = 9

  /** 64-char '0'/'1' dHash of `bytes[skip..)`; null when empty. */
  def compute(bytes: Array[Byte], skip: Int): UTF8String = {
    val nd = bytes.length - skip
    if (nd <= 0) return null
    val sums = new Array[Long](Cells)
    val cnts = new Array[Long](Cells)
    // lo(c) = ceil(c * nd / 72); positions are assigned contiguously.
    var c = 0
    while (c < Cells) {
      val lo = (c.toLong * nd + Cells - 1) / Cells
      val hi = ((c + 1).toLong * nd + Cells - 1) / Cells
      var i = lo
      var s = 0L
      while (i < hi) { s += (bytes(skip + i.toInt) & 0xFF); i += 1 }
      sums(c) = s
      cnts(c) = hi - lo
      c += 1
    }
    val out = new Array[Byte](64)
    var k = 0
    while (k < 64) {
      val ca = (k / 8) * Cols + k % 8
      val cb = ca + 1
      out(k) =
        if (sums(ca) * cnts(cb) > sums(cb) * cnts(ca)) '1' else '0'
      k += 1
    }
    UTF8String.fromBytes(out)
  }
}
