package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native feature-hashing vectorizer — the fused-loop form of
  * `TextOps.hashVector` (bit-identical output, spec-gated): tokenize,
  * two salted md5s per token (bucket + sign), accumulate ±1 into a
  * `dim`-long integer vector.
  *
  * The declarative form pays O(dim·tokens) lambda-evaluated adds per
  * row (one `aggregate` fold per output position over the per-token
  * struct array) — the r7 bench measured q_knn_text at 5.4 s with that
  * shape dominating. This computes the same vector in ONE O(tokens)
  * pass with a single reusable MessageDigest and no intermediate
  * Catalyst arrays; codegen emits a static call so whole-stage spans
  * stay fused. `dim` must be a foldable integer literal.
  */
case class HashVector(text: Expression, dim: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = dim

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING text")
    else if (dim.dataType != IntegerType || !dim.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT dim")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_hash_vector"

  override protected def nullSafeEval(t: Any, d: Any): Any =
    HashVector.compute(t.asInstanceOf[UTF8String], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, d) =>
      s"${ev.value} = graft.expressions.HashVector.compute($t, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(text = newLeft, dim = newRight)
}

object HashVector {

  /** One-pass hashing-trick vector. Must stay BIT-IDENTICAL to
    * `TextOps.hashVector`: same split (regex " ", limit -1 — trailing
    * empties kept and hashed), same salts (`:fh` bucket, `:fs` sign),
    * same hash (md5 of UTF-8, first 60 bits), same bucket (h mod dim —
    * h is non-negative) and sign (h mod 2 == 1 → +1 else −1) rules.
    */
  def compute(text: UTF8String, dim: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val v = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val idx = (fp60(md, t + ":fh") % dim).toInt
      v(idx) += (if (fp60(md, t + ":fs") % 2 == 1) 1L else -1L)
      i += 1
    }
    new GenericArrayData(v)
  }

  /** First 60 bits of md5 — `TextOps.fingerprint64`'s value exactly
    * (15 hex chars = first 8 big-endian bytes >>> 4).
    */
  private def fp60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var be = 0L
    var b = 0
    while (b < 8) { be = (be << 8) | (d(b) & 0xFFL); b += 1 }
    be >>> 4
  }
}
