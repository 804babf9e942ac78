package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints — the fused-loop form of
  * `TextOps.winnow` (bit-identical output, same order): tokenize, hash
  * every k-gram (md5 → first 60 bits, the cross-engine fingerprint64),
  * take the minimum of each w-hash window, distinct preserving first
  * occurrence.
  *
  * The declarative form builds the gram-string array, an intermediate
  * hash array, a per-window slice array and the min fold as separate
  * Catalyst array expressions — allocation per step, per row. This
  * computes the fingerprint set in ONE pass with a single reusable
  * MessageDigest and no intermediate Catalyst arrays (the r5 bench
  * measured q_dedup_winnow as the slowest new query; this is its hot
  * inner loop). Codegen emits a call to the static [[WinnowFingerprints
  * .compute]] helper, so whole-stage codegen spans stay fused around it.
  *
  * `k` and `w` must be foldable integer literals (checked at analysis).
  */
case class WinnowFingerprints(text: Expression, kGram: Expression,
                              window: Expression)
    extends TernaryExpression {

  override def first: Expression = text
  override def second: Expression = kGram
  override def third: Expression = window

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING text")
    else if (!Seq(kGram, window).forall(e =>
        e.dataType == IntegerType && e.foldable))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable INT k and w")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(t: Any, k: Any, w: Any): Any =
    WinnowFingerprints.compute(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k, w) =>
      s"${ev.value} = graft.expressions.WinnowFingerprints.compute($t, $k, $w);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(text = newFirst, kGram = newSecond, window = newThird)
}

object WinnowFingerprints {

  /** One-pass winnow. Must stay BIT-IDENTICAL to `TextOps.winnow`:
    * same split semantics (regex " ", limit -1 — trailing empties kept),
    * same gram join (single spaces, empties kept), same hash (md5 of
    * UTF-8, first 60 bits = big-endian first-8-bytes >>> 4), same
    * min-per-window, same first-occurrence distinct order.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val nGrams = toks.length - k + 1
    if (nGrams <= 0) return new GenericArrayData(Array.empty[Long])
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](nGrams)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < nGrams) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      var be = 0L
      var b = 0
      while (b < 8) { be = (be << 8) | (d(b) & 0xFFL); b += 1 }
      hs(i) = be >>> 4
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]
    if (nGrams < w) {
      var m = hs(0); var x = 1
      while (x < nGrams) { if (hs(x) < m) m = hs(x); x += 1 }
      out.add(m)
    } else {
      var s = 0
      while (s + w <= nGrams) {
        var m = hs(s); var x = s + 1
        while (x < s + w) { if (hs(x) < m) m = hs(x); x += 1 }
        out.add(m)
        s += 1
      }
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator; var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}
