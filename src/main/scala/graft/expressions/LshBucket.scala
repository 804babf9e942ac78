package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native hyperplane-LSH signature: the sign-pattern bucket of a FLOAT
  * embedding against ARRAY<ARRAY<DOUBLE>> plane weights, fused into one
  * codegen'd double loop.
  *
  * The declarative form (Similarity.lshBucketDeclarative) builds one
  * `zip_with` product array plus one fold PER PLANE — 8 intermediate
  * arrays per row on the default signature. This computes the whole
  * signature with no allocation, inlined into the scan stage. Per-plane
  * accumulation is left-to-right in double starting from 0.0 — the same
  * fp op sequence as the declarative fold and as the DuckDB oracle's
  * list_inner_product, so all three agree bit-for-bit (SimilaritySpec
  * pins Spark-side identity; the q_dedup_embedding / q_knn_lsh oracles
  * pin the cross-engine half).
  *
  * Semantics: bit p set iff dot(embedding, planes[p]) >= 0. NULL if
  * either input is NULL; arrays assumed dense with matching dims
  * (embedding-table invariants, same as graft_cosine).
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (ARRAY<FLOAT>, ARRAY<ARRAY<DOUBLE>>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "graft_lsh_bucket"

  override protected def nullSafeEval(e: Any, pl: Any): Any = {
    val x = e.asInstanceOf[ArrayData]
    val planes = pl.asInstanceOf[ArrayData]
    var bucket = 0
    var p = 0
    val np = planes.numElements()
    while (p < np) {
      val w = planes.getArray(p)
      var dot = 0.0
      var i = 0
      val n = x.numElements()
      while (i < n) {
        dot += x.getFloat(i).toDouble * w.getDouble(i)
        i += 1
      }
      if (dot >= 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (e, pl) => {
      val (b, p, np, w, dot, i, n) = (ctx.freshName("bucket"),
        ctx.freshName("p"), ctx.freshName("np"), ctx.freshName("w"),
        ctx.freshName("dot"), ctx.freshName("i"), ctx.freshName("n"))
      s"""
         |int $b = 0;
         |int $np = $pl.numElements();
         |int $n = $e.numElements();
         |for (int $p = 0; $p < $np; $p++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $w = $pl.getArray($p);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $e.getFloat($i)) * $w.getDouble($i);
         |  }
         |  if ($dot >= 0) $b |= 1 << $p;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
