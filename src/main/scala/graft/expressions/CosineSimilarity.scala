package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native cosine similarity over two FLOAT arrays, with whole-stage
  * codegen — the brief's preference ladder: built-ins where possible, a
  * Catalyst Expression where the built-in composition costs too much.
  *
  * The declarative form (`zip_with` → `aggregate`, Similarity.cosine)
  * materializes an intermediate product array and three fold states per
  * row; this fuses dot and both norms into ONE primitive loop with no
  * allocation, inlined into the generated join-stage code. Both forms
  * accumulate left-to-right in double, so results are bit-identical —
  * the differential oracle and TopK cross-check enforce that.
  *
  * Semantics: NULL if either array is NULL (BinaryExpression contract);
  * arrays are assumed dense (no NULL elements), lengths must match —
  * embedding-table invariants. A zero vector yields NaN, matching the
  * declarative form.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (dot, nx, ny, i, n) = (ctx.freshName("dot"), ctx.freshName("nx"),
        ctx.freshName("ny"), ctx.freshName("i"), ctx.freshName("n"))
      s"""
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = (double) $a.getFloat($i);
         |  double y = (double) $b.getFloat($i);
         |  $dot += x * y; $nx += x * x; $ny += y * y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
