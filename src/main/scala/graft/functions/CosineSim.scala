package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `cosine_sim(a, b, norm_sq_a, norm_sq_b)` — the similarity-search
  * hot path as a native Catalyst expression with codegen.
  *
  * The declarative formulation (`aggregate(zip_with(a, b, (x, y) ->
  * x * y), 0d, (acc, x) -> acc + x)`) evaluates its lambdas
  * INTERPRETED and materializes the intermediate product array per
  * row; this expression is one fused compiled loop over the two
  * ArrayData buffers. The fold runs left-to-right over ascending
  * indices — bit-identical to both the higher-order formulation and
  * the DuckDB `list_aggregate(list_transform(...), 'sum')` oracle
  * restatement, so swapping it into a gated query cannot change a
  * hash.
  */
object CosineSim {

  /** Shared by eval and generated code. Left-to-right fold; divide by
    * the product of root norms.
    */
  def compute(a: ArrayData, b: ArrayData, na: Double, nb: Double): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s / (Math.sqrt(na) * Math.sqrt(nb))
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CosineSimExpression].getName, "cosine_sim")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 4,
      "cosine_sim takes (vec_a, vec_b, norm_sq_a, norm_sq_b)")
    // coerce at analysis time (array<float> inputs and int norms work);
    // identity casts are erased by SimplifyCasts
    CosineSimExpression(
      Cast(args(0), ArrayType(DoubleType)), Cast(args(1), ArrayType(DoubleType)),
      Cast(args(2), DoubleType), Cast(args(3), DoubleType))
  }
}

case class CosineSimExpression(first: Expression, second: Expression,
                               third: Expression, fourth: Expression)
  extends QuaternaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any, na: Any, nb: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      na.asInstanceOf[Double], nb.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, na, nb) =>
      s"graft.functions.CosineSim.compute($a, $b, $na, $nb)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): CosineSimExpression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}
