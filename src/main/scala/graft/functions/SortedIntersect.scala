package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `sorted_intersect_size(a, b)` — |a ∩ b| for two SORTED int arrays
  * (duplicate-free), as a native codegen'd two-pointer merge.
  *
  * This is the set-similarity verify hot path (SetSimJoin): built-in
  * `array_intersect` builds a hash set per evaluation and materializes
  * the intersection array just to take its size, and on string tokens
  * each probe pays UTF8String hashing — measured 3.3× slower than the
  * interned-int merge at sf0.1 (tools.SetSimProbe). The merge does one
  * linear pass over the two ArrayData buffers, allocates nothing, and
  * each comparison is a primitive int compare.
  *
  * CONTRACT: both arrays ascending-sorted and deduped — exactly what
  * SetSimJoin's `sort_array(collect_list(tid))` over distinct tokens
  * produces. Unsorted input under-counts; the operator owns the
  * invariant, the expression documents it.
  */
object SortedIntersect {

  /** Shared by eval and generated code: two-pointer merge count. */
  def size(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SortedIntersectSizeExpression].getName, "sorted_intersect_size")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "sorted_intersect_size takes (array_a, array_b)")
    SortedIntersectSizeExpression(
      Cast(args(0), ArrayType(IntegerType)), Cast(args(1), ArrayType(IntegerType)))
  }
}

case class SortedIntersectSizeExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersect.size(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersect.size($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpression =
    copy(left = newLeft, right = newRight)
}
