package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `char_ngrams(text, n)` — all character n-grams of `text`, in order
  * (the multiset, not deduped), as a native codegen'd expression:
  * matches `transform(sequence(1, length(t)-n+1), i -> substring(t,i,n))`
  * for `length(t) >= n` (CHARACTER semantics — multibyte text counts
  * code points like `substring`/`length` do, via UTF8String), and like
  * [[WordNgrams]] returns an EMPTY array for `n <= 0` or shorter
  * inputs. One pass over the string; each gram is one UTF8String
  * substring, no boxed index arithmetic per gram.
  */
object CharNgrams {

  def compute(text: UTF8String, n: Int): ArrayData = {
    if (text == null || n <= 0) return new GenericArrayData(Array.empty[Any])
    val len = text.numChars()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i + n <= len) {
      out(i) = text.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[CharNgramsExpression].getName, "char_ngrams")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "char_ngrams takes (text string, n int)")
    CharNgramsExpression(args(0), args(1))
  }
}

case class CharNgramsExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"char_ngrams expects (string, int), got ($l, $r)")
    }

  override protected def nullSafeEval(text: Any, n: Any): Any =
    CharNgrams.compute(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.CharNgrams.compute($t, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharNgramsExpression =
    copy(left = newLeft, right = newRight)
}
