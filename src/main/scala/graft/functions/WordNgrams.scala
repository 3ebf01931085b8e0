package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(words, n)` — all space-joined word n-grams (the
  * multiset, in order — NOT deduped) as a native expression.
  *
  * Matches `transform(sequence(0, size(w)-n), i -> concat(w[i],' ',…))`
  * bit-for-bit for null-free arrays (split never produces null
  * elements) when `size(w) >= n`. Two DELIBERATE divergences at the
  * edges, both matching the DuckDB-oracle semantics rather than the
  * lambda form: (1) `size(w) < n` returns an EMPTY array, where Spark's
  * `sequence(0, negative)` would descend and the lambda form yields
  * null-concat grams; (2) `n <= 0` returns an empty array instead of
  * throwing — the function is SQL-registered, so any query can pass a
  * non-positive n. The lambda formulation also pays an interpreted
  * lambda call and boxed index arithmetic per gram; this builds each
  * gram as one UTF8String concat over the array's raw bytes.
  */
object WordNgrams {

  private val SPACE = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): ArrayData = {
    val sz = if (words == null) 0 else words.numElements()
    if (n <= 0 || sz < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](sz - n + 1)
    var i = 0
    while (i + n <= sz) {
      // interleave words and single spaces: n words, n-1 spaces
      val parts = new Array[UTF8String](2 * n - 1)
      var j = 0
      while (j < n) {
        parts(2 * j) = words.getUTF8String(i + j)
        if (j < n - 1) parts(2 * j + 1) = SPACE
        j += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[WordNgramsExpression].getName, "word_ngrams")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "word_ngrams takes (words array<string>, n int)")
    WordNgramsExpression(args(0), args(1))
  }
}

case class WordNgramsExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams expects (array<string>, int), got ($l, $r)")
    }

  override protected def nullSafeEval(words: Any, n: Any): Any =
    WordNgrams.compute(words.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n) => s"graft.functions.WordNgrams.compute($w, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordNgramsExpression =
    copy(left = newLeft, right = newRight)
}
