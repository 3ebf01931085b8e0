package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `minhash_sig(words, k)` — the MinHash signature (the dedup family's
  * dominant per-row cost) as a native Catalyst expression.
  *
  * Bit-identical to the fused UDF formulation (MinHashLSH
  * .fusedSignatureUdf): position j of the signature is the
  * lexicographic minimum of `md5hex(j.toString ++ shingle)` over the
  * document's distinct 3-gram shingles. Two things make the native
  * version faster than the UDF:
  *
  *  - zero String materialization: shingles are built as UTF8String
  *    concats over the array's raw UTF-8 bytes (the UDF pays
  *    UTF8String→String conversion for every word, then String concat,
  *    then getBytes back);
  *  - the running minimum is kept as the 16 raw digest bytes compared
  *    unsigned — hex encoding is order-preserving, so only the k final
  *    minima are hex-encoded (the UDF hex-encodes every candidate).
  *
  * Marked NON-deterministic for the same reason the UDF is: it feeds
  * `posexplode`, and CollapseProject would otherwise inline (=
  * recompute) the signature into every consumer of the column.
  */
object MinHashSig {

  private val SPACE = UTF8String.fromString(" ")
  private val digestTl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  // j.toString UTF-8 bytes, cached per signature width
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixes(k: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(k,
      (n: Int) => Array.tabulate(n)(_.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(b: Array[Byte]): UTF8String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(2 * i) = hexChars((b(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(b(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** unsigned lexicographic byte compare — the order hex strings sort in */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  /** Shared by eval and generated code. Null elements are skipped like
    * the UDF's (split never produces them); < 3 words → all-null
    * signature (never joins).
    */
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = if (words == null) 0 else words.numElements()
    val mins = new Array[Array[Byte]](k)
    if (n >= 3) {
      val md = digestTl.get()
      val pref = prefixes(k)
      val seen = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i + 2 < n) {
        val sh = UTF8String.concat(
          words.getUTF8String(i), SPACE,
          words.getUTF8String(i + 1), SPACE,
          words.getUTF8String(i + 2))
        // concat yields null when an element is null (split never
        // produces one) — skip rather than NPE
        if (sh != null && seen.add(sh)) {
          val shBytes = sh.getBytes
          var j = 0
          while (j < k) {
            md.reset()
            md.update(pref(j))
            md.update(shBytes)
            val d = md.digest()
            if (mins(j) == null || less(d, mins(j))) mins(j) = d
            j += 1
          }
        }
        i += 1
      }
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = if (mins(j) == null) null else hex(mins(j)); j += 1 }
    new GenericArrayData(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[MinHashSigExpression].getName, "minhash_sig")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 2, "minhash_sig takes (words array<string>, k int)")
    MinHashSigExpression(args(0), args(1))
  }
}

case class MinHashSigExpression(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType.isInstanceOf[ArrayType] &&
      left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects (array<string>, int), got (${left.dataType}, ${right.dataType})")
  }

  // eval-once barrier: block CollapseProject from inlining the
  // signature into every consumer (same contract as the UDF's
  // .asNondeterministic marker)
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(words: Any, k: Any): Any =
    MinHashSig.compute(words.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, k) => s"graft.functions.MinHashSig.compute($w, $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigExpression =
    copy(left = newLeft, right = newRight)
}
