package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `uuid3(name)` — deterministic RFC 4122 name-based UUID (version 3,
  * md5) over the graft namespace, as a native Catalyst expression with
  * codegen (SURVEY §2.9: the only reference operation worth a real
  * `Expression` is the deterministic id — `uuid5(UUID(0), file_name)`,
  * `scrc/utils/sql_select_utils.py:168`; Spark's built-in `uuid()` is
  * non-deterministic and unusable for idempotent keys).
  *
  * The namespace is a fixed 16 ASCII bytes so external engines can
  * restate the id as bit-twiddled `md5(namespace || name)` — DuckDB's
  * md5 only accepts VARCHAR. The sha1-based uuid5 lives in
  * TextFunctions for strict RFC parity with the reference.
  */
object Uuid3 {

  /** 16-byte ASCII namespace (value is arbitrary but frozen — changing
    * it changes every id).
    */
  val namespace: Array[Byte] = "graft-namespace!".getBytes(StandardCharsets.US_ASCII)
  require(namespace.length == 16)

  private val hexChars = "0123456789abcdef".toCharArray

  /** md5(namespace ++ name) with version/variant bits patched, RFC
    * 8-4-4-4-12 formatting. Called from both eval and generated code.
    */
  def compute(name: String): String = {
    val md = MessageDigest.getInstance("MD5")
    md.update(namespace)
    md.update(name.getBytes(StandardCharsets.UTF_8))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x30).toByte // version 3
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC variant
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(hexChars((h(i) >> 4) & 0xf))
      sb.append(hexChars(h(i) & 0xf))
      i += 1
    }
    sb.toString
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Uuid3Expression].getName, "uuid3")

  val builder: Seq[Expression] => Expression = { args =>
    require(args.length == 1, "uuid3 takes exactly one argument")
    // non-string arguments are coerced at analysis time (ExpectsInputTypes
    // is private[sql], so the builder inserts the cast itself) — uuid3(123)
    // then works instead of throwing ClassCastException at runtime; the
    // identity cast on already-string args is erased by SimplifyCasts
    Uuid3Expression(Cast(args.head, StringType))
  }
}

case class Uuid3Expression(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "uuid3"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Uuid3.compute(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Uuid3.compute($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): Uuid3Expression =
    copy(child = newChild)
}
