package graft.functions

import java.nio.charset.StandardCharsets
import java.util.UUID
import graft.SparkSpec

class Uuid3Spec extends SparkSpec {

  test("matches java.util.UUID.nameUUIDFromBytes (independent md5-uuid impl)") {
    for (name <- Seq("python.org", "a", "", "ZH_VG_001: file.html", "äöü✓")) {
      val expected = UUID.nameUUIDFromBytes(
        Uuid3.namespace ++ name.getBytes(StandardCharsets.UTF_8)).toString
      assert(Uuid3.compute(name) == expected, s"name=$name")
    }
  }

  test("well-formed: version 3, RFC variant, stable") {
    val u = Uuid3.compute("some-document")
    assert(u.length == 36)
    assert(u.charAt(14) == '3')
    assert("89ab".contains(u.charAt(19)))
    assert(u == Uuid3.compute("some-document"))
  }

  test("SQL registration + codegen path produce the same ids as eval") {
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("uuid3"),
      Uuid3.info, Uuid3.builder)
    import spark.implicits._
    val rows = Seq("x", "y", "z").toDF("name")
      .selectExpr("name", "uuid3(name) AS uid").collect()
    rows.foreach(r => assert(r.getString(1) == Uuid3.compute(r.getString(0))))
    // null-safety
    val n = Seq(Option.empty[String]).toDF("name")
      .selectExpr("uuid3(name) AS uid").collect()
    assert(n.head.isNullAt(0))
    // non-string args coerce at analysis time instead of CCE at runtime
    val i = Seq(123).toDF("k").selectExpr("uuid3(k) AS uid").collect()
    assert(i.head.getString(0) == Uuid3.compute("123"))
  }

  test("extension class applies cleanly and SQL resolves uuid3") {
    // the builder can't re-create the session in-suite (getOrCreate
    // reuses it), so apply the extension object directly…
    new graft.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    // …and drive the same injection through the live registry + SQL
    val s2 = spark.newSession()
    s2.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("uuid3"),
      Uuid3.info, Uuid3.builder)
    assert(s2.sql("SELECT uuid3('q') AS u").collect().head.getString(0) ==
      Uuid3.compute("q"))
    graft.GraftExtensions.registerUdfs(s2)
    assert(s2.sql("SELECT roman_to_int('XIV') AS n").collect().head.getInt(0) == 14)
  }
}
