package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkEntry, SparkSpec}
import graft.sources.Tables

/** SQL-surface parity: users who speak SQL instead of the DataFrame API
  * get identical results through temp views + spark.sql, including the
  * extension-registered functions.
  */
class SqlSurfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    Tables.names.foreach { t =>
      try Tables(spark, sfDir, t).createOrReplaceTempView(t)
      catch { case _: Throwable => () }
    }

  test("SQL aggregation equals the DataFrame pack result") {
    registerViews()
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val df = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy("l_returnflag", "l_linestatus").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sql == df)
  }

  test("SQL window + join pipeline equals the gated query") {
    registerViews()
    val sql = spark.sql(
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey, row_number() OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gated = SparkEntry.queries("w1_latest_order_per_customer")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sql == gated)
  }

  test("extension functions are callable from SQL over views") {
    registerViews()
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("uuid3"),
      graft.functions.Uuid3.info, graft.functions.Uuid3.builder)
    val ids = spark.sql(
      "SELECT uuid3(concat(source, ':', cast(doc_id as string))) AS uid FROM documents LIMIT 5")
      .collect().map(_.getString(0))
    assert(ids.forall(u => u.length == 36 && u.charAt(14) == '3'))
    assert(ids.distinct.length == ids.length)
  }
}
