package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All gated queries live in `graft.queries.*` packs (one pack per SURVEY
  * §2 family); this object only concatenates them.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    EventQueries,
    MultimodalQueries,
    ExtractQueries,
    StatsQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 shape: selective dimension filter → fact join → grouped
    * revenue → top-10. Exercises broadcast join, partial agg, and
    * TakeOrderedAndProject in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val cust = Tables.customer(spark, d).where(col("c_mktsegment") === "BUILDING")
    Tables.orders(spark, d)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(spark, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate")
      .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
        .cast("decimal(28,4)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.all.map(q => q.name -> q.fn)).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.all.flatMap(q => q.oracle.map(q.name -> _))).toMap
}
