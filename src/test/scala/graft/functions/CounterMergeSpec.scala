package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CounterMergeSpec extends SparkSpec {

  private def register(): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier("counter_merge"),
      CounterMerge.info, CounterMerge.builder)

  test("native SQL aggregate merges counter maps per group") {
    register()
    import spark.implicits._
    val df = Seq(
      ("ch", Map("der" -> 3L, "die" -> 1L)),
      ("ch", Map("der" -> 2L, "das" -> 5L)),
      ("zh", Map("die" -> 7L))
    ).toDF("canton", "counter")
    df.createOrReplaceTempView("counters")
    val got = spark.sql(
      "SELECT canton, counter_merge(counter) AS c FROM counters GROUP BY canton")
      .as[(String, Map[String, Long])].collect().toMap
    assert(got("ch") == Map("das" -> 5L, "der" -> 5L, "die" -> 1L))
    assert(got("zh") == Map("die" -> 7L))
  }

  test("matches explode+count on real token counters across partitions") {
    register()
    import spark.implicits._
    val toCounter = udf { words: Seq[String] =>
      words.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    graft.sources.Tables.documents(spark, sfDir)
      .repartition(7) // force partial/merge across partitions
      .select(col("lang"), toCounter(split(col("text"), " ")).as("counter"))
      .createOrReplaceTempView("doc_counters")
    val agg = spark.sql(
      "SELECT lang, counter_merge(counter) AS c FROM doc_counters GROUP BY lang")
      .as[(String, Map[String, Long])].collect().toMap
    val direct = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val flat = agg.flatMap { case (l, m) => m.map { case (k, v) => (l, k) -> v } }
    assert(flat == direct)
  }

  test("empty and null maps are absorbed") {
    register()
    import spark.implicits._
    Seq(("a", Map("x" -> 1L)), ("a", Map.empty[String, Long]))
      .toDF("g", "counter").createOrReplaceTempView("cm_edge")
    val r = spark.sql("SELECT counter_merge(counter) AS c FROM cm_edge")
      .as[Map[String, Long]].collect().head
    assert(r == Map("x" -> 1L))
  }
}
