package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CounterAggregatorSpec extends SparkSpec {

  test("counter maps merge per group and match explode+count") {
    import spark.implicits._
    val docs = Seq(
      ("ch", Map("der" -> 3L, "die" -> 1L)),
      ("ch", Map("der" -> 2L, "das" -> 5L)),
      ("zh", Map("die" -> 7L))
    ).toDF("canton", "counter")

    val merged = docs.groupBy("canton")
      .agg(udaf(CounterAggregator).apply(col("counter")).as("counter"))
      .as[(String, Map[String, Long])].collect().toMap

    assert(merged("ch") == Map("der" -> 5L, "die" -> 1L, "das" -> 5L))
    assert(merged("zh") == Map("die" -> 7L))

    // equivalence with the explode+count formulation (the preferred
    // columnar shape, TextQueries.t4)
    val exploded = docs.select(col("canton"), explode(col("counter")).as(Seq("tok", "n")))
      .groupBy("canton", "tok").agg(sum("n").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val flat = merged.flatMap { case (c, m) => m.map { case (k, v) => (c, k) -> v } }
    assert(exploded == flat)
  }

  test("aggregator over real token counters from documents") {
    import spark.implicits._
    val toCounter = udf { words: Seq[String] =>
      words.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    }
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), toCounter(split(col("text"), " ")).as("counter"))
    val agg = docs.groupBy("lang")
      .agg(udaf(CounterAggregator).apply(col("counter")).as("counter"))
      .as[(String, Map[String, Long])].collect().toMap

    val direct = graft.sources.Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

    val flat = agg.flatMap { case (l, m) => m.map { case (k, v) => (l, k) -> v } }
    assert(flat == direct)
  }
}
