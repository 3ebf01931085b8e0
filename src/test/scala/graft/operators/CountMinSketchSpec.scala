package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min properties: never an underestimate (the CMS guarantee),
  * cell-wise-sum mergeability, and overestimate boundedness on a
  * vocabulary big enough to force collisions.
  */
class CountMinSketchSpec extends SparkSpec {

  import spark.implicits._

  private def counts(n: Int, skew: Int) =
    spark.range(n).select(
      concat(lit("tok"), pmod(col("id") * col("id") + col("id"), lit(skew))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  test("estimates never underestimate, even with forced collisions") {
    // 6000 distinct values over 4096 cells per row — collisions certain
    val toks = counts(200000, 6000).cache()
    val cms = CountMinSketch.counters(toks, "token")
    val joined = CountMinSketch.estimates(toks.select("token"), cms, "token")
      .join(toks, "token")
    assert(joined.where(col("cms_est") < col("cnt")).isEmpty,
      "CMS must never underestimate")
    // and the heavy hitters stay well-estimated: median overestimate
    // bounded by the uniform-collision expectation
    val over = joined.select((col("cms_est") - col("cnt")).as("o"))
      .agg(expr("percentile(o, 0.5)")).collect()(0).getDouble(0)
    assert(over < 200000.0 * 2 / 1024, s"median overestimate $over too large")
  }

  test("sketches merge by cell-wise sum") {
    val toks = counts(50000, 500)
    val a = toks.where(pmod(length(col("token")), lit(2)) === 0)
    val b = toks.where(pmod(length(col("token")), lit(2)) === 1)
    val merged = CountMinSketch.counters(a, "token")
      .unionByName(CountMinSketch.counters(b, "token"))
      .groupBy("j", "c").agg(sum("counter").as("counter"))
    val full = CountMinSketch.counters(toks, "token")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty)
  }

  test("probing an unseen value returns 0 or a collision count, never null") {
    val toks = counts(1000, 10)
    val cms = CountMinSketch.counters(toks, "token")
    val probe = Seq("never_seen_token_xyz").toDF("token")
    val est = CountMinSketch.estimates(probe, cms, "token").collect()(0)
    assert(!est.isNullAt(est.fieldIndex("cms_est")) &&
      est.getAs[Long]("cms_est") >= 0L)
  }
}
