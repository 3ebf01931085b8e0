package graft.stats

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables

/** a24's mergeable-histogram quantile sketch: the estimate must land in
  * the same width-100 bin as the exact rank-target value (±binwidth
  * accuracy bound), and the sketch state must merge by plain addition —
  * the property that makes it a one-shuffle pass at 100 TB.
  */
class HistogramQuantileSpec extends SparkSpec {

  test("estimate is within one bin width of the exact rank-target value") {
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    val est = graft.SparkEntry.queries("a24_histogram_quantiles")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sorted = li.select(col("l_extendedprice").cast("double"))
      .orderBy("l_extendedprice").collect().map(_.getDouble(0))
    for (qm <- Seq(500L, 900L, 990L)) {
      val (target, e) = est(qm)
      assert(target === (n * qm + 999) / 1000)
      val exact = sorted((target - 1).toInt)
      assert(math.abs(e - exact) <= 100.0,
        s"qm=$qm est=$e exact=$exact")
    }
  }

  test("sketch state merges by addition: per-half bin counts sum to the full sketch") {
    val li = Tables.lineitem(spark, sfDir)
    def bins(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.groupBy(floor(col("l_extendedprice") / 100).cast("bigint").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = bins(li)
    val a = bins(li.where(col("l_orderkey") % 2 === 0))
    val b = bins(li.where(col("l_orderkey") % 2 =!= 0))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
    assert(merged === full)
  }
}
