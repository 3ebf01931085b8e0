package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off local probe: schema/read sanity for the testdata tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (n <- Seq("events", "orders", "lineitem", "embeddings")) {
      println(s"=== $n")
      val df = spark.read.parquet(s"$dir/$n.parquet")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.selectExpr("min(user_id)", "max(user_id)", "min(ts)", "max(ts)",
      "timestamp_micros(cast(min(ts)/1000 as long)) as min_ts").show(truncate = false)
    spark.read.parquet(s"$dir/orders.parquet")
      .selectExpr("min(o_custkey)", "max(o_custkey)", "min(o_orderdate)", "max(o_orderdate)")
      .show(truncate = false)
    spark.stop()
  }
}
