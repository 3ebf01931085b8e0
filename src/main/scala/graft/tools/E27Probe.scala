package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Watermark-trajectory probe for the e27 late-data gate: drives the
  * exact A-then-B-then-flush landing sequence and prints each
  * micro-batch's input count and the watermark it ran under.
  */
object E27Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val stage = java.nio.file.Files.createTempDirectory("e27probe_").toString
    val ck = java.nio.file.Files.createTempDirectory("e27ck_").toString
    val out = java.nio.file.Files.createTempDirectory("e27out_").toString
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val ev = Tables.events(spark, d).select(cols.map(col): _*)
    val maxUs = ev.where(col("event_id") % 2 === 0)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    println(s"PROBE maxA_us=$maxUs wm_expected_us=${(maxUs / 1000 - 7200000) * 1000}")
    ev.where(col("event_id") % 2 === 0).coalesce(1).write.mode("append").parquet(stage)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val stream = spark.readStream.schema(ev.schema).parquet(stage)
    val agg = graft.streaming.EventStreams.tumblingCounts(stream)
    val q = agg.writeStream
      .option("checkpointLocation", ck)
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, bid: Long) =>
        println(s"PROBE batch=$bid emitted=${b.count()}")
        ()
      }
      .start()
    def wm(): Unit = {
      val p = q.lastProgress
      if (p != null)
        println(s"PROBE progress batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")}")
    }
    q.processAllAvailable(); wm()
    import spark.implicits._
    def flush(fid: Long, us: Long): Unit = {
      Seq((fid, us)).toDF("event_id", "us")
        .select(col("event_id"), expr("timestamp_micros(us)").as("ts"),
          lit(-1L).as("user_id"), lit("flush").as("event_type"), lit(0.0).as("value"))
        .coalesce(1).write.mode("append").parquet(stage)
      q.processAllAvailable(); wm()
    }
    // eviction batch BEFORE the late half: same max event time (wm
    // unchanged), but batch end evicts+emits all windows ≤ wm
    flush(-1L, maxUs)
    ev.where(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(stage)
    q.processAllAvailable(); wm()
    flush(-2L, maxUs + 720L * 3600000000L)
    flush(-3L, maxUs + 1440L * 3600000000L)
    q.stop()
    // duplicate-key check over the full emitted surface
    println("PROBE done")
    spark.stop()
  }
}
