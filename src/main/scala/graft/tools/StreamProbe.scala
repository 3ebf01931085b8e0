package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing for the streaming gates' fixed costs (which of
  * staging / schema-infer / start / first-batch / stop / read-back
  * dominates). Dev probe feeding PERF.md.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PHASE $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
    }
    for (round <- 1 to 2) {
      println(s"== round $round")
      val stage = t("stage") {
        val dir = java.nio.file.Files.createTempDirectory("probe_in_").toString
        val df = graft.sources.Tables.events(spark, d)
          .select("event_id", "ts", "user_id", "event_type", "value")
        df.coalesce(1).write.mode("overwrite").parquet(dir)
        df.coalesce(1).write.mode("append").parquet(dir)
        dir
      }
      val stream = t("schema+source") {
        graft.streaming.EventStreams.dedupEvents(
          graft.streaming.EventStreams.readEventStream(spark, stage)
            .select("event_id", "ts", "user_id", "event_type", "value"))
      }
      val outDir = java.nio.file.Files.createTempDirectory("probe_out_").toString
      val ckpt = java.nio.file.Files.createTempDirectory("probe_ck_").toString
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val q = t("start") {
        stream.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.write.mode("append").parquet(outDir)
          }.start()
      }
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      t("processAllAvailable")(q.processAllAvailable())
      t("stop")(q.stop())
      t("readback")(println("rows=" + spark.read.parquet(outDir).count()))
    }
    spark.stop()
  }
}
