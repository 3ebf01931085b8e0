package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GlobalRank

/** Window-ntile (single partition) vs GlobalRank (distributed) on a
  * synthetic fact table — the W3 scale story, measured. Results feed
  * PERF.md.
  */
object NtileProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"NTILE $label%-16s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    for (n <- Seq(1000000L, 10000000L)) {
      val df = spark.range(n).select(
        (col("id") * 2654435761L % 1000003L).as("v"), col("id"))
      println(s"NTILE n=$n")
      t("window") {
        df.withColumn("q", ntile(4).over(Window.orderBy("v", "id")))
          .groupBy("q").count().count()
      }
      t("distributed") {
        // smallInputRows=0 forces the distributed plan — the probe
        // measures the machinery, not the adaptive dispatch
        GlobalRank.ntileGlobal(df, 4, Seq(col("v"), col("id")), "q", 0L)
          .groupBy("q").count().count()
      }
      t("adaptive") {
        GlobalRank.ntileGlobal(df, 4, Seq(col("v"), col("id")), "q")
          .groupBy("q").count().count()
      }
    }
    spark.stop()
  }
}
