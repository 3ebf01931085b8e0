package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val t0 = System.nanoTime()
    val df = ScaleProbe.replicateDocs(spark, d, 1)
    println("COUNT=" + df.count() + " t=" + (System.nanoTime()-t0)/1e9)
    val t1 = System.nanoTime()
    df.write.mode("overwrite").parquet("/tmp/scale_docs_probe")
    println("WRITE t=" + (System.nanoTime()-t1)/1e9)
    spark.stop()
  }
}
