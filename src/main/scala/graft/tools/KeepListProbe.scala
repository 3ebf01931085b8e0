package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH

/** Round-level timing of the keep-list fixpoint loop at sf0.1 — which
  * of round count / per-round shuffles / convergence actions dominates.
  */
object KeepListProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val d = "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, d)
      .withColumn("w", split(col("text"), " "))
    for (trial <- 1 to 3) {
      var t0 = System.nanoTime()
      val b = MinHashLSH.bands(docs, "doc_id", col("w"), 4)
      val nb = b.count()
      println(f"bands: ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$nb")
      t0 = System.nanoTime()
      val (keep, rounds) = MinHashLSH.convergeKeepListWithStats(b, "doc_id")
      val n = keep.count()
      println(f"trial $trial fixpoint: ${(System.nanoTime() - t0) / 1e9}%.2fs rounds=$rounds rows=$n")
    }
    spark.stop()
  }
}
