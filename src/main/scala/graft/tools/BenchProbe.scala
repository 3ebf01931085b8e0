package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH
import graft.sources.Tables

object BenchProbe {
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"TIME $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d).withColumn("w", split(col("text"), " "))
    time("docs count")(println(docs.count()))
    val sh = docs.withColumn("sh", MinHashLSH.shinglesUdf(col("w")))
    time("shingles")(sh.select(sum(size(col("sh")))).collect())
    val sig = sh.withColumn("sig", MinHashLSH.signatureUdf(4)(col("sh")))
    time("signatures")(sig.select(count(col("sig"))).collect())
    val bands = MinHashLSH.bands(docs, "doc_id", col("w"), 4)
    time("bands")(println("bands=" + bands.count()))
    val buckets = bands.groupBy("band", "h").agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")) > 1)
    time("buckets")(buckets.select(count(lit(1)), max(size(col("ids")))).show())
    val pairs = MinHashLSH.candidatePairs(docs, "doc_id", col("w"))
    time("pairs")(println("pairs=" + pairs.count()))
    spark.stop()
  }
}
