package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH

/** Keep-list scaling measurement over the replicated corpora written by
  * ScaleProbe (pair-free dedup — output linear in corpus size even when
  * the corpus is massively duplicated).
  */
object ScaleProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq(1, 10, 50)) {
      val path = s"/tmp/scale_docs_$n"
      if (new java.io.File(path).exists()) {
        val docs = spark.read.parquet(path).withColumn("w", split(col("text"), " "))
        val t0 = System.nanoTime()
        val keep = MinHashLSH.dedupKeepList(docs, "doc_id", col("w"))
        val kept = keep.where(col("doc_id") === col("keep_id")).count()
        val total = keep.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"KEEPLIST n=$n%2d docs=$total%7d kept=$kept%7d t=$t%6.1fs")
      }
    }
    spark.stop()
  }
}
