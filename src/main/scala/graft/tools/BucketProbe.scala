package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps

/** Isolated cost of the hyperplane-bucket expression (interpreted
  * higher-order lambdas) over the sf0.1 embeddings — is a native
  * expression warranted for the s3/s4/s11/d5 family?
  */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val e = VectorOps.vecs(graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.1"))
      .select("vec_id", "v", "nn").persist()
    println("vecs=" + e.count())
    for (trial <- 1 to 3) {
      var t0 = System.nanoTime()
      e.select(sum(VectorOps.bucket.cast("long"))).collect()
      println(f"trial $trial bucket4: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
      e.select(sum(col("nn"))).collect()
      println(f"trial $trial nn-only: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
