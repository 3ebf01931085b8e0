package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.VectorOps
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
    Tables.embeddings(spark, d).count()
    val e = VectorOps.vecs(Tables.embeddings(spark, d))
      .withColumn("bucket", VectorOps.bucket)
      .select("vec_id", "v", "nn", "bucket")
    time("vecs+bucket")(e.count())
    val a = e.toDF("ia", "va", "na", "bucket")
    val b = e.toDF("ib", "vb", "nb", "bucket")
    val j = a.join(b, Seq("bucket")).where(col("ia") < col("ib"))
    time("join only")(println("pairs=" + j.count()))
    val withCosExpr = j.withColumn("cos", round(
      expr("aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)") /
        (sqrt(col("na")) * sqrt(col("nb"))), 6))
      .where(col("cos") > 0.3)
    time("cos expr")(withCosExpr.count())
    spark.stop()
  }
}
