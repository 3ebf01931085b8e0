package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{MinHashLSH, VectorOps}
import graft.sources.Tables

/** Scaling experiment: replicate the sf0.1 documents/embeddings N× (new
  * ids, shifted content so near-dup structure stays realistic) and
  * measure the LSH dedup + ANN paths. The point is the CURVE — linear
  * per-doc cost and no quadratic blowup — not the absolute numbers.
  * Results feed PERF.md.
  */
object ScaleProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def replicateDocs(spark: SparkSession, d: String, n: Int): DataFrame =
    Tables.documents(spark, d)
      .crossJoin(spark.range(n).toDF("rep"))
      .select(
        (col("doc_id") * n + col("rep")).as("doc_id"),
        // rotate the word stream per replica so shingles differ
        concat_ws(" ", expr("slice(split(text, ' '), CAST(rep % 5 + 1 AS INT), 10000)"),
          col("rep").cast("string")).as("text"),
        col("lang"), col("source"))

  def replicateVecs(spark: SparkSession, d: String, n: Int): DataFrame =
    Tables.embeddings(spark, d)
      .crossJoin(spark.range(n).toDF("rep"))
      .select(
        (col("vec_id") * n + col("rep")).as("vec_id"),
        expr("transform(embedding, (x, i) -> x + CAST(rep AS FLOAT) * 0.001 * CAST(i % 7 AS FLOAT))")
          .as("embedding"),
        col("label"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    for (n <- Seq(1, 10, 50)) {
      val docsPath = s"/tmp/scale_docs_$n"
      val vecsPath = s"/tmp/scale_vecs_$n"
      replicateDocs(spark, d, n).write.mode("overwrite").parquet(docsPath)
      replicateVecs(spark, d, n).write.mode("overwrite").parquet(vecsPath)
      val docs = spark.read.parquet(docsPath).withColumn("w", split(col("text"), " "))
      val nDocs = docs.count()

      val (pairs, tLsh) = time {
        MinHashLSH.candidatePairs(docs, "doc_id", col("w")).count()
      }
      val (_, tTf) = time {
        docs.select(explode(col("w")).as("t")).groupBy("t").count().count()
      }
      val vecs = VectorOps.vecs(spark.read.parquet(vecsPath))
        .withColumn("bucket", VectorOps.bucket)
        .select("vec_id", "v", "nn", "bucket")
      val (nd, tNd) = time {
        vecs.groupBy("bucket")
          .agg(collect_list(col("vec_id")).as("ids"), collect_list(col("v")).as("vs"),
            collect_list(col("nn")).as("nns"))
          .select(explode(VectorOps.bucketPairsUdf(
            col("ids"), col("vs"), col("nns"), lit(0.29))).as("p"))
          .count()
      }
      println(f"SCALE n=$n%2d docs=$nDocs%7d lsh=$tLsh%6.1fs (pairs=$pairs) " +
        f"tf=$tTf%5.1fs neardup=$tNd%6.1fs (cands=$nd)")
    }
    spark.stop()
  }
}
