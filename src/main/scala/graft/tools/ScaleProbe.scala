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
    graft.GraftExtensions.registerNative(spark)
    val d = "/root/testdata/sf0.1"

    for (n <- Seq(1, 10, 50)) {
      val docsPath = s"/tmp/scale_docs_$n"
      val vecsPath = s"/tmp/scale_vecs_$n"
      replicateDocs(spark, d, n).write.mode("overwrite").parquet(docsPath)
      replicateVecs(spark, d, n).write.mode("overwrite").parquet(vecsPath)
      val docs = spark.read.parquet(docsPath).withColumn("w", split(col("text"), " "))
      val nDocs = docs.count()

      // pair OUTPUT is inherently quadratic in duplicate density —
      // estimate sum(B^2/2) over band buckets first and skip the count
      // when the output itself is the bottleneck (log it, don't hide it)
      val bandsDf = MinHashLSH.bands(docs, "doc_id", col("w"), 4)
      val est = bandsDf.groupBy("band", "h").count()
        .agg(sum(expr("count * (count - 1) / 2"))).first().getDouble(0)
      val (pairs, tLsh) =
        if (est < 5e7) time(MinHashLSH.candidatePairs(docs, "doc_id", col("w")).count())
        else { println(f"SCALE n=$n%2d pair path SKIPPED: est. $est%.2g candidate pairs (output-bound)"); (-1L, -1.0) }
      val (_, tTf) = time {
        docs.select(explode(col("w")).as("t")).groupBy("t").count().count()
      }
      // index-size knob: target a few hundred vectors per bucket (the
      // 4-bit gated-query setting is for thousands of vectors, not
      // hundreds of thousands)
      val nVecsRaw = spark.read.parquet(vecsPath).count()
      val bits = math.max(4, (math.log(nVecsRaw / 250.0) / math.log(2)).ceil.toInt)
      val vecs = VectorOps.vecs(spark.read.parquet(vecsPath))
        .withColumn("bucket", VectorOps.bucketBits(bits))
        .select("vec_id", "v", "nn", "bucket")
      // the shipped operator (bucket-cap routing included)
      val (nd, tNd) = time {
        VectorOps.neardupPairs(vecs, minCos = 0.29).count()
      }

      // ANN path (s4 shape): 8 broadcast queries, bucket equi-join,
      // top-10 per query; plus the candidates-per-bucket distribution
      // that bounds per-query work
      val qids = (0 until 8).map(i => (i * n).toLong)
      val q = vecs.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id").as("qid"), col("v").as("qv"),
          col("nn").as("qn"), col("bucket"))
      val (topk, tAnn) = time {
        vecs.join(broadcast(q), "bucket")
          .where(col("vec_id") =!= col("qid"))
          .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
          .where(col("rank") <= 10)
          .count()
      }
      val dist = vecs.groupBy("bucket").count()
        .agg(min("count").as("mn"), avg("count").as("av"), max("count").as("mx"))
        .first()
      println(f"SCALE n=$n%2d docs=$nDocs%7d lsh=$tLsh%6.1fs (pairs=$pairs) " +
        f"tf=$tTf%5.1fs neardup=$tNd%6.1fs (cands=$nd)")
      println(f"SCALE-ANN n=$n%2d vecs=$nVecsRaw%7d bits=$bits%2d topk_rows=$topk%4d ann=$tAnn%6.2fs " +
        f"bucket_sz min=${dist.getLong(0)}%d avg=${dist.getDouble(1)}%.0f max=${dist.getLong(2)}%d")
    }
    spark.stop()
  }
}
