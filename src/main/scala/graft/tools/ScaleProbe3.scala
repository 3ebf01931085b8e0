package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{KMeansLite, VectorOps}

/** Scaling measurement for the TRAINED ANN tiers (s9 IVF, s10 PQ) over
  * the replicated embeddings written by ScaleProbe: codebook fit time
  * (driver+cluster, k rows out), zero-shuffle cell assignment, the
  * nprobe=2 probe join's candidate fan-out, and the PQ encode + ADC
  * scan. The point is the CURVE — fit/assign/encode linear in corpus
  * size, probe fan-out tracking corpus/cells, no quadratic step.
  * Results feed PERF.md.
  */
object ScaleProbe3 {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)

    for (n <- Seq(1, 10, 50)) {
      val vecsPath = s"/tmp/scale_vecs_$n"
      if (!new java.io.File(vecsPath).exists())
        ScaleProbe.replicateVecs(spark, "/root/testdata/sf0.1", n)
          .write.mode("overwrite").parquet(vecsPath)
      val e = VectorOps.vecs(spark.read.parquet(vecsPath))
        .select("vec_id", "v", "nn")
        .persist()
      val nVecs = e.count()

      // ---- s9 shape: train once, assign corpus, probe join top-5
      val (cents, tFit) = time(KMeansLite.fit(e, "vec_id", "v", 4, 1))
      val ivfCents = cents.map { case (cid, cv) =>
        (cid.toLong, cv, cv.map(x => x * x).sum) }
      val assigned = e.withColumn("cell",
        VectorOps.ivfAssignUdf(ivfCents)(col("v"), col("nn"))).persist()
      val (_, tAssign) = time(assigned.count())
      val q = e.where(col("vec_id").isin((0 until 8).map(i => (i * n).toLong): _*))
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"),
          explode(VectorOps.ivfProbeUdf(ivfCents, 2)(col("v"), col("nn"))).as("cell"))
      val (fanout, tProbe) = time {
        assigned.join(broadcast(q), Seq("cell"))
          .where(col("vec_id") =!= col("qid")).count()
      }
      val (_, tTopk) = time {
        assigned.join(broadcast(q), Seq("cell"))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
          .where(col("rank") <= 5).count()
      }
      println(f"SCALE-IVF n=$n%2d vecs=$nVecs%7d fit=$tFit%6.2fs assign=$tAssign%6.2fs " +
        f"probe_fanout=$fanout%8d (per-q=${fanout / 8}%7d) probe=$tProbe%6.2fs topk=$tTopk%6.2fs")

      // ---- s10 shape: PQ encode (4 sub-codebooks from the trained
      // centroids' subspaces), ADC scan for 2 queries
      val pqCents = cents.map { case (cid, cv) => (cid.toLong, cv) }
      val (_, tEnc) = time {
        e.select(col("vec_id"), VectorOps.pqEncodeUdf(pqCents, 4)(col("v")).as("codes"))
          .write.mode("overwrite").parquet(s"/tmp/scale_pq_$n")
      }
      val enc = spark.read.parquet(s"/tmp/scale_pq_$n")
      val qAdc = e.where(col("vec_id").isin(0L, n.toLong))
        .select(col("vec_id").as("qid"), VectorOps.pqAdcUdf(pqCents, 4)(col("v")).as("adc"))
      val (_, tAdc) = time {
        enc.crossJoin(broadcast(qAdc))
          .where(col("vec_id") =!= col("qid"))
          .withColumn("dist",
            expr("adc[0][codes[0]] + adc[1][codes[1]] + adc[2][codes[2]] + adc[3][codes[3]]"))
          .withColumn("rank", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(col("dist").asc, col("vec_id"))))
          .where(col("rank") <= 5).count()
      }
      val rawBytes = nVecs * 64 * 8
      val encBytes = new java.io.File(s"/tmp/scale_pq_$n").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      println(f"SCALE-PQ  n=$n%2d vecs=$nVecs%7d encode=$tEnc%6.2fs adc_scan=$tAdc%6.2fs " +
        f"enc_bytes=$encBytes%9d (raw~$rawBytes%10d)")
      assigned.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
