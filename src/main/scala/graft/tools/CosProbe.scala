package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.VectorOps

/** Measure the native cosine_sim expression against the interpreted
  * higher-order formulation on a brute-force scoring workload
  * (replicated sf0.1 embeddings × broadcast query set). Feeds PERF.md.
  */
object CosProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)

    val e = VectorOps.vecs(ScaleProbe.replicateVecs(spark, "/root/testdata/sf0.1", 50))
      .select("vec_id", "v", "nn")
    e.write.mode("overwrite").parquet("/tmp/cos_vecs")
    val vecs = spark.read.parquet("/tmp/cos_vecs")
    val q = vecs.where(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"))
    val scored = vecs.crossJoin(broadcast(q)) // 100k × 20 = 2M cosines

    def t(label: String, cosCol: org.apache.spark.sql.Column): Unit = {
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = scored.withColumn("cos", cosCol).where(col("cos") > 0.999).count()
        println(f"COS $label%-12s round=$round ${(System.nanoTime() - t0) / 1e9}%6.2fs hits=$n")
      }
    }
    t("interpreted",
      expr("aggregate(zip_with(qv, v, (x, y) -> x * y), cast(0 as double), (a, x) -> a + x)") /
        (sqrt(col("qn")) * sqrt(col("nn"))))
    t("native", expr("cosine_sim(qv, v, qn, nn)"))
    spark.stop()
  }
}
