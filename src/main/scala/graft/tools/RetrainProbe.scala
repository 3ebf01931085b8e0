package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Re-train cost curve for the IVF codebook (s15's trigger — VERDICT r7
  * directive 4): time KMeansLite.fit (hash-ordered init + one Lloyd
  * iteration, the s8/s9/s13 trainer) at 1×/10×/50× the sf0.1
  * embeddings. The claim under test: re-training is one argmin
  * assignment pass plus a decimal-mean aggregation — linear in corpus
  * size, no pairwise term — so when s15's staleness trigger fires, the
  * re-train is priced like ONE extra scan, not an index rebuild (the
  * corpus re-ASSIGN after a re-train is the same zero-shuffle pass the
  * serve path already runs). Results feed PERF.md.
  */
object RetrainProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val d = "/root/testdata/sf0.1"
    for (n <- Seq(1, 10, 50)) {
      val path = s"/tmp/retrain_vecs_$n"
      val marker = java.nio.file.Paths.get(s"${path}_src.txt")
      val tag = s"$d n=$n replicateVecs-v1"
      val fresh = new java.io.File(path).exists() &&
        java.nio.file.Files.exists(marker) &&
        java.nio.file.Files.readString(marker) == tag
      if (!fresh) {
        ScaleProbe.replicateVecs(spark, d, n).write.mode("overwrite").parquet(path)
        java.nio.file.Files.writeString(marker, tag)
      }
      val vecs = graft.operators.VectorOps.vecs(
        spark.read.parquet(path)).select("vec_id", "v", "nn")
      val nv = vecs.count()
      val (fitted, tFit) = time {
        graft.operators.KMeansLite.fit(vecs, "vec_id", "v", 4, 1)
      }
      // the post-retrain maintenance pass: re-assign every vector under
      // the new codebook (zero-shuffle map)
      val cents = fitted.map { case (cid, cv) =>
        (cid.toLong, cv, cv.map(x => x * x).sum)
      }
      val (_, tAssign) = time {
        vecs.withColumn("cell",
          graft.operators.VectorOps.ivfAssignUdf(cents)(col("v"), col("nn")))
          .count()
      }
      println(f"RETRAIN n=$n%2d vecs=$nv%8d fit=$tFit%6.2fs reassign=$tAssign%6.2fs")
    }
    spark.stop()
  }
}
