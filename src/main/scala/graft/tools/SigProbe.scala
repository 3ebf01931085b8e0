package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH

/** Measure the MinHash signature hot path: fused Scala UDF vs the
  * native codegen'd expression (functions.MinHashSig), same k, same
  * corpus (sf0.1 documents replicated 10x), count of non-null band
  * rows as the forcing action. Results feed PERF.md.
  */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .crossJoin(spark.range(10).select(col("id").as("rep")))
      .select(expr("doc_id * 10 + rep").as("doc_id"),
        split(col("text"), " ").as("w"))
      .persist()
    println(s"SIG docs=${docs.count()}")
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SIG $label%-10s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    for (round <- 1 to 2) {
      t(s"udf-$round") {
        docs.withColumn("sig", MinHashLSH.fusedSignatureUdf(4)(col("w")))
          .select(explode(col("sig")).as("h")).where(col("h").isNotNull).count()
      }
      t(s"native-$round") {
        docs.withColumn("sig", expr("minhash_sig(w, 4)"))
          .select(explode(col("sig")).as("h")).where(col("h").isNotNull).count()
      }
    }
    spark.stop()
  }
}
