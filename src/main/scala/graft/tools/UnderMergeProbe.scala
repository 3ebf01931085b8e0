package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH
object UnderMergeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val docs = graft.sources.Tables.documents(spark, d)
        .withColumn("w", split(col("text"), " "))
      val b = MinHashLSH.bands(docs, "doc_id", col("w"), 4).persist()
      val two = MinHashLSH.fixedHopKeepList(b, "doc_id", 2)
        .withColumnRenamed("keep_id", "k2")
      val fix = MinHashLSH.convergeKeepList(b, "doc_id")
      val joined = two.join(fix, "doc_id")
      val diff = joined.where(col("k2") =!= col("keep_id")).count()
      val n = joined.count()
      println(s"UNDERMERGE $d: docs=$n two_hop_differs_from_fixpoint=$diff")
      b.unpersist()
    }
    spark.stop()
  }
}
