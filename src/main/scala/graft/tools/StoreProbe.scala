package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.KeepListStore
import graft.queries.DedupQueries.chainBands

/** Phase-level timing of the d18 keep-list lifecycle at sf0.1 — which
  * of backfill / per-batch solve / bands append / fold dominates, to
  * decide where the store's fixed overhead goes.
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"PHASE $tag%-12s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
    for (trial <- 1 to 2) {
      println(s"== trial $trial")
      val ids = graft.sources.Tables.documents(spark, d).select("doc_id")
      val dir = graft.queries.Scratch.dir("storeprobe_").resolve("kl").toString
      time("backfill")(KeepListStore.backfill(
        chainBands(ids.where(col("doc_id") % 5 =!= 0 && col("doc_id") % 5 =!= 1)),
        "doc_id", dir))
      time("batch0")(KeepListStore.appendBatch(
        chainBands(ids.where(col("doc_id") % 5 === 0)), "doc_id", dir, 0L).count())
      time("batch1")(KeepListStore.appendBatch(
        chainBands(ids.where(col("doc_id") % 5 === 1)), "doc_id", dir, 1L).count())
      time("read")(KeepListStore.read(spark, dir, "doc_id").count())
      time("fold")(KeepListStore.fold(spark, dir, "doc_id"))
      time("read2")(KeepListStore.read(spark, dir, "doc_id").count())
    }
    spark.stop()
  }
}
