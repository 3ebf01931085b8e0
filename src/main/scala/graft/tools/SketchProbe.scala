package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CountMinSketch, HllSketch}

/** Scaling measurement for the engine-neutral sketches: HLL summary and
  * CMS build over the documents tokens replicated 1×/10×/50× (shifted
  * ids so the distinct-key space grows with the corpus). The claim to
  * verify: sketch STATE stays fixed (≤256 registers / 4096 counters)
  * so cost is one linear scan + a bounded shuffle — the curve should
  * track corpus size with no output-side growth. Results feed PERF.md.
  */
object SketchProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (n <- Seq(1, 10, 50)) {
      val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
        .select("doc_id", "text")
        .crossJoin(spark.range(n).select(col("id").as("rep")))
        .select((col("doc_id") * n + col("rep")).as("doc_id"), col("text"))
        .persist()
      val rows = docs.count()

      val (hll, tH) = time {
        HllSketch.summary(docs, col("doc_id"), Seq.empty).collect()
      }
      println(f"n=$n%3d rows=$rows%8d hll_summary: $tH%6.2fs " +
        f"est=${hll(0).getAs[Double]("est_raw")}%.0f exact=$rows")

      val toks = docs
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt"))
      val (nCells, tC) = time {
        CountMinSketch.counters(toks, "token").count()
      }
      println(f"n=$n%3d rows=$rows%8d cms_build:   $tC%6.2fs cells=$nCells")
      docs.unpersist()
    }
    spark.stop()
  }
}
