package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the native winnow_fp expression against the interpreted
  * lambda formulation it replaced (d7), on an amplified corpus.
  *
  * Run: sbt "runMain graft.tools.WinnowProbe /root/testdata/sf0.1"
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.registerNative(spark)

    val lambda =
      """IF(length(text) < 5, array(),
         array_distinct(transform(sequence(0, greatest(0, length(text) - 5 - 3)),
           i -> array_min(transform(sequence(i, i + 3),
             j -> cast(conv(substring(md5(substring(text, j + 1, 5)), 25, 8),
                            16, 10) as bigint))))))"""
    // NOTE: this fused lambda recomputes each k-gram hash up to 4×; the
    // ORIGINAL two-column formulation materialized h first. Use that one:
    val h =
      """IF(length(text) < 5, array(),
         transform(sequence(0, length(text) - 5),
           i -> cast(conv(substring(md5(substring(text, i + 1, 5)), 25, 8),
                          16, 10) as bigint)))"""
    val fpFromH =
      """IF(size(h) < 4, array_distinct(h),
         array_distinct(transform(sequence(0, size(h) - 4),
           i -> array_min(slice(h, i + 1, 4)))))"""

    val base = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("rep", explode(expr("sequence(1, 10)")))
      .select("doc_id", "rep", "text")
      .persist()
    println(s"rows=${base.count()}")

    def time(label: String)(mk: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      val s = base.select(mk(base).as("fp"))
        .agg(sum(expr("size(fp)"))).head().getLong(0)
      println(f"$label%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (checksum $s)")
      s
    }
    for (_ <- 1 to 2) {
      val a = time("native")(_ => expr("winnow_fp(text)"))
      val b = {
        val t0 = System.nanoTime()
        val s = base.withColumn("h", expr(h)).select(expr(fpFromH).as("fp"))
          .agg(sum(expr("size(fp)"))).head().getLong(0)
        println(f"lambda   ${(System.nanoTime() - t0) / 1e9}%7.2f s  (checksum $s)")
        s
      }
      require(a == b, "native != lambda checksum")
    }
    base.unpersist()
    spark.stop()
  }
}
