package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the native simhash_md5 expression against the interpreted
  * higher-order-lambda SQL formulation it replaced (d4), on an
  * amplified corpus so per-row cost dominates job overhead.
  *
  * Run: sbt "runMain graft.tools.SimhashProbe /root/testdata/sf0.1"
  */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.registerNative(spark)

    val lambda =
      """aggregate(sequence(0, 31), cast(0 as bigint), (acc, b) -> acc +
         IF(aggregate(transform(w, x -> cast(conv(substring(md5(x), 25, 8), 16, 10) as bigint)),
              cast(0 as bigint), (a, h) -> a + (((h >> b) & 1) * 2 - 1)) > 0,
            shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"""

    // 10x-amplified documents: ~5k rows at sf0.1, same text distribution
    val base = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("rep", explode(expr("sequence(1, 10)")))
      .withColumn("w", split(col("text"), " "))
      .select("doc_id", "rep", "w")
      .persist()
    println(s"rows=${base.count()}")

    def time(label: String, e: String): Long = {
      val t0 = System.nanoTime()
      val s = base.select(expr(e).as("h")).agg(sum("h")).head().getLong(0)
      println(f"$label%-8s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (checksum $s)")
      s
    }
    // interleaved, 3 rounds each, checksums must agree
    val sums = for (_ <- 1 to 2) yield (time("native", "simhash_md5(w)"), time("lambda", lambda))
    require(sums.forall { case (a, b) => a == b }, "native != lambda checksum")
    base.unpersist()
    spark.stop()
  }
}
