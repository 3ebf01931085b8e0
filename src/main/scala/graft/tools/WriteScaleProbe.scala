package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe for the write gates (VERDICT r5 item 8): does
  * upsertBucketed's cost track |batch| + |touched-bucket data| as its
  * contract documents (`Sinks.scala`), and does the sub-dataset writer
  * scale linearly in its input?
  *
  * Grid for the upsert: {batch B, 10B} × {table T, 10T}, with the batch
  * drawn from a SINGLE bucket so the touched-bucket volume is visible:
  * cost must move with batch size and with bucket size (= table/64),
  * NOT with full table size — the 10T cell must cost far less than 10×
  * the T cell.
  *
  * Run: sbt "runMain graft.tools.WriteScaleProbe /root/testdata/sf0.1"
  */
object WriteScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)

    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"))
    val nBig = orders.count()
    val nSmall = nBig / 10
    val maxSmallKey = orders.orderBy("k").limit(nSmall.toInt)
      .agg(max("k")).head().getLong(0)
    val tSmall = orders.where(col("k") <= maxSmallKey)
    val tBig = orders

    // batch keys all hash to bucket 0 and exist in BOTH tables
    val bucket0 = tSmall.where(pmod(xxhash64(col("k")), lit(64)) === 0)
      .orderBy("k")
    val batchB = bucket0.limit(200).withColumn("v", col("v") + 1.0)
    val batch10B = bucket0.limit(2000).withColumn("v", col("v") + 1.0)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def medianOf(n: Int)(f: => Double): Double = {
      val xs = (1 to n).map(_ => f).sorted; xs(n / 2)
    }

    val base = java.nio.file.Files.createTempDirectory("graft_wsp_").toString
    def upsertCell(label: String, table: DataFrame, batch: DataFrame): Double = {
      val m = medianOf(5) {
        val p = s"$base/$label-${System.nanoTime()}"
        graft.sources.Sinks.upsertBucketed(table, p, "k", 64) // seed (untimed part? no — seed outside)
        val t = timed(graft.sources.Sinks.upsertBucketed(batch, p, "k", 64))
        fs.delete(new HPath(p), true)
        t
      }
      println(f"UPSERT $label%-12s median $m%7.3f s")
      m
    }

    val cTT = upsertCell("B,T", tSmall, batchB)
    val c10BT = upsertCell("10B,T", tSmall, batch10B)
    val cT10T = upsertCell("B,10T", tBig, batchB)
    val c10B10T = upsertCell("10B,10T", tBig, batch10B)
    println(f"UPSERT table-size sensitivity at fixed batch: ${cT10T / cTT}%.2fx " +
      f"(10x table; contract: ~bucket growth, must be << 10x)")
    println(f"UPSERT batch-size sensitivity at fixed table: ${c10BT / cTT}%.2fx (10x batch)")

    // k8 family: sub-dataset writer linearity in input rows
    val docsB = tSmall.withColumn("split",
        when(col("k") % 2 === 0, "train").otherwise("test"))
      .withColumn("band", when(col("v") < 100000, lit("low")).otherwise(lit("high")))
    val docs10B = tBig.withColumn("split",
        when(col("k") % 2 === 0, "train").otherwise("test"))
      .withColumn("band", when(col("v") < 100000, lit("low")).otherwise(lit("high")))
    def k8Cell(label: String, df: DataFrame): Double = {
      val m = medianOf(5) {
        val p = s"$base/k8-$label-${System.nanoTime()}"
        val t = timed(graft.datasets.DatasetWriter.subDatasets(df, p,
          Map("band" -> col("band"))))
        fs.delete(new HPath(p), true)
        t
      }
      println(f"SUBDS  $label%-12s median $m%7.3f s")
      m
    }
    val k8a = k8Cell("N", docsB)
    val k8b = k8Cell("10N", docs10B)
    println(f"SUBDS input sensitivity: ${k8b / k8a}%.2fx for 10x rows (contract: ~linear, <=10x)")
    spark.stop()
  }
}
