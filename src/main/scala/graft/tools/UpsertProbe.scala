package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the two candidate materialization strategies for
  * Sinks.upsertBucketed's merge step (VERDICT r5 item 6):
  *
  *   A) eager localCheckpoint(true) then dynamic-partition-overwrite of
  *      the target in place (current implementation) — pays a full
  *      materialization through the block store BEFORE the parquet
  *      write, because the write overwrites files its own plan reads;
  *   B) write merged output to a side temp dir (plan reads `path`,
  *      writes `tmp` — no conflict, no checkpoint), then swap touched
  *      bucket directories by rename — metadata-only on any
  *      rename-capable filesystem.
  *
  * Run: sbt "runMain graft.tools.UpsertProbe /root/testdata/sf0.1"
  */
object UpsertProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)

    val numBuckets = 64
    val orders = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("v"),
        col("o_orderstatus").as("s"))

    def seed(path: String): Unit = {
      fs.delete(new HPath(path), true)
      graft.sources.Sinks.upsertBucketed(orders, path, "k", numBuckets)
    }
    // batch: 10% of keys updated + 1% new keys — the incremental shape;
    // "full" second arg = every key updated (the worst case for an
    // eager checkpoint: the entire table materializes twice)
    val batch =
      if (args.lift(1).contains("full")) orders.withColumn("v", col("v") + 1.0)
      else orders.where(col("k") % 10 === 0)
        .withColumn("v", col("v") + 1.0)
        .unionByName(orders.where(col("k") % 100 === 3)
          .withColumn("k", col("k") + 100000000L))

    // A = the r5-era implementation, kept inline here as the baseline
    def variantA(path: String): Unit = {
      val routed = batch.withColumn("__bucket", pmod(xxhash64(col("k")), lit(numBuckets)))
      val touched = routed.select("__bucket").distinct().collect().map(_.getLong(0))
      val survivors = spark.read.parquet(path)
        .where(col("__bucket").cast("long").isin(touched.toSeq: _*))
        .withColumn("__bucket", col("__bucket").cast("long"))
        .join(batch.select("k").distinct(), Seq("k"), "left_anti")
      val merged = routed.unionByName(survivors.select(routed.columns.map(col): _*))
        .localCheckpoint(true)
      val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try merged.write.mode(SaveMode.Overwrite).partitionBy("__bucket").parquet(path)
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }

    // B = the shipped Sinks.upsertBucketed (side-dir write + bucket swap)
    def variantB(path: String): Unit =
      graft.sources.Sinks.upsertBucketed(batch, path, "k", numBuckets)

    def time(label: String, path: String, f: String => Unit): Double = {
      val t0 = System.nanoTime(); f(path); val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-14s $s%8.3f s"); s
    }

    def readBack(path: String): (Long, Double) = {
      val df = spark.read.parquet(path)
      (df.count(), df.agg(sum("v")).head().getDouble(0))
    }

    val base = java.nio.file.Files.createTempDirectory("graft_upsert_probe_").toString
    val (pa, pb) = (s"$base/a", s"$base/b")
    val tsA = collection.mutable.ListBuffer.empty[Double]
    val tsB = collection.mutable.ListBuffer.empty[Double]
    for (iter <- 1 to 8) {
      seed(pa); seed(pb)
      // alternate order so cache warmth / background noise can't favor
      // a fixed slot
      if (iter % 2 == 1) {
        tsA += time(s"A(ckpt) #$iter", pa, variantA)
        tsB += time(s"B(swap) #$iter", pb, variantB)
      } else {
        tsB += time(s"B(swap) #$iter", pb, variantB)
        tsA += time(s"A(ckpt) #$iter", pa, variantA)
      }
      val (ca, sa) = readBack(pa); val (cb, sb) = readBack(pb)
      require(ca == cb && math.abs(sa - sb) <= 1e-9 * math.abs(sa),
        s"variant outputs diverge: A=($ca,$sa) B=($cb,$sb)")
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"MEDIANS over 8: A(ckpt)=${med(tsA.toSeq)}%.3f s  B(swap)=${med(tsB.toSeq)}%.3f s")
    spark.stop()
  }
}
