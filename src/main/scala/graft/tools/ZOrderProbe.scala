package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Scaling measurement for k18's Z-order layout: at sf0.1 lineitem
  * (~600k rows) and a 10× replica, compare
  *   (a) write cost — z-order (stats pass + range shuffle + sort)
  *       vs a plain single-key-sorted rewrite, and
  *   (b) pruning selectivity — fraction of files whose min/max box
  *       intersects a 10%×10% 2-D box and a partkey-only slab, for the
  *       z-order layout vs the l_orderkey-sorted layout.
  * The claims under test: the write premium is a small constant factor
  * (both layouts pay one shuffle; z-order adds six bitwise ops/row and
  * a stats scan), and the slab selectivity is where z-order wins — a
  * single-key sort cannot prune the non-sort dimension at any scale.
  * Results feed PERF.md.
  */
object ZOrderProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    for (n <- Seq(1, 10)) {
      val src0 = graft.sources.Tables.lineitem(spark, d)
        .select(col("l_orderkey").cast("long").as("l_orderkey"),
          col("l_partkey").cast("long").as("l_partkey"), col("l_quantity"))
      val src = if (n == 1) src0 else
        (1 to n).map(i => src0.withColumn("l_orderkey",
          col("l_orderkey") + lit(i * 10000000L))).reduce(_ unionAll _)
      val rows = src.count()
      val files = 16 * n

      val zDir = s"/tmp/zorder_probe_z_$n"
      val (_, tz) = time {
        ZOrder.writeLayout(src, zDir, "l_orderkey", "l_partkey", files)
      }
      val eDir = s"/tmp/zorder_probe_e_$n"
      val (_, te) = time {
        ZOrder.writeLayoutEqDepth(src, eDir, "l_orderkey", "l_partkey", files)
      }
      val sDir = s"/tmp/zorder_probe_s_$n"
      val (_, ts) = time {
        src.repartitionByRange(files, col("l_orderkey"))
          .sortWithinPartitions("l_orderkey")
          .write.mode("overwrite").parquet(sDir)
      }

      val st = src.agg(min("l_orderkey"), max("l_orderkey"),
        min("l_partkey"), max("l_partkey")).head()
      val (okLo, okMax, pkLo, pkMax) =
        (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
      val okHi = okLo + (okMax - okLo) / 10
      val pkHi = pkLo + (pkMax - pkLo) / 10

      def frac(dir: String, lo1: Long, hi1: Long, lo2: Long, hi2: Long): String = {
        val boxes = ZOrder.fileBoxes(spark.read.parquet(dir),
          "l_orderkey", "l_partkey").collect()
        s"${ZOrder.boxHits(boxes, lo1, hi1, lo2, hi2)}/${boxes.length}"
      }

      println(f"ZORDER n=$n rows=$rows files=$files " +
        f"write_z=$tz%.2fs write_eqdepth=$te%.2fs write_sorted=$ts%.2fs " +
        s"box_z=${frac(zDir, okLo, okHi, pkLo, pkHi)} " +
        s"box_eqdepth=${frac(eDir, okLo, okHi, pkLo, pkHi)} " +
        s"box_sorted=${frac(sDir, okLo, okHi, pkLo, pkHi)} " +
        s"slab_z=${frac(zDir, Long.MinValue, Long.MaxValue, pkLo, pkHi)} " +
        s"slab_eqdepth=${frac(eDir, Long.MinValue, Long.MaxValue, pkLo, pkHi)} " +
        s"slab_sorted=${frac(sDir, Long.MinValue, Long.MaxValue, pkLo, pkHi)}")
    }
    spark.stop()
  }
}
