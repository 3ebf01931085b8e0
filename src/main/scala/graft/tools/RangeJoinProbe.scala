package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** Scaling measurement for the bucketized range join (j18 shape) vs the
  * naive per-key theta join, over the events table replicated 1×/10×/50×
  * with shifted users (distinct key space grows with the corpus — the
  * realistic shape) and shifted timestamps within a day, so per-user
  * event density stays constant while total volume scales. The point is
  * the CURVE: the bucketized join should track |points| + |intervals|
  * (matches grow linearly too), never the per-key quadratic of the
  * naive plan. Results feed PERF.md.
  */
object RangeJoinProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val hourNs = 3600L * 1000 * 1000 * 1000

    for (n <- Seq(1, 10, 50)) {
      val ev0 = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
        .select("event_id", "user_id", "event_type", "ts_ns")
      val ev = ev0.crossJoin(
          spark.range(n).select(col("id").as("rep")))
        .select(
          (col("event_id") * n + col("rep")).as("event_id"),
          (col("user_id") * n + col("rep")).as("user_id"),
          col("event_type"),
          (col("ts_ns") + col("rep") * 1234567L).as("ts_ns"))
        .persist()
      val total = ev.count()
      val clicks = ev.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts_ns").as("click_ns"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_ns").as("purchase_ns"))

      val (m, t) = time {
        RangeJoin.bandJoin(clicks, purchases, Seq("user_id"),
          "click_ns", "purchase_ns", before = hourNs, after = 0L).count()
      }
      println(f"n=$n%3d events=$total%9d bucketized: $t%6.2fs matches=$m")

      // equi+range with bounded per-key groups: Spark's SMJ on the equi
      // key with the range as residual is already fine — the rewrite is
      // not needed here and the probe records that honestly
      if (n <= 10) {
        val (m2, t2) = time {
          clicks.join(purchases, clicks("user_id") === purchases("user_id") &&
            col("click_ns") >= col("purchase_ns") - hourNs &&
            col("click_ns") <= col("purchase_ns")).count()
        }
        println(f"n=$n%3d events=$total%9d naive-SMJ:  $t2%6.2fs matches=$m2" +
          (if (m != m2) "  *** MISMATCH ***" else ""))
      }

      // ---- the shapes the rewrite EXISTS for ----
      // (B) NO equi key: global time-window lookup (points × 2000
      // windows). Spark has no equi component to hash on → BNLJ,
      // |P|·|I| comparisons; the bucket column MANUFACTURES an equi key.
      // 2000 one-hour windows tiling the events' 30-day span (stride
      // ~21.6 min → each point matches ~2.8 windows)
      val base = 1704067200000000000L
      val stride = 2592000000000000L / 2000L
      val windows = spark.range(2000).select(
        col("id").as("win_id"),
        (lit(base) + col("id") * stride).as("win_lo"),
        (lit(base) + col("id") * stride + hourNs).as("win_hi"))
      val pts = ev.select(col("event_id"), col("ts_ns"))
      val (mb, tb) = time {
        RangeJoin.pointInInterval(pts, windows, Seq.empty, "ts_ns",
          "win_lo", "win_hi", width = hourNs).count()
      }
      println(f"n=$n%3d events=$total%9d no-key bucketized: $tb%6.2fs matches=$mb")
      if (n <= 10) {
        val (mb2, tb2) = time {
          pts.join(windows, col("ts_ns") >= col("win_lo") &&
            col("ts_ns") <= col("win_hi")).count()
        }
        println(f"n=$n%3d events=$total%9d no-key BNLJ:       $tb2%6.2fs matches=$mb2" +
          (if (mb != mb2) "  *** MISMATCH ***" else ""))
      }

      ev.unpersist()
    }

    // (C) HOT key, run once at base scale: every event on ONE user —
    // SMJ's per-group cross product runs |clicks|·|purchases| (~4·10⁸)
    // comparisons in a single task; the bucket key splits the group by
    // time so tasks stay bounded and parallel.
    val ev1 = graft.sources.Tables.events(spark, "/root/testdata/sf0.1")
      .select("event_id", "event_type", "ts_ns").persist()
    val hotC = ev1.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), lit(7L).as("user_id"),
        col("ts_ns").as("click_ns"))
    val hotP = ev1.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), lit(7L).as("user_id"),
        col("ts_ns").as("purchase_ns"))
    val (mh, th) = time {
      RangeJoin.bandJoin(hotC, hotP, Seq("user_id"),
        "click_ns", "purchase_ns", before = hourNs, after = 0L).count()
    }
    println(f"hot-key bucketized: $th%6.2fs matches=$mh")
    val (mh2, th2) = time {
      hotC.join(hotP, hotC("user_id") === hotP("user_id") &&
        col("click_ns") >= col("purchase_ns") - hourNs &&
        col("click_ns") <= col("purchase_ns")).count()
    }
    println(f"hot-key SMJ:        $th2%6.2fs matches=$mh2" +
      (if (mh != mh2) "  *** MISMATCH ***" else ""))
    spark.stop()
  }
}
