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

      // naive theta-join comparison only at the small scales (it is the
      // thing being avoided; at 50× it would dominate the probe)
      if (n <= 10) {
        val (m2, t2) = time {
          clicks.join(purchases, clicks("user_id") === purchases("user_id") &&
            col("click_ns") >= col("purchase_ns") - hourNs &&
            col("click_ns") <= col("purchase_ns")).count()
        }
        println(f"n=$n%3d events=$total%9d naive:      $t2%6.2fs matches=$m2" +
          (if (m != m2) "  *** MISMATCH ***" else ""))
      }
      ev.unpersist()
    }
    spark.stop()
  }
}
