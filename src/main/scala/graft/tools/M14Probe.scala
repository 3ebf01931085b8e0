package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage attribution for m14_image_keeplist's sf1 wall-clock band
  * (PERF.md round 11: solo sf1 medians 14.1–32.3 s, one in-sweep draw
  * at 67.4 s). The gate has three stages with different physics —
  * (1) imageio decode + aHash (map-only, CPU-bound), (2) banded
  * hamming self-join + popcount verify, (3) pointer-jumping closure +
  * final left join — and the band is only diagnosable if we know
  * which stage carries it. This probe times each stage separately for
  * `iters` iterations IN ONE JVM (printing every draw, not a median,
  * so in-process drift — JIT, GC, code-cache — is visible), then the
  * whole gate the same way. Run it repeatedly across JVMs to separate
  * in-process from environment variance.
  *
  * Usage: runMain graft.tools.M14Probe [iters] (default 5; needs
  * /tmp/graft_sf1 — built on demand via Sf1Probe.buildSf1).
  */
object M14Probe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.registerNative(spark)
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = "/tmp/graft_sf1"
    Sf1Probe.buildSf1(spark, sf01, sf1)

    def hashes(dir: String) = graft.multimodal.MediaPipeline
      .imageAHashes(graft.multimodal.MediaPipeline
        .withImagePayload(graft.sources.Tables.documents(spark, dir))).toDF()
      .where(col("ahash").isNotNull)

    for (dir <- Seq(sf01, sf1); i <- 1 to iters) {
      // stage 1: decode + hash only (no caching — each timing is a
      // full fresh pass, the honest per-stage cost)
      val (nH, tDecode) = Sf1Probe.time(hashes(dir).count())
      // stage 2: decode + banded pairs (includes one more decode pass
      // on each join side unless persisted — persist like the gate
      // does so the delta over stage 1 is the JOIN cost)
      val h = hashes(dir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (nP, tPairs) = Sf1Probe.time {
        h.count() // materialize the cache (decode once, as in the gate)
        graft.operators.HammingLSH
          .nearDupPairs(h, "doc_id", "ahash", bits = 48, bands = 4).count()
      }
      h.unpersist(true)
      // stage 3: the whole gate (decode + pairs + closure + left join)
      val (nG, tGate) = Sf1Probe.time(
        graft.SparkEntry.queries("m14_image_keeplist")(spark, dir).count())
      println(f"M14PROBE dir=$dir%-22s iter=$i decode=$tDecode%7.2fs " +
        f"(n=$nH%d) pairs_cached=$tPairs%7.2fs (n=$nP%d) " +
        f"gate=$tGate%7.2fs (n=$nG%d)")
    }
    spark.stop()
  }
}
