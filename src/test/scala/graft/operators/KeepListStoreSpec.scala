package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the persisted keep-list lifecycle: remap COMPOSITION across
  * batches (the read-side closure), appendBatch replay idempotency,
  * fold round-trip + idempotency, and the fold crash window where the
  * deltas survive the base swap.
  */
class KeepListStoreSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** star bands: every listed doc shares one bucket `h` */
  private def clique(h: Long, ids: Long*): DataFrame = {
    import spark.implicits._
    ids.map(i => (i, 0, h)).toDF("id", "band", "h")
  }

  private def readMap(dir: String): Map[Long, Long] =
    KeepListStore.read(spark, dir, "id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("remap composition chains across batches at read time") {
    val dir = graft.queries.Scratch.dir("klstore_comp_").toString
    // corpus: {30,31} (rep 30) and {20,21} (rep 20), disjoint
    KeepListStore.backfill(
      clique(1000, 30, 31).union(clique(2000, 20, 21)), "id", dir)
    // batch 0: doc 40 bridges the two → remap (30 -> 20)
    KeepListStore.appendBatch(
      clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
    // batch 1: doc 10 (new minimum) joins the merged component via
    // bucket 1000 → remap (20 -> 10); reading doc 31 must CHAIN
    // 30 -> 20 -> 10 through the closure
    KeepListStore.appendBatch(clique(1000, 10L), "id", dir, 1L)
    val m = readMap(dir)
    assert(m == Map(10L -> 10L, 20L -> 10L, 21L -> 10L, 30L -> 10L,
      31L -> 10L, 40L -> 10L))
  }

  test("appendBatch replay is a pure skip with identical assignments") {
    val dir = graft.queries.Scratch.dir("klstore_replay_").toString
    KeepListStore.backfill(clique(1, 5, 6), "id", dir)
    val first = KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def genCount = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$dir/bands"))
      .count(_.getPath.getName.startsWith("gen="))
    val gens = genCount
    val replay = KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == first && first == Set((2L, 2L)))
    assert(genCount == gens)
    assert(readMap(dir) == Map(2L -> 2L, 5L -> 2L, 6L -> 2L))
  }

  test("fold preserves the read, clears deltas, and is idempotent") {
    val dir = graft.queries.Scratch.dir("klstore_fold_").toString
    KeepListStore.backfill(clique(1, 7, 8), "id", dir)
    KeepListStore.appendBatch(clique(1, 3L), "id", dir, 0L)
    val before = readMap(dir)
    KeepListStore.fold(spark, dir, "id")
    assert(readMap(dir) == before)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/state"))
      .exists(_.getPath.getName.startsWith("batch=")))
    KeepListStore.fold(spark, dir, "id") // no deltas: must be a no-op
    assert(readMap(dir) == before)
  }

  test("fold crash window: surviving deltas do not change the read") {
    val dir = graft.queries.Scratch.dir("klstore_crash_").toString
    KeepListStore.backfill(clique(1, 7, 8), "id", dir)
    KeepListStore.appendBatch(clique(1, 3L), "id", dir, 0L)
    val before = readMap(dir)
    // snapshot the delta, fold, then restore it — the state after a
    // crash between the base swap and the delta delete
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val delta = new org.apache.hadoop.fs.Path(s"$dir/state/batch=0")
    val aside = new org.apache.hadoop.fs.Path(s"$dir/.crash_aside")
    org.apache.hadoop.fs.FileUtil.copy(fs, delta, fs, aside, false,
      spark.sparkContext.hadoopConfiguration)
    KeepListStore.fold(spark, dir, "id")
    org.apache.hadoop.fs.FileUtil.copy(fs, aside, fs, delta, false,
      spark.sparkContext.hadoopConfiguration)
    // the folded base already contains the delta's fixpoint: identical
    // pairs from both sides must collapse, not duplicate or diverge
    val rows = KeepListStore.read(spark, dir, "id").collect()
    assert(rows.length == before.size)
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == before)
    // and the next fold heals the leftover
    KeepListStore.fold(spark, dir, "id")
    assert(!fs.exists(delta) && readMap(dir) == before)
  }

  test("read applies the remap closure as a BROADCAST join over the stored scan") {
    val dir = graft.queries.Scratch.dir("klstore_plan_").toString
    KeepListStore.backfill(clique(1, 5, 6), "id", dir)
    KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L) // remap (5 -> 2)
    val plan = KeepListStore.read(spark, dir, "id")
      .queryExecution.executedPlan.toString
    // the remap is O(merge events) — corpus-side rows must never
    // shuffle for its application
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("merge-heavy burst: distributed pointer-doubling closure equals the driver path") {
    val dir = graft.queries.Scratch.dir("klstore_burst_").toString
    // ten batches, each electing a NEW minimum into the same bucket —
    // a 10-deep remap chain (100 -> 90 -> 89 -> ... -> 81)
    KeepListStore.backfill(clique(1, 100, 101), "id", dir)
    for (i <- 0 until 10)
      KeepListStore.appendBatch(clique(1, (90 - i).toLong), "id", dir, i.toLong)
    val viaDriver = readMap(dir)
    assert(viaDriver.values.toSet == Set(81L))
    spark.conf.set("graft.keeplist.driverRemapBytes", "0")
    try {
      // same store, distributed closure forced: identical assignment,
      // and fold() under the distributed path round-trips the read
      val viaDist = readMap(dir)
      assert(viaDist == viaDriver)
      KeepListStore.fold(spark, dir, "id")
      assert(readMap(dir) == viaDriver)
    } finally spark.conf.unset("graft.keeplist.driverRemapBytes")
    // the closure primitive on a 200-deep chain (log-round doubling)
    import spark.implicits._
    val chain = (0 until 200).map(i => (i.toLong + 1, i.toLong))
      .toDF("old_rep", "keep_id")
    val closed = KeepListStore.closeRemapDistributed(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(closed == (1 to 200).map(i => i.toLong -> 0L).toMap)
  }

  test("deleteDocs: rep re-election, bridge split, full-component delete, idempotent re-run") {
    import spark.implicits._
    val dir = graft.queries.Scratch.dir("klstore_del_").toString
    // component A: chain 10-11-12 via buckets (10,11),(11,12) — 11 is
    // the BRIDGE; component B: {20,21}; component C: {30}
    val bands = Seq(
      (10L, 0, 1L), (11L, 0, 1L), // bucket 1: 10-11
      (11L, 0, 2L), (12L, 0, 2L), // bucket 2: 11-12
      (20L, 0, 3L), (21L, 0, 3L),
      (30L, 0, 4L)).toDF("id", "band", "h")
    KeepListStore.backfill(bands, "id", dir)
    assert(readMap(dir) == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L))
    // delete the bridge 11 → A must SPLIT into {10} and {12}; delete
    // rep 20 → B re-elects 21; delete all of C
    KeepListStore.deleteDocs(Seq(11L, 20L, 30L).toDF("id"), "id", dir)
    val want = Map(10L -> 10L, 12L -> 12L, 21L -> 21L)
    assert(readMap(dir) == want)
    // idempotent re-run (the crash-recovery contract)
    KeepListStore.deleteDocs(Seq(11L, 20L, 30L).toDF("id"), "id", dir)
    assert(readMap(dir) == want)
    // deleted content is forgotten: a new doc in the bridge's bucket
    // merges only with what remains there
    KeepListStore.appendBatch(clique(1, 40L), "id", dir, 0L)
    assert(readMap(dir) ==
      Map(10L -> 10L, 12L -> 12L, 21L -> 21L, 40L -> 10L))
  }

  test("replay of a FOLDED batch skips the re-solve; after a delete it cannot resurrect") {
    import spark.implicits._
    val dir = graft.queries.Scratch.dir("klstore_replayfold_").toString
    KeepListStore.backfill(clique(1, 5, 6), "id", dir)
    KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L)
    KeepListStore.fold(spark, dir, "id")
    // replay after a plain fold: state delta is gone but the bands gen
    // knows batch 0 committed — current assignments come back, no new
    // state delta is written
    val replay = KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replay == Set((2L, 2L)))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/state"))
      .exists(_.getPath.getName.startsWith("batch=")))
    // takedown of batch 0's doc, then the batch replays again: the doc
    // must NOT come back — not in the returned assignments, not in
    // read(), not in the band store
    KeepListStore.deleteDocs(Seq(2L).toDF("id"), "id", dir)
    val replay2 = KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L)
    assert(replay2.isEmpty)
    assert(readMap(dir) == Map(5L -> 5L, 6L -> 5L))
    assert(spark.read.parquet(s"$dir/bands")
      .where(col("id") === 2L).isEmpty)
  }

  test("deleteDocs refuses while a landing is mid-commit (state without bands gen)") {
    import spark.implicits._
    val dir = graft.queries.Scratch.dir("klstore_midcommit_").toString
    KeepListStore.backfill(clique(1, 5, 6), "id", dir)
    KeepListStore.appendBatch(clique(1, 3L), "id", dir, 1L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // fake appendBatch's crash window: state committed, bands gen gone
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/bands/gen=1"), true)
    val e = intercept[IllegalStateException](
      KeepListStore.deleteDocs(Seq(5L).toDF("id"), "id", dir))
    assert(e.getMessage.contains("mid-commit"))
    // the stream's own replay heals the lag (state exists → skip the
    // re-solve, redo the idempotent bands append), then takedown works
    KeepListStore.appendBatch(clique(1, 3L), "id", dir, 1L)
    KeepListStore.deleteDocs(Seq(5L).toDF("id"), "id", dir)
    assert(readMap(dir) == Map(3L -> 3L, 6L -> 3L))
  }

  test("band-store compaction keeps probes correct and folded batch ids skipped") {
    val dir = graft.queries.Scratch.dir("klstore_cg_").toString
    KeepListStore.backfill(clique(1, 30, 31), "id", dir)
    KeepListStore.appendBatch(clique(2, 20L), "id", dir, 0L)
    graft.sources.Sinks.compactGenerations(spark, s"$dir/bands", Some("hb"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/bands"))
      .count(_.getPath.getName.startsWith("gen=")) == 1)
    // replay of the folded batch: the manifest keeps the bands append a
    // pure skip (the state dir already skips the recompute)
    KeepListStore.appendBatch(clique(2, 20L), "id", dir, 0L)
    // a new batch must still see COMPACTED corpus + batch-0 bands: doc
    // 10 bridges bucket 2 (batch 0's, folded) and bucket 1 (backfill,
    // folded) — any row lost in the fold breaks the merge
    KeepListStore.appendBatch(clique(1, 10L).union(clique(2, 10L)),
      "id", dir, 1L)
    assert(readMap(dir) ==
      Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 31L -> 10L))
  }

  test("readAsOf applies only deltas (and remaps) at or before the batch") {
    val dir = graft.queries.Scratch.dir("klstore_asof_").toString
    KeepListStore.backfill(
      clique(1000, 30, 31).union(clique(2000, 20, 21)), "id", dir)
    // batch 0: doc 40 bridges the components → remap (30 -> 20);
    // batch 1: doc 10 takes over → remap (20 -> 10)
    KeepListStore.appendBatch(
      clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
    KeepListStore.appendBatch(clique(1000, 10L), "id", dir, 1L)
    def asOfMap(b: Long) =
      KeepListStore.readAsOf(spark, dir, "id", b).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // before any batch: the backfilled base alone
    assert(asOfMap(-1L) ==
      Map(30L -> 30L, 31L -> 30L, 20L -> 20L, 21L -> 20L))
    // as of batch 0: the bridge merge applied, doc 10's takeover NOT —
    // leaking batch 1's remap would turn every 20 into a 10
    assert(asOfMap(0L) == Map(20L -> 20L, 21L -> 20L, 30L -> 20L,
      31L -> 20L, 40L -> 20L))
    // as of the head batch: identical to the current read
    assert(asOfMap(1L) == readMap(dir))
  }

  test("fold advances the horizon: pre-horizon readAsOf refuses loudly") {
    val dir = graft.queries.Scratch.dir("klstore_hzn_").toString
    KeepListStore.backfill(clique(1, 7, 8), "id", dir)
    KeepListStore.appendBatch(clique(1, 3L), "id", dir, 0L)
    KeepListStore.appendBatch(clique(1, 2L), "id", dir, 1L)
    KeepListStore.fold(spark, dir, "id")
    val e = intercept[IllegalStateException] {
      KeepListStore.readAsOf(spark, dir, "id", 0L).collect()
    }
    assert(e.getMessage.contains("fold horizon"))
    // the horizon batch itself stays readable and equals the head
    assert(KeepListStore.readAsOf(spark, dir, "id", 1L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == readMap(dir))
  }

  test("auto-fold: a past-threshold store folds itself on the next append") {
    val dir = graft.queries.Scratch.dir("klstore_auto_").toString
    KeepListStore.backfill(
      clique(1000, 30, 31).union(clique(2000, 20, 21)), "id", dir)
    spark.conf.set("graft.keeplist.autoFoldBytes", "1")
    try {
      // batch 0 merges the components → a non-identity remap delta,
      // whose parquet bytes exceed the 1-byte threshold
      KeepListStore.appendBatch(
        clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
      // batch 1's append must fold batch 0 FIRST (no manual fold
      // anywhere), then land — the store self-heals
      KeepListStore.appendBatch(clique(1000, 10L), "id", dir, 1L)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val surviving = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$dir/state"))
        .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq
      assert(surviving == Seq("batch=1"), surviving.toString)
      assert(readMap(dir).values.toSet == Set(10L))
      // the auto-fold advanced the history horizon like a manual one
      intercept[IllegalStateException] {
        KeepListStore.readAsOf(spark, dir, "id", -1L).collect()
      }
    } finally spark.conf.unset("graft.keeplist.autoFoldBytes")
  }

  test("auto-fold never disturbs the pure-replay skip") {
    val dir = graft.queries.Scratch.dir("klstore_autoreplay_").toString
    KeepListStore.backfill(
      clique(1000, 30, 31).union(clique(2000, 20, 21)), "id", dir)
    KeepListStore.appendBatch(
      clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
    spark.conf.set("graft.keeplist.autoFoldBytes", "1")
    try {
      // replay of batch 0 under an over-threshold store: must stay the
      // O(1) skip — same assignments back, delta NOT folded away
      val replay = KeepListStore.appendBatch(
          clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(replay == Set((40L, 20L)))
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      assert(fs.exists(
        new org.apache.hadoop.fs.Path(s"$dir/state/batch=0")))
    } finally spark.conf.unset("graft.keeplist.autoFoldBytes")
  }

  test("auto-fold defers while any landing is mid-commit (state without bands gen)") {
    val dir = graft.queries.Scratch.dir("klstore_autodefer_").toString
    KeepListStore.backfill(
      clique(1000, 30, 31).union(clique(2000, 20, 21)), "id", dir)
    // batch 0 merges the components → over-threshold remap delta
    KeepListStore.appendBatch(
      clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // fake appendBatch's crash window: batch 0's state committed, its
    // bands generation gone — folding NOW would bake doc 40 into base
    // without its band edges (permanent if the replay crashed again)
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/bands/gen=0"), true)
    spark.conf.set("graft.keeplist.autoFoldBytes", "1")
    try {
      def stateDirs = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$dir/state"))
        .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
      // a fresh landing past the threshold must DEFER the fold (the
      // deleteDocs guard, applied): both deltas stand, reads stay right
      KeepListStore.appendBatch(clique(1000, 10L), "id", dir, 1L)
      assert(stateDirs == Seq("batch=0", "batch=1"), stateDirs.toString)
      assert(readMap(dir).values.toSet == Set(10L))
      // the stream's own replay heals the lag (state skip + idempotent
      // bands re-append); the guard must hold DURING that replay too
      KeepListStore.appendBatch(
        clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L)
      assert(stateDirs == Seq("batch=0", "batch=1"))
      // lag gone → the next fresh landing folds as usual
      KeepListStore.appendBatch(clique(1000, 11L), "id", dir, 2L)
      assert(stateDirs == Seq("batch=2"), stateDirs.toString)
      assert(readMap(dir).values.toSet == Set(10L))
    } finally spark.conf.unset("graft.keeplist.autoFoldBytes")
  }

  test("fold window reads: pre- or post-fold view, never a mix (read + readAsOf)") {
    val dir = graft.queries.Scratch.dir("klstore_foldwin_").toString
    KeepListStore.backfill(
      clique(1000, 30, 31).union(clique(2000, 20, 21)), "id", dir)
    KeepListStore.appendBatch(
      clique(1000, 40L).union(clique(2000, 40L)), "id", dir, 0L) // 30→20
    KeepListStore.appendBatch(clique(1000, 10L), "id", dir, 1L)  // 20→10
    // a reader materialized BEFORE the fold holds the pre-fold view —
    // the documented lifetime contract (materialize before the next
    // fold of the same dir); the auto-fold beneath never corrupts it
    val preFold = readMap(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // save the deltas aside, then drive the fold through appendBatch's
    // AUTO-fold (no manual fold anywhere)
    val save = graft.queries.Scratch.dir("klstore_foldwin_save_").toString
    for (b <- Seq(0L, 1L))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$dir/state/batch=$b"), fs,
        new org.apache.hadoop.fs.Path(s"$save/batch=$b"), false,
        spark.sparkContext.hadoopConfiguration)
    spark.conf.set("graft.keeplist.autoFoldBytes", "1")
    try KeepListStore.appendBatch(clique(3000, 50L), "id", dir, 2L)
    finally spark.conf.unset("graft.keeplist.autoFoldBytes")
    val postFold = readMap(dir)
    assert(postFold == preFold + (50L -> 50L))
    // simulate the fold-crash window "base swapped, deltas not yet
    // deleted": restore batch 0/1 deltas next to the folded base. Both
    // read() and readAsOf(head) must return the POST-fold view exactly
    // — folded rows' keeps are remap fixpoints, so re-applying the
    // closed remap is the identity and distinct() collapses the pairs;
    // one keep per id proves no pre/post MIX ever escapes
    for (b <- Seq(0L, 1L))
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(s"$save/batch=$b"), fs,
        new org.apache.hadoop.fs.Path(s"$dir/state/batch=$b"), false,
        spark.sparkContext.hadoopConfiguration)
    val windowRead = KeepListStore.read(spark, dir, "id").collect()
    assert(windowRead.length == windowRead.map(_.getLong(0)).distinct.length)
    assert(windowRead.map(r => r.getLong(0) -> r.getLong(1)).toMap == postFold)
    val windowAsOf = KeepListStore.readAsOf(spark, dir, "id", 2L).collect()
    assert(windowAsOf.length == windowAsOf.map(_.getLong(0)).distinct.length)
    assert(windowAsOf.map(r => r.getLong(0) -> r.getLong(1)).toMap == postFold)
  }

  test("a poisoned identity remap entry is dropped at load, never spun on") {
    import spark.implicits._
    val dir = graft.queries.Scratch.dir("klstore_poison_").toString
    KeepListStore.backfill(clique(1, 5, 6), "id", dir)
    KeepListStore.appendBatch(clique(1, 2L), "id", dir, 0L) // remap (5 -> 2)
    // a write-path regression lands an identity entry: both closure
    // paths would loop forever on it without the load-time filter
    Seq((7L, 7L)).toDF("old_rep", "keep_id").coalesce(1)
      .write.mode("append").parquet(s"$dir/state/batch=0/remap")
    val want = Map(2L -> 2L, 5L -> 2L, 6L -> 2L)
    assert(readMap(dir) == want) // driver closure path: completes
    spark.conf.set("graft.keeplist.driverRemapBytes", "0")
    try assert(readMap(dir) == want) // distributed path: completes
    finally spark.conf.unset("graft.keeplist.driverRemapBytes")
  }

  test("horizon marker is claim-first: a crashed fold still refuses") {
    val dir = graft.queries.Scratch.dir("klstore_hzncrash_").toString
    KeepListStore.backfill(clique(1, 7, 8), "id", dir)
    KeepListStore.appendBatch(clique(1, 3L), "id", dir, 0L)
    // simulate fold dying right after the marker claim: marker says
    // horizon 0, but the delta survives and base was never swapped
    graft.sources.Sinks.recordLongMarker(spark, s"$dir/base",
      "__fold_horizon", 0L)
    // the surviving delta COULD serve asOf(-1) = base-only, but the
    // claim-first contract errs toward refusal (conservative window)
    intercept[IllegalStateException] {
      KeepListStore.readAsOf(spark, dir, "id", -1L).collect()
    }
    // at/after the claimed horizon reads stay correct
    assert(KeepListStore.readAsOf(spark, dir, "id", 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == readMap(dir))
  }
}
