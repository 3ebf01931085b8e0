package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** PERSISTED keep-list lifecycle — the storage face of
  * [[MinHashLSH.incrementalKeepList]] (which solves the affected
  * subgraph but leaves "where does the state live" to the caller).
  * This is the last piece of the incremental dedup tier: d13/d16 gave
  * the fingerprint index a disk lifecycle (backfill → committed
  * appends → compaction); this gives the connected-components
  * assignment the same one.
  *
  * Layout under `dir`:
  * {{{
  *   base/                  folded (id, keep_id) assignment — backfill
  *                          writes it, fold() rewrites it atomically
  *   bands/gen=<g>/hb=<n>/  BUCKETED band store (d16's layout, same
  *                          machinery: backfill = gen=-1 via
  *                          MinHashLSH.buildBucketedIndex, batches =
  *                          exactly-once generations, bands__layout
  *                          marker records the bucket count) — the
  *                          batch probe PRUNES the corpus-band scan to
  *                          its own hash buckets, so touched-component
  *                          discovery I/O tracks |batch|, never
  *                          |corpus| (a flat store would pay a full
  *                          map-only corpus scan per batch)
  *   state/batch=<batchId>/assign/   batch docs' assignments
  *                         /remap/   non-identity (old_rep → keep_id)
  * }}}
  *
  * CRASH DISCIPLINE (single writer, the foreachBatch contract): per
  * batch there are two state writes. The (assign, remap) pair commits
  * FIRST as ONE atomic dir rename (`state/batch=<id>` — both tables
  * under one tmp, one rename, so a reader never sees an assignment
  * without its remap or vice versa), the bands append second. Replay
  * matrix: crash before the state commit → recompute against the
  * untouched stores; between the two → skip the recompute, redo the
  * idempotent bands append; after both → pure skip. The order is
  * load-bearing: if bands could land before state, the NEXT batch's
  * `touched` probe would see band rows whose ids have no assignment
  * and silently drop the edge (the inner join on corpus state) —
  * state-first makes bands only ever lag, and the lag heals on replay
  * before the next batch runs (foreachBatch serializes).
  *
  * REMAP COMPOSITION: remaps from different batches CHAIN — batch 2
  * can remap a component whose rep batch 1 already created
  * (r → k1 → k2), because a node is a rep until remapped and never
  * again (reps only decrease), so accumulated deltas form a functional
  * acyclic map. The read path therefore applies the CLOSURE of the
  * accumulated remaps — SIZE-DISPATCHED on the deltas' parquet bytes
  * (free filesystem metadata): the normal case (remap is
  * O(component-merge events since the last fold), fold cadence keeps
  * it small) collects to the driver for path compression and goes
  * back out as a broadcast join dimension, so a read costs one
  * broadcast hash join + a distinct over the scan; a merge-heavy
  * burst between folds (mass near-dup ingest) past the threshold
  * routes to a DISTRIBUTED pointer-doubling closure instead — O(log
  * chain) self-joins, no driver materialization, shuffle-join apply —
  * so no burst profile can driver-OOM the store. At 100 TB the
  * assignment is billions of rows but the remap is thousands;
  * rewriting the former per batch is exactly what this module exists
  * to avoid.
  *
  * fold() rewrites `base` with everything applied (compact's
  * rename-aside swap) and clears the deltas. read() tolerates every
  * fold crash window: the "folded base + surviving deltas" state
  * yields byte-identical (id, keep) pairs from both sides (a folded
  * row's keep is a remap fixpoint, so re-applying the closed remap is
  * the identity), and the terminal distinct() collapses them.
  *
  * Band-store compaction (thousands of gen dirs at streaming cadence)
  * is the d15 story — Sinks.compact with sibling commit markers — and
  * is deliberately not duplicated here.
  */
object KeepListStore {

  private def fsOf(spark: SparkSession): FileSystem =
    FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** One-time corpus solve: full connected components via the
    * pointer-jumping fixpoint, persisted as the initial `base`; the
    * corpus bands land through [[MinHashLSH.buildBucketedIndex]] (the
    * d16 layout — gen=-1, hb partitions, recorded bucket-count
    * marker), so batch probes can prune.
    */
  def backfill(bands: DataFrame, idCol: String, dir: String): Unit = {
    val spark = bands.sparkSession
    val fs = fsOf(spark)
    val b = bands.select(col(idCol), col("band"), col("h"))
    MinHashLSH.buildBucketedIndex(b, s"$dir/bands")
    Sinks.atomicParquetCommit(MinHashLSH.convergeKeepList(b, idCol),
      new Path(s"$dir/.tmp_base"), new Path(s"$dir/base"))
    fs.mkdirs(new Path(s"$dir/state"))
  }

  private def stateDeltas(spark: SparkSession, dir: String): Seq[Path] = {
    val state = new Path(s"$dir/state")
    val fs = fsOf(spark)
    if (!fs.exists(state)) Seq.empty
    else fs.listStatus(state).map(_.getPath)
      .filter(_.getName.startsWith("batch=")).toSeq
      .sortBy(p => p.getName.stripPrefix("batch=").toLong)
  }

  /** Remap-size dispatch threshold (total parquet BYTES across the
    * delta `remap` dirs — free filesystem metadata, no job): at or
    * below, the closure is computed driver-side (collect + path
    * compression — a broadcast-sized dimension); above, it goes to
    * [[closeRemapDistributed]] so a merge-heavy burst between folds
    * can never driver-OOM the read path. ~32 MB of (id, id) parquet is
    * a few million entries — inside the old advisory guard, far under
    * broadcast limits. Override per session with the runtime conf
    * `graft.keeplist.driverRemapBytes` (the d29 gate pins 0 to force
    * the distributed path; KeepListStoreSpec proves both paths equal).
    */
  private[operators] val DriverRemapBytes: Long = 32L * 1024 * 1024

  private def remapDispatchBytes(spark: SparkSession): Long =
    spark.conf.getOption("graft.keeplist.driverRemapBytes")
      .map(_.toLong).getOrElse(DriverRemapBytes)

  /** AUTO-FOLD threshold (accumulated delta remap parquet bytes):
    * appendBatch folds the store itself before landing a batch whose
    * standing deltas exceed it, so an operator who never calls fold()
    * gets a self-healing store instead of the 4M-entry hard error.
    * Deliberately a SEPARATE knob from the dispatch threshold: a gate
    * forcing the distributed closure (driverRemapBytes=0) must not
    * also fold away the multi-delta remap composition it exists to
    * exercise. NOTE: fold advances the history horizon — readAsOf
    * snapshots older than the auto-fold point refuse, by the same
    * contract as a manual fold.
    */
  private def autoFoldBytes(spark: SparkSession): Long =
    spark.conf.getOption("graft.keeplist.autoFoldBytes")
      .map(_.toLong).getOrElse(DriverRemapBytes)

  /** One pinned distributed-closure frame per store dir (see
    * [[closeRemapDistributed]]): computing a fresh closure for a dir
    * releases the previous pin, and fold() releases the dir's pin once
    * the folded base is durable — so repeated reads on a past-threshold
    * store hold at most ONE cached closure, not one per read (the
    * releasable-handle discipline, in registry form because read()
    * hands a lazy frame to callers whose materialization point this
    * module cannot see).
    *
    * LIFETIME CONTRACT for read() callers, therefore: a returned frame
    * must be MATERIALIZED (count/collect/write) before the next fold()
    * or over-threshold read() of the SAME dir. Releasing a pin only
    * un-caches — a still-lazy consumer recomputes, which is correct
    * until fold() also deletes the delta parquet under it; after that
    * the deferred materialization fails on the removed paths. Every
    * in-repo caller (gates, Verify, streaming foreachBatch bodies)
    * materializes eagerly; external callers inherit the same rule.
    */
  private val pinnedClosures =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def releasePinned(dir: String): Unit = {
    val prev = pinnedClosures.remove(dir)
    if (prev != null) prev.unpersist()
  }

  /** DISTRIBUTED closure of a functional acyclic remap relation via
    * POINTER DOUBLING: each round joins the map with itself (right
    * side keyed on old_rep), so after round i every entry points 2^i
    * steps down its chain — O(log longest-chain) rounds, each one
    * shuffle of |remap| rows, no driver materialization. This is the
    * same fixpoint discipline as [[MinHashLSH.convergeKeepList]]'s
    * pointer jumping, specialized to a functional map (old_rep keys
    * are unique, keeps only decrease, so chains terminate). The final
    * frame stays persisted for its consumers (fold/read materialize
    * once; fold then clears the deltas, so the pin is one fold cycle).
    */
  private[operators] def closeRemapDistributed(remap: DataFrame): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var cur = remap.persist(lvl)
    var done = false
    while (!done) {
      val stepped = cur.join(
          cur.select(col("old_rep").as("__o"), col("keep_id").as("__k")),
          col("keep_id") === col("__o"), "left")
        .select(col("old_rep"),
          coalesce(col("__k"), col("keep_id")).as("keep_id"),
          col("__k").isNotNull.as("__moved"))
        .persist(lvl)
      done = stepped.where(col("__moved")).isEmpty
      val prev = cur
      cur = stepped.drop("__moved")
      prev.unpersist()
    }
    cur
  }

  /** CLOSURE of the accumulated remap deltas (see the composition note
    * above), SIZE-DISPATCHED like `GlobalRank.estimatedRows`: small
    * remaps collect to the driver for path compression (and return
    * broadcastable = true — the apply join stays a broadcast hash
    * join); a merge-heavy burst past the byte threshold routes to the
    * distributed pointer-doubling closure (broadcastable = false — the
    * apply join shuffles, the honest cost when the remap itself is
    * big). Keys are unique across deltas (a node is a rep until
    * remapped, never again) and chains are acyclic (keeps only
    * decrease), so both closures terminate. Returns None when there is
    * nothing to apply.
    */
  private def closedRemap(spark: SparkSession, dir: String,
                          deltas: Seq[Path],
                          template: DataFrame,
                          guarded: Boolean): Option[(DataFrame, Boolean)] = {
    if (deltas.isEmpty) return None
    val fs = fsOf(spark)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("old_rep",
        template.schema.head.dataType),
      org.apache.spark.sql.types.StructField("keep_id",
        template.schema.head.dataType)))
    val remapPaths = deltas.map(p => new Path(p, "remap"))
      .filter(fs.exists(_))
    if (remapPaths.isEmpty) return None
    val bytes = remapPaths.map(fs.getContentSummary(_).getLength).sum
    // defensive: both closures assume NO identity entries (the write
    // path filters id != keep before committing a remap) — the driver
    // resolve() and the distributed __moved test would each spin
    // forever on old_rep == keep_id, so drop such rows at the source
    // rather than letting a future write-path regression hang the read
    val reader0 = spark.read.schema(schema)
    def load(paths: Seq[Path]): DataFrame =
      reader0.parquet(paths.map(_.toString): _*)
        .where(col("old_rep") =!= col("keep_id"))
    if (bytes > remapDispatchBytes(spark)) {
      val closed = closeRemapDistributed(load(remapPaths))
      // a burst of EMPTY remap files can exceed no byte threshold, so
      // the distributed branch never needs the raw.isEmpty escape;
      // one pin per dir — a fresh closure releases the previous one
      pinnedClosures.put(dir, closed) match {
        case null => ()
        case prev => prev.unpersist()
      }
      return Some((closed, false))
    }
    val raw = load(remapPaths).collect()
    if (raw.isEmpty) return None
    // the guard is advisory pressure on the APPEND/READ paths; fold()
    // bypasses it — it is the remedy the message prescribes, and a
    // store past the limit must still be able to shrink itself
    require(!guarded || raw.length <= 4 * 1000 * 1000,
      s"${raw.length} accumulated remap entries in $dir — fold() is " +
        "overdue (the remap is O(merge events since the last fold); " +
        "fold at compaction cadence keeps it driver-small)")
    val m = scala.collection.mutable.HashMap[Any, Any](
      raw.map(r => r.get(0) -> r.get(1)): _*)
    def resolve(v: Any): Any = {
      var x = v
      while (m.contains(x)) x = m(x)
      x
    }
    val closed = m.keys.map(k => Row(k, resolve(k))).toSeq
    Some((spark.createDataFrame(
      spark.sparkContext.parallelize(closed, 1), schema), true))
  }

  /** Current assignment: base ∪ batch deltas, with the closed remap
    * applied as one broadcast join. The terminal distinct() is the
    * fold-crash tolerance (identical pairs from base and a surviving
    * delta), not a semantic dedup.
    */
  def read(spark: SparkSession, dir: String, idCol: String): DataFrame =
    readRaw(spark, dir, idCol).distinct()

  /** TIME-TRAVEL read: the assignment AS OF batch `asOf` — base plus
    * only the deltas with batchId ≤ asOf, remap closure restricted the
    * same way. This is the reproducibility face of the store (pin the
    * exact dedup state a training snapshot was built against, audit
    * which keep-list admitted a doc) and it falls out of the layout
    * for free: deltas are immutable per-batch dirs, so a past state is
    * a subset union, not a reconstruction.
    *
    * HISTORY HORIZON (the k17 contract, applied here): fold() collapses
    * deltas into base, so states at or before the last folded batch are
    * NOT reconstructible — and takedowns (deleteDocs) rewrite history
    * by design, so they advance the horizon too (a pre-delete snapshot
    * must never resurrect deleted docs). Reads past the horizon REFUSE
    * loudly instead of silently returning the later (folded) state.
    * The marker is claim-first (written before the base swap), so every
    * fold crash window errs toward refusing a read that might still
    * have been serveable — never the reverse.
    */
  def readAsOf(spark: SparkSession, dir: String, idCol: String,
               asOf: Long): DataFrame = {
    Sinks.healSwap(fsOf(spark), s"$dir/base")
    val h = Sinks.readLongMarker(spark, s"$dir/base", "__fold_horizon")
      .getOrElse(-1L)
    if (asOf < h) throw new IllegalStateException(
      s"as-of batch $asOf predates the fold horizon $h of $dir — " +
        "folded/deleted history is not reconstructible (fold() collapses " +
        "deltas into base); snapshot before folding or lower the fold " +
        "cadence")
    val deltas = stateDeltas(spark, dir)
      .filter(_.getName.stripPrefix("batch=").toLong <= asOf)
    assemble(spark, dir, idCol, deltas, guarded = true).distinct()
  }

  /** read() without the crash-tolerance distinct — the internal
    * corpus-state view appendBatch probes. Skipping the distinct there
    * is load-bearing at scale: it is a corpus-wide shuffle, and
    * appendBatch would otherwise pay it PER BATCH for tolerance it
    * does not need (a surviving-fold-window duplicate is an identical
    * (id, keep) pair, and incrementalKeepList's `touched` pipeline
    * ends in its own distinct over the tiny rep set).
    */
  private def readRaw(spark: SparkSession, dir: String,
                      idCol: String, guarded: Boolean = true): DataFrame = {
    // heal a fold that died between its renames (base absent, complete
    // tmp aside) at the NEXT TOUCH — without this, a crashed fold would
    // wedge the stream (appendBatch/read throw path-not-found) until an
    // operator manually re-ran fold(); one exists check when healthy
    Sinks.healSwap(fsOf(spark), s"$dir/base")
    assemble(spark, dir, idCol, stateDeltas(spark, dir), guarded)
  }

  /** base ∪ the given state deltas with their closed remap applied —
    * the shared body of readRaw (all deltas) and readAsOf (deltas ≤
    * the as-of batch). Callers heal the base swap first.
    */
  private def assemble(spark: SparkSession, dir: String, idCol: String,
                       deltas: Seq[Path], guarded: Boolean): DataFrame = {
    val base = spark.read.parquet(s"$dir/base")
    val stored =
      if (deltas.isEmpty) base
      else base.unionByName(spark.read.schema(base.schema)
        .parquet(deltas.map(p => s"$p/assign"): _*))
    closedRemap(spark, dir, deltas, base, guarded) match {
      case None => stored
      case Some((remap, broadcastable)) =>
        val dim0 = remap.withColumnRenamed("keep_id", "__new")
        val dim = if (broadcastable) broadcast(dim0) else dim0
        stored.join(dim, stored("keep_id") === remap("old_rep"), "left")
          .select(col(idCol),
            coalesce(col("__new"), col("keep_id")).as("keep_id"))
    }
  }

  /** Land one batch: solve the affected subgraph, commit (assign,
    * remap) atomically under `state/batch=<batchId>`, then append the
    * batch's bands (exactly-once per batchId). Idempotent under
    * replay. Returns the batch docs' assignments (from the committed
    * state, so a replay returns exactly what the original run did).
    */
  def appendBatch(batchBands: DataFrame, idCol: String, dir: String,
                  batchId: Long): DataFrame = {
    val spark = batchBands.sparkSession
    val fs = fsOf(spark)
    val stateDir = new Path(s"$dir/state/batch=$batchId")
    val bandsDir = s"$dir/bands"
    Sinks.healSwap(fs, bandsDir) // a crashed bands compaction heals here
    // PURE replay (state committed AND bands gen landed or folded):
    // return the stored assignments without materializing the batch —
    // the advertised O(1) skip. Sinks.committedPartitionedAppend would
    // skip the write anyway, but only after the count/persist below.
    if (fs.exists(stateDir) && Sinks.isCommittedGen(fs, bandsDir, batchId))
      return spark.read.parquet(s"$stateDir/assign")
    // replay of a batch whose STATE DELTA WAS FOLDED AWAY (fold,
    // compaction, or deleteDocs ran since it committed): the bands
    // manifest/gen still knows it was committed, and re-solving would
    // write a fresh state delta — harmlessly duplicating base rows
    // after a plain fold, but RESURRECTING DELETED DOCS after a
    // takedown (the batch input still contains them; the store must
    // not). Return the batch's CURRENT assignments instead; docs
    // deleted since are correctly absent.
    if (!fs.exists(stateDir) && Sinks.isCommittedGen(fs, bandsDir, batchId))
      return readRaw(spark, dir, idCol)
        .join(batchBands.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
    // AUTO-FOLD (fresh landings only — replays above stay O(1) skips):
    // when the STANDING deltas' remap bytes exceed the threshold, fold
    // before landing this batch. The check is the same free parquet-
    // byte metadata the size dispatch uses, so an operator who never
    // calls fold() still gets a store whose accumulated remap is
    // bounded by (threshold + one batch) instead of the hard error.
    // DEFERRED while any standing delta is MID-COMMIT (state committed,
    // bands gen not landed — the same guard deleteDocs enforces
    // loudly): folding that state would bake its docs into base
    // WITHOUT their band edges and delete the delta, so a crash before
    // the bands land would leave base durably holding docs no future
    // batch can dedup against. The replay window heals on the stream's
    // own redelivery (foreachBatch serializes), so deferral is safe:
    // the NEXT fresh landing re-checks and folds once the lag is gone.
    val standing = stateDeltas(spark, dir)
    val standingRemapBytes = standing
      .map(p => new Path(p, "remap")).filter(fs.exists(_))
      .map(fs.getContentSummary(_).getLength).sum
    if (standingRemapBytes > autoFoldBytes(spark) &&
        standing.forall(p => Sinks.isCommittedGen(fs, bandsDir,
          p.getName.stripPrefix("batch=").toLong)))
      fold(spark, dir, idCol)
    val nb = MinHashLSH.bucketCount(spark, bandsDir)
    val bb = MinHashLSH.withHashBucket(
        batchBands.select(col(idCol), col("band"), col("h")), nb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (!fs.exists(stateDir)) {
        // sweep dead half-writes (single-writer contract, as in
        // Sinks.committedGenWrite)
        val stateRoot = new Path(s"$dir/state")
        if (fs.exists(stateRoot))
          for (st <- fs.listStatus(stateRoot)
               if st.getPath.getName.startsWith(".tmp_batch_"))
            fs.delete(st.getPath, true)
        // touched-component probe pruned to the batch's own hash
        // buckets (≤ |batch|·k of them) — the d16 move; hb is a pure
        // function of h, so the pruned scan keeps every possibly-
        // matching band row. ONE aggregation action yields both the
        // probed bucket set and its materialization of the bb cache
        // (round-15: this replaces a distinct().collect() + a later
        // count() — two full passes — with one ≤nb-row collect).
        val probedHb = bb.groupBy("hb").count().collect()
          .map(_.getInt(0)).toSeq.sorted
        val corpusBands = MinHashLSH
          .prunedBucketedIndex(spark, bandsDir, probedHb)
          .select(col(idCol), col("band"), col("h"))
        val (assign, remap) = MinHashLSH.incrementalKeepList(
          bb.select(col(idCol), col("band"), col("h")), idCol,
          corpusBands, readRaw(spark, dir, idCol))
        val tmp = new Path(s"$dir/state/.tmp_batch_$batchId")
        // the two state tables are independent writes under one tmp —
        // submit them concurrently (guide §2.6); the atomic publish is
        // still the single rename AFTER both complete
        Sinks.awaitAllWrites(spark, Seq(
          () => assign.write.parquet(s"$tmp/assign"),
          () => remap.write.parquet(s"$tmp/remap")))
        Sinks.renameOrThrow(fs, tmp, stateDir)
      }
      // the sink clusters on hb with explicit parallelism (round-15:
      // the old coalesce(1) wrote all ≤64 bucket files from ONE task —
      // ~1.1 s of serial creates per append, and serial at any scale;
      // clusterByPartition writes them in parallel, still ≤1 file per
      // bucket)
      Sinks.committedPartitionedAppend(bb, bandsDir, batchId, "hb")
    } finally bb.unpersist()
    spark.read.parquet(s"$stateDir/assign")
  }

  /** Compaction-cadence rewrite: materialize read() as the new `base`
    * (the shared Sinks.swapRewrite rename-aside state machine) and
    * clear the deltas. Crash windows: mid-write → invisible; between
    * the two renames → `base` absent, the complete tmp wins at the
    * NEXT TOUCH of the store (readRaw/appendBatch/fold all heal via
    * Sinks.healSwap — a crashed fold must not wedge the stream until
    * an operator intervenes); in either post-write window surviving
    * deltas leave read() unchanged (identical pairs, see the
    * distinct() note) and the next fold clears them.
    */
  /** DECREMENTAL connected components — the delete path of dedup state
    * (takedown/GDPR removals): drop `docIds` from the store and repair
    * the assignment EXACTLY, including the case a remap-only scheme
    * gets wrong — a deleted doc that BRIDGED a component must SPLIT it
    * back into the pieces its remaining buckets support.
    *
    * The repair re-solves only the AFFECTED COMPONENTS (those owning a
    * deleted member), from their survivors' already-filtered band rows.
    * That subgraph is CLOSED: a survivor sharing a bucket with any doc
    * outside its component would already share that doc's component —
    * contradiction — so the re-solve can never merge into, or steal
    * from, untouched components, and its working set tracks the
    * affected components, never the corpus.
    *
    * Ordering and crash contract (idempotent, re-run on failure — the
    * appendBatch discipline): fold first (one source of truth), then
    * the bands rewrite (a replayed batch whose docs were deleted must
    * stay a pure skip — deleting data does NOT un-commit its batch, the
    * manifest keeps that true), then the base swap. A crash between the
    * two rewrites leaves deleted ids visible in read() until the
    * re-run, but never resurrects their bands: future appends cannot
    * dedup new docs against deleted content.
    */
  def deleteDocs(docIds: DataFrame, idCol: String, dir: String): Unit = {
    val spark = docIds.sparkSession
    val fs = fsOf(spark)
    // REFUSE while any batch is mid-commit (state delta committed,
    // bands gen not yet landed — appendBatch's documented lag window):
    // folding that state would bake its docs into base WITHOUT their
    // band edges (permanent under-merge of the re-solve), and the
    // batch's later replay would re-append bands for docs this call
    // was asked to delete. The lag heals on the stream's own replay —
    // takedown requires a quiesced store, and a loud error here is the
    // difference between an operational retry and silent corruption.
    for (p <- stateDeltas(spark, dir)) {
      val b = p.getName.stripPrefix("batch=").toLong
      if (!Sinks.isCommittedGen(fs, s"$dir/bands", b))
        throw new IllegalStateException(
          s"batch $b has committed state but no bands generation in " +
            s"$dir — a landing is mid-commit; let the stream replay/heal " +
            "before running a takedown")
    }
    fold(spark, dir, idCol)
    val del = docIds.select(col(idCol)).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      Sinks.rewriteGenerations(spark, s"$dir/bands", Some("hb"),
        df => df.join(broadcast(del), Seq(idCol), "left_anti"))
      val base = spark.read.parquet(s"$dir/base")
      val affected = base.join(broadcast(del), Seq(idCol), "left_semi")
        .select("keep_id").distinct()
      val members = base.join(broadcast(affected), Seq("keep_id"), "left_semi")
      val survivors = members.join(broadcast(del), Seq(idCol), "left_anti")
        .select(idCol)
      val resolved = MinHashLSH.convergeKeepList(
        spark.read.parquet(s"$dir/bands")
          .select(col(idCol), col("band"), col("h"))
          .join(survivors, Seq(idCol), "left_semi"),
        idCol)
      // survivors whose every band row left with the deletions keep
      // themselves (left join + coalesce); untouched components pass
      // through unchanged
      val rebuilt = base.join(broadcast(affected), Seq("keep_id"), "left_anti")
        .select(col(idCol), col("keep_id"))
        .unionByName(survivors
          .join(resolved.withColumnRenamed("keep_id", "__k"), Seq(idCol), "left")
          .select(col(idCol), coalesce(col("__k"), col(idCol)).as("keep_id")))
      Sinks.swapRewrite(fs, s"$dir/base")(tmp => rebuilt.write.parquet(tmp))
    } finally del.unpersist()
  }

  def fold(spark: SparkSession, dir: String, idCol: String): Unit = {
    val fs = fsOf(spark)
    Sinks.healSwap(fs, s"$dir/base")
    val deltas = stateDeltas(spark, dir)
    if (deltas.isEmpty) return
    // claim the history horizon BEFORE the swap (readAsOf's contract):
    // a crash between marker and swap refuses as-of reads the surviving
    // deltas could still have served — conservative, never the reverse
    Sinks.recordLongMarker(spark, s"$dir/base", "__fold_horizon",
      deltas.map(_.getName.stripPrefix("batch=").toLong).max)
    // UNGUARDED read: fold is the remedy the remap-size guard
    // prescribes, so it must work past the limit
    val folded = readRaw(spark, dir, idCol, guarded = false).distinct()
    Sinks.swapRewrite(fs, s"$dir/base")(tmp => folded.write.parquet(tmp))
    stateDeltas(spark, dir).foreach(p => fs.delete(p, true))
    // the folded base is durable and the deltas are gone — any cached
    // distributed closure for this dir has nothing left to serve
    releasePinned(dir)
  }
}
