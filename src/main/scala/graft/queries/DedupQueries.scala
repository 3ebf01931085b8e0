package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MinHashLSH, VectorOps}
import graft.sources.Tables

/** Deduplication pack — the large-scale training-data-pipeline ops:
  * exact hash dedup, MinHash+LSH candidate generation, n-gram Jaccard
  * verification, SimHash fingerprints, and embedding-cosine near-dup.
  *
  * Design for 100 TB:
  *  - exact dedup is one hash-groupBy (map-side partial agg; the
  *    shuffle carries one row per distinct fingerprint)
  *  - MinHash/LSH replaces the quadratic all-pairs compare with
  *    shingle→signature→band→bucket-join: only rows agreeing on a band
  *    hash ever meet in the join, and the band join is a plain shuffle
  *    equi-join AQE can re-plan for skew (hot buckets)
  *  - Jaccard verification runs ONLY on LSH candidates (the classic
  *    two-stage candidate/verify shape), never all pairs
  *  - token/bit hashing uses md5, stable across engines and JVMs —
  *    never String.hashCode
  *  - signatures/fingerprints are built with codegen'd higher-order
  *    expressions (transform/aggregate/zip_with) — zero UDFs, zero
  *    per-row JVM object churn beyond the arrays themselves
  */
object DedupQueries extends QueryPack {

  /** tokens column (space-split) */
  private def withWords(df: DataFrame): DataFrame =
    df.withColumn("w", split(col("text"), " "))

  /** Shared CHAIN-topology band rows for the keep-list gates/probes
    * (d17, d18, e23, tools.StoreProbe): every doc in its own bucket,
    * plus doc↔(doc-1) linkage broken at %8 boundaries — one definition
    * so the gates can never silently diverge from their recursive
    * oracles (which restate exactly these edges).
    */
  private[graft] def chainBands(df: DataFrame): DataFrame =
    df.select(col("doc_id"), lit(0).as("band"), col("doc_id").as("h"))
      .union(df.where(col("doc_id") % 8 =!= 0)
        .select(col("doc_id"), lit(0).as("band"),
          (col("doc_id") - 1).as("h")))

  /** distinct 3-gram shingles: native word_ngrams (UTF8String concats,
    * no per-word String conversion) + array_distinct (first-occurrence
    * order, same as the previous compiled UDF's LinkedHashSet)
    */
  private def withShingles(df: DataFrame): DataFrame = {
    graft.GraftExtensions.registerNative(df.sparkSession)
    withWords(df).withColumn("sh", expr("array_distinct(word_ngrams(w, 3))"))
  }

  /** shared with EventQueries' e18 (the streaming face of d13) */
  private[queries] def duckBandsSql: String = duckBands

  /** the shingle→minhash→band chain over an arbitrary (doc_id, text)
    * relation, CTE names prefixed — ONE copy of the fingerprint SQL:
    * `duckBands` is the empty-prefix instantiation over `documents`,
    * and d15 restates the SAME pipeline over its synthetic probe batch
    * with prefix "p"
    */
  private def duckBandsChain(src: String, p: String): String =
    s"""${p}sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(w)-1),
         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM $src)),
        ${p}mh AS (SELECT doc_id,
                 [list_aggregate(list_transform(sh, x -> md5(j::VARCHAR || x)), 'min')
                  FOR j IN range(4)] AS sig FROM ${p}sh),
        ${p}bands AS (SELECT doc_id, unnest(range(4)) AS band,
                    sig[unnest(range(4)) + 1] AS h FROM ${p}mh)"""

  private val duckBands = s"WITH ${duckBandsChain("documents", "")}"

  /** d13/d16 shared verdict restatement (the two gates differ only in
    * index LAYOUT — flat scan vs hash-bucket-pruned — never in result)
    */
  private val duckIncrementalVerdicts =
    s"""$duckBands,
        corpus AS (SELECT * FROM bands WHERE doc_id % 5 <> 0 AND h IS NOT NULL),
        batch AS (SELECT * FROM bands WHERE doc_id % 5 = 0 AND h IS NOT NULL),
        hitc AS (SELECT DISTINCT b.doc_id FROM batch b
                 JOIN corpus c ON b.band = c.band AND b.h = c.h),
        hitb AS (SELECT DISTINCT b.doc_id FROM batch b
                 JOIN batch a ON b.band = a.band AND b.h = a.h
                  AND a.doc_id < b.doc_id)
        SELECT i.doc_id,
          (hc.doc_id IS NOT NULL) AS dup_of_corpus,
          (hb.doc_id IS NOT NULL) AS dup_in_batch,
          (hc.doc_id IS NULL AND hb.doc_id IS NULL) AS admitted
        FROM (SELECT DISTINCT doc_id FROM batch) i
        LEFT JOIN hitc hc ON i.doc_id = hc.doc_id
        LEFT JOIN hitb hb ON i.doc_id = hb.doc_id"""

  /** d15/d19 shared restatement (flat vs generational-bucketed
    * compaction — layout and folding can never change verdicts):
    * corpus + two sequential admitted batches, then the probe batch
    * judged against the accumulated index, `compacted` asserted true.
    */
  private val duckCompactionOracle =
    s"""$duckBands,
        corpus AS (SELECT * FROM bands WHERE doc_id % 5 <> 0 AND h IS NOT NULL),
        a AS (SELECT * FROM bands WHERE doc_id % 10 = 0 AND h IS NOT NULL),
        b AS (SELECT * FROM bands WHERE doc_id % 10 = 5 AND h IS NOT NULL),
        hc1 AS (SELECT DISTINCT x.doc_id FROM a x
                JOIN corpus c ON x.band = c.band AND x.h = c.h),
        hb1 AS (SELECT DISTINCT x.doc_id FROM a x
                JOIN a y ON x.band = y.band AND x.h = y.h
                 AND y.doc_id < x.doc_id),
        adm1 AS (SELECT DISTINCT doc_id FROM a
                 WHERE doc_id NOT IN (SELECT doc_id FROM hc1)
                   AND doc_id NOT IN (SELECT doc_id FROM hb1)),
        idx2 AS (SELECT * FROM corpus
                 UNION ALL SELECT a.* FROM a JOIN adm1 USING (doc_id)),
        hc2 AS (SELECT DISTINCT x.doc_id FROM b x
                JOIN idx2 c ON x.band = c.band AND x.h = c.h),
        hb2 AS (SELECT DISTINCT x.doc_id FROM b x
                JOIN b y ON x.band = y.band AND x.h = y.h
                 AND y.doc_id < x.doc_id),
        adm2 AS (SELECT DISTINCT doc_id FROM b
                 WHERE doc_id NOT IN (SELECT doc_id FROM hc2)
                   AND doc_id NOT IN (SELECT doc_id FROM hb2)),
        idx3 AS (SELECT * FROM idx2
                 UNION ALL SELECT b.* FROM b JOIN adm2 USING (doc_id)),
        probe_docs AS (
          SELECT doc_id + 1000000 AS doc_id, text
          FROM documents WHERE doc_id % 7 = 0
          UNION ALL
          SELECT doc_id + 2000000 AS doc_id,
            'u'||doc_id||'x0 u'||doc_id||'x1 u'||doc_id||'x2 u'||doc_id||
            'x3 u'||doc_id||'x4 u'||doc_id||'x5 u'||doc_id||'x6 u'||doc_id||'x7' AS text
          FROM documents WHERE doc_id % 11 = 0),
        ${duckBandsChain("probe_docs", "p")},
        pb AS (SELECT * FROM pbands WHERE h IS NOT NULL),
        hcp AS (SELECT DISTINCT x.doc_id FROM pb x
                JOIN idx3 c ON x.band = c.band AND x.h = c.h),
        hbp AS (SELECT DISTINCT x.doc_id FROM pb x
                JOIN pb y ON x.band = y.band AND x.h = y.h
                 AND y.doc_id < x.doc_id)
        SELECT i.doc_id,
          (hcp.doc_id IS NOT NULL) AS dup_of_corpus,
          (hbp.doc_id IS NOT NULL) AS dup_in_batch,
          (hcp.doc_id IS NULL AND hbp.doc_id IS NULL) AS admitted,
          true AS compacted
        FROM (SELECT DISTINCT doc_id FROM pb) i
        LEFT JOIN hcp ON i.doc_id = hcp.doc_id
        LEFT JOIN hbp ON i.doc_id = hbp.doc_id"""

  def all: Seq[Q] = Seq(

    // ---- Exact dedup: md5 fingerprint groupBy; keeper = min doc_id.
    Q("d1_exact_dedup",
      (s, d) => Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fingerprint"))
        .agg(count(lit(1)).as("n_copies"), min("doc_id").as("keep_doc_id")),
      Some("""SELECT md5(text) AS fingerprint, count(*) AS n_copies,
              min(doc_id) AS keep_doc_id FROM documents GROUP BY 1""")),

    // ---- MinHash+LSH candidate pairs: equal band hash ⇒ candidate.
    // One signature pass + one shuffle; pairs expand per bucket (no
    // self-join, no second signature computation).
    Q("d2_minhash_lsh_pairs",
      (s, d) => MinHashLSH.candidatePairs(
        withWords(Tables.documents(s, d)), "doc_id", col("w")),
      Some(s"""$duckBands
              SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
              FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
              WHERE a.doc_id < b.doc_id""")),

    // ---- Pair-free dedup keep-list: one row per doc regardless of
    // duplicate density (see PERF.md scaling experiment). The operator
    // is the pointer-jumping FIXPOINT (full connected components of the
    // band-bucket graph); the oracle restates the same fixpoint as a
    // recursive-CTE transitive closure — no hop-count assumption on
    // either side.
    Q("d6_dedup_keeplist",
      (s, d) => MinHashLSH.dedupKeepList(
        withWords(Tables.documents(s, d)), "doc_id", col("w")),
      Some(s"""${duckBands.replaceFirst("WITH", "WITH RECURSIVE")},
              edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                        FROM bands a JOIN bands b
                          ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM (SELECT DISTINCT doc_id FROM bands)
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id FROM reach GROUP BY doc_id""")),

    // ---- Fixpoint keep-list on an adversarial CHAIN topology: doc i
    // shares a bucket only with i±1 inside blocks of 8 — diameter 7, so
    // the legacy fixed-2-hop path provably under-merges (reach = 4;
    // MinHashLSHSpec pins that), while the pointer-jumping fixpoint
    // collapses every block to its minimum id. The oracle restates full
    // connected components with a recursive CTE (transitive closure,
    // then min per reachability set) — no hop-count assumption on
    // either side.
    Q("d10_dedup_chain_fixpoint",
      (s, d) => {
        val ids = Tables.documents(s, d).select("doc_id")
        val own = ids.select(col("doc_id"), lit(0).as("band"),
          col("doc_id").as("h"))
        val prev = ids.where(col("doc_id") % 8 =!= 0)
          .select(col("doc_id"), lit(0).as("band"), (col("doc_id") - 1).as("h"))
        MinHashLSH.convergeKeepList(own.union(prev), "doc_id")
      },
      Some("""WITH RECURSIVE
              edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
                        FROM documents a JOIN documents b
                          ON b.doc_id = a.doc_id + 1 AND b.doc_id % 8 <> 0),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id FROM reach GROUP BY doc_id""")),

    // ---- INCREMENTAL KEEP-LIST (d17): the d6 product made
    // incremental — the corpus's connected-components assignment is
    // computed ONCE; the landing batch re-solves only the AFFECTED
    // SUBGRAPH (batch docs + one rep pseudo-node per touched
    // component: min-propagation inside an already-collapsed component
    // is the identity, so each old component is one node). Merges
    // surface as a tiny (old_rep → keep_id) REMAP applied at read time
    // — storage is never rewritten per batch. The chain topology makes
    // BRIDGING guaranteed: corpus fragments break exactly at the batch
    // positions (every 5th id missing) and each batch doc reconnects
    // its neighbors' fragments, so most touched components must remap.
    // The oracle is the INDEPENDENT full recursive closure over all
    // docs (d10's), so any under-merge, over-merge, or stale-remap bug
    // in the incremental path fails the hash.
    Q("d17_incremental_keeplist",
      (s, d) => {
        val ids = Tables.documents(s, d).select("doc_id")
        val corpusBands = chainBands(ids.where(col("doc_id") % 5 =!= 0))
        // built once (at scale this assignment lives on disk)
        val corpusState = MinHashLSH.convergeKeepList(corpusBands, "doc_id")
        val (batchAssign, remap) = MinHashLSH.incrementalKeepList(
          chainBands(ids.where(col("doc_id") % 5 === 0)), "doc_id",
          corpusBands, corpusState)
        // read-time application: one broadcast join over the remap
        corpusState.as("c")
          .join(broadcast(remap.withColumnRenamed("keep_id", "__new")),
            col("c.keep_id") === col("old_rep"), "left")
          .select(col("c.doc_id"),
            coalesce(col("__new"), col("c.keep_id")).as("keep_id"))
          .unionByName(batchAssign)
      },
      Some("""WITH RECURSIVE
              edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
                        FROM documents a JOIN documents b
                          ON b.doc_id = a.doc_id + 1 AND b.doc_id % 8 <> 0),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id FROM reach GROUP BY doc_id""")),

    // ---- KEEP-LIST LIFECYCLE (d18): d17 solved the affected subgraph
    // but left the state in memory; this drives the PERSISTED story a
    // 100 TB deployment runs — KeepListStore backfill → two
    // crash-atomic batch landings → fold → read. The topology forces
    // the hard case d17 cannot reach: REMAP COMPOSITION. Corpus drops
    // doc_id % 5 = 1, breaking the chain into 4-long fragments (and at
    // %8 boundaries); batch 0 (%5=1) fuses fragments into full runs
    // between %8 chain breaks (losing fragment reps remap to run
    // minima — e.g. some rep r → 8m), and batch 1's synthetic bridge
    // docs (id+1000000, banded to 8m and 8m-1) fuse adjacent runs —
    // remapping run minima that are themselves batch-0 remap TARGETS
    // (r → 8m → prev-run min), so the read path's driver-side remap
    // closure is load-bearing, not decorative. (The zero-remap batch
    // case is pinned at unit scale by MinHashLSHSpec's fresh-docs
    // test.) fold() then rewrites base and clears the deltas; the
    // `folded` column asserts deltas are gone AND the post-fold read is
    // row-identical to the pre-fold read (materialized to parquet
    // before the fold — the read is lazy and the fold deletes its
    // inputs). Oracle: independent full recursive closure over
    // documents ∪ the synthetic bridges.
    Q("d18_keeplist_lifecycle",
      (s, d) => {
        import graft.operators.KeepListStore
        val ids = Tables.documents(s, d).select("doc_id")
        val base = Scratch.dir("graft_d18_")
        val dir = base.resolve("kl").toString
        KeepListStore.backfill(
          chainBands(ids.where(col("doc_id") % 5 =!= 1)), "doc_id", dir)
        KeepListStore.appendBatch(
          chainBands(ids.where(col("doc_id") % 5 === 1)), "doc_id", dir, 0L)
        val orig = ids.where(col("doc_id") % 8 === 0 && col("doc_id") > 0)
          .select(col("doc_id").as("orig"))
        val bridges = orig
          .select((col("orig") + 1000000L).as("doc_id"), lit(0).as("band"),
            col("orig").as("h"))
          .union(orig.select((col("orig") + 1000000L).as("doc_id"),
            lit(0).as("band"), (col("orig") - 1).as("h")))
        KeepListStore.appendBatch(bridges, "doc_id", dir, 1L)
        val beforeDir = base.resolve("before").toString
        KeepListStore.read(s, dir, "doc_id").write.parquet(beforeDir)
        KeepListStore.fold(s, dir, "doc_id")
        val after = KeepListStore.read(s, dir, "doc_id")
        val before = s.read.parquet(beforeDir)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        val deltasGone = !fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$dir/state"))
          .exists(_.getPath.getName.startsWith("batch="))
        val unchanged = after.unionByName(before)
          .groupBy("doc_id", "keep_id").count()
          .where(col("count") =!= 2).isEmpty
        after.withColumn("folded", lit(deltasGone && unchanged))
      },
      Some("""WITH RECURSIVE
              nodes AS (SELECT doc_id FROM documents
                        UNION ALL
                        SELECT doc_id + 1000000 FROM documents
                        WHERE doc_id % 8 = 0 AND doc_id > 0),
              edges AS (
                SELECT a.doc_id AS src, b.doc_id AS dst
                FROM documents a JOIN documents b
                  ON b.doc_id = a.doc_id + 1 AND b.doc_id % 8 <> 0
                UNION ALL
                SELECT doc_id + 1000000, doc_id FROM documents
                WHERE doc_id % 8 = 0 AND doc_id > 0
                UNION ALL
                SELECT doc_id + 1000000, doc_id - 1 FROM documents
                WHERE doc_id % 8 = 0 AND doc_id > 0),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM nodes
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id, TRUE AS folded
              FROM reach GROUP BY doc_id""")),

    // ---- TIME-TRAVEL read of the keep-list store (d23): the
    // reproducibility face of the persisted dedup state — pin the exact
    // assignment a training snapshot was built against. The layout
    // makes a past state a SUBSET UNION (base + deltas ≤ asOf, remap
    // closure restricted the same way), not a reconstruction. d18's
    // topology makes the restriction load-bearing: batch 1's bridges
    // fuse runs and REMAP batch-0 targets, so an as-of-0 read that
    // leaked batch-1 deltas (or its remap entries) merges components
    // the oracle keeps apart. The gate also pins the HISTORY-HORIZON
    // contract end-to-end: after fold(), readAsOf(0) must REFUSE loudly
    // (folded history is gone — the k17 discipline), while readAsOf at
    // the horizon itself equals the current read; both are asserted in
    // `asof_contract`. Oracle: full recursive closure over documents
    // WITHOUT the bridges (exactly the pre-batch-1 world), TRUE for the
    // contract column.
    Q("d23_keeplist_asof",
      (s, d) => {
        import graft.operators.KeepListStore
        val ids = Tables.documents(s, d).select("doc_id")
        val base = Scratch.dir("graft_d23_")
        val dir = base.resolve("kl").toString
        KeepListStore.backfill(
          chainBands(ids.where(col("doc_id") % 5 =!= 1)), "doc_id", dir)
        KeepListStore.appendBatch(
          chainBands(ids.where(col("doc_id") % 5 === 1)), "doc_id", dir, 0L)
        val orig = ids.where(col("doc_id") % 8 === 0 && col("doc_id") > 0)
          .select(col("doc_id").as("orig"))
        val bridges = orig
          .select((col("orig") + 1000000L).as("doc_id"), lit(0).as("band"),
            col("orig").as("h"))
          .union(orig.select((col("orig") + 1000000L).as("doc_id"),
            lit(0).as("band"), (col("orig") - 1).as("h")))
        KeepListStore.appendBatch(bridges, "doc_id", dir, 1L)
        // materialize BEFORE the fold — the read is lazy and fold()
        // deletes the very deltas it selects
        val asOf0Dir = base.resolve("asof0").toString
        KeepListStore.readAsOf(s, dir, "doc_id", 0L).write.parquet(asOf0Dir)
        KeepListStore.fold(s, dir, "doc_id")
        val loud =
          try { KeepListStore.readAsOf(s, dir, "doc_id", 0L); false }
          catch { case _: IllegalStateException => true }
        val atHorizon = KeepListStore.readAsOf(s, dir, "doc_id", 1L)
        val consistent = atHorizon
          .unionByName(KeepListStore.read(s, dir, "doc_id"))
          .groupBy("doc_id", "keep_id").count()
          .where(col("count") =!= 2).isEmpty
        s.read.parquet(asOf0Dir)
          .withColumn("asof_contract", lit(loud && consistent))
      },
      Some("""WITH RECURSIVE
              edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
                        FROM documents a JOIN documents b
                          ON b.doc_id = a.doc_id + 1 AND b.doc_id % 8 <> 0),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id, TRUE AS asof_contract
              FROM reach GROUP BY doc_id""")),

    // ---- MERGE-HEAVY BURST between folds (d29): the distributed fold
    // path. The read-side remap closure is size-dispatched (driver path
    // collection vs pointer-doubling self-joins); this gate pins the
    // DISTRIBUTED branch end-to-end by forcing the dispatch threshold
    // to 0 and driving a burst of THOUSANDS of non-identity remaps
    // between folds: every doc gets 4 singleton satellite components
    // (backfill), batch 0 bridges each satellite into its doc's
    // component (4 merge events per doc — each one a remap s→d), and
    // batch 1 chains docs into %8 runs (remaps d→run-min that COMPOSE
    // with batch 0's targets: s→d→8m). fold() then runs under the same
    // forced-distributed conf; the `folded` column asserts deltas are
    // gone and the post-fold read is row-identical to the pre-fold
    // read. Oracle: independent recursive closure over the full
    // synthetic node/edge set. (KeepListStoreSpec separately proves
    // driver and distributed closures equal on one store.)
    Q("d29_keeplist_burst_fold",
      (s, d) => {
        import graft.operators.KeepListStore
        val ids = Tables.documents(s, d).select("doc_id")
        val base = Scratch.dir("graft_d29_")
        val dir = base.resolve("kl").toString
        val sats = ids.select(col("doc_id"),
            explode(sequence(lit(1), lit(4))).as("j"))
          .select(col("doc_id"),
            (col("doc_id") + col("j") * 100000000L).as("sid"))
        val singles = ids.select(col("doc_id").as("id"))
          .unionByName(sats.select(col("sid").as("id")))
          .select(col("id").as("doc_id"), lit(0).as("band"), col("id").as("h"))
        KeepListStore.backfill(singles, "doc_id", dir)
        withConf(s, "graft.keeplist.driverRemapBytes", "0") {
          val b0 = sats.select((col("sid") + 400000000L).as("doc_id"),
              lit(0).as("band"), col("sid").as("h"))
            .unionByName(sats.select((col("sid") + 400000000L).as("doc_id"),
              lit(0).as("band"), col("doc_id").as("h")))
          KeepListStore.appendBatch(b0, "doc_id", dir, 0L)
          val linked = ids.where(col("doc_id") % 8 =!= 0)
          val b1 = linked.select((col("doc_id") + 900000000L).as("doc_id"),
              lit(0).as("band"), col("doc_id").as("h"))
            .unionByName(linked.select((col("doc_id") + 900000000L).as("doc_id"),
              lit(0).as("band"), (col("doc_id") - 1).as("h")))
          KeepListStore.appendBatch(b1, "doc_id", dir, 1L)
          // materialize BEFORE the fold — the read is lazy and fold()
          // deletes the very deltas it reads
          val beforeDir = base.resolve("before").toString
          KeepListStore.read(s, dir, "doc_id").write.parquet(beforeDir)
          KeepListStore.fold(s, dir, "doc_id")
          val after = KeepListStore.read(s, dir, "doc_id")
          val before = s.read.parquet(beforeDir)
          val fs = org.apache.hadoop.fs.FileSystem.get(
            s.sparkContext.hadoopConfiguration)
          val deltasGone = !fs.listStatus(
              new org.apache.hadoop.fs.Path(s"$dir/state"))
            .exists(_.getPath.getName.startsWith("batch="))
          val unchanged = after.unionByName(before)
            .groupBy("doc_id", "keep_id").count()
            .where(col("count") =!= 2).isEmpty
          after.withColumn("folded", lit(deltasGone && unchanged))
        }
      },
      Some("""WITH RECURSIVE
              js AS (SELECT unnest(range(1, 5)) AS j),
              sats AS (SELECT doc_id, doc_id + j * 100000000 AS sid
                       FROM documents, js),
              nodes AS (
                SELECT doc_id FROM documents
                UNION ALL SELECT sid FROM sats
                UNION ALL SELECT sid + 400000000 FROM sats
                UNION ALL SELECT doc_id + 900000000 FROM documents
                WHERE doc_id % 8 <> 0),
              edges AS (
                SELECT sid + 400000000 AS src, sid AS dst FROM sats
                UNION ALL SELECT sid + 400000000, doc_id FROM sats
                UNION ALL SELECT doc_id + 900000000, doc_id
                  FROM documents WHERE doc_id % 8 <> 0
                UNION ALL SELECT a.doc_id + 900000000, b.doc_id
                  FROM documents a JOIN documents b ON b.doc_id = a.doc_id - 1
                  WHERE a.doc_id % 8 <> 0),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM nodes
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id, TRUE AS folded
              FROM reach GROUP BY doc_id""")),

    // ---- AUTO-FOLD lifecycle (d31): the self-healing face of the
    // store — d29 proved fold() scales past the dispatch threshold,
    // but fold was still a MANUAL remedy; this gate drives three
    // merge-burst batches with the auto-fold threshold forced low and
    // NEVER calls fold() — appendBatch itself must fold the standing
    // deltas before each landing (batch k's append folds batch k−1),
    // leaving exactly one surviving delta and a read identical to the
    // batch-blind closure. Topology: singleton backfill, then the
    // d23 chain bridges split across batches by doc_id % 3, so every
    // batch generates real remap entries (merges re-electing reps)
    // and remaps COMPOSE across the auto-folds. `auto_folded` asserts
    // the state dir holds only the last batch — the store healed
    // itself. Oracle: recursive closure over the full bridge graph,
    // batch- and fold-blind.
    Q("d31_keeplist_auto_fold",
      (s, d) => {
        import graft.operators.KeepListStore
        val ids = Tables.documents(s, d).select("doc_id")
        val dir = Scratch.dir("graft_d31_").resolve("kl").toString
        KeepListStore.backfill(
          ids.select(col("doc_id"), lit(0).as("band"),
            col("doc_id").as("h")), "doc_id", dir)
        withConf(s, "graft.keeplist.autoFoldBytes", "1") {
          for (k <- 0 until 3) {
            val linked = ids.where(col("doc_id") % 8 =!= 0 &&
              col("doc_id") % 3 === k)
            val bid = (col("doc_id") + (k + 1) * 100000000L).as("doc_id")
            KeepListStore.appendBatch(
              linked.select(bid, lit(0).as("band"), col("doc_id").as("h"))
                .unionByName(linked.select(bid, lit(0).as("band"),
                  (col("doc_id") - 1).as("h"))),
              "doc_id", dir, k.toLong)
          }
        }
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        val surviving = fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$dir/state"))
          .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq
        val head = KeepListStore.read(s, dir, "doc_id")
        // an AS-OF read over the auto-folded store (folded base + the
        // one surviving delta — the permanent shape of the fold
        // window) must return exactly the head view, never a
        // pre/post-fold mix: symmetric difference empty BOTH ways
        val asOf = KeepListStore.readAsOf(s, dir, "doc_id", 2L)
        val asofConsistent =
          asOf.exceptAll(head).isEmpty && head.exceptAll(asOf).isEmpty
        head.withColumn("auto_folded",
          lit(surviving == Seq("batch=2") && asofConsistent))
      },
      Some("""WITH RECURSIVE
              br AS (SELECT doc_id,
                       doc_id + (doc_id % 3 + 1) * 100000000 AS bid
                     FROM documents WHERE doc_id % 8 <> 0),
              nodes AS (SELECT doc_id FROM documents
                        UNION ALL SELECT bid FROM br),
              edges AS (SELECT bid AS src, doc_id AS dst FROM br
                        UNION ALL
                        SELECT b.bid, a.doc_id FROM br b
                        JOIN documents a ON a.doc_id = b.doc_id - 1),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM nodes
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id, TRUE AS auto_folded
              FROM reach GROUP BY doc_id""")),

    // ---- INCREMENTAL dedup against a PERSISTED fingerprint index (the
    // shape a 100 TB deployment actually runs): the corpus (doc_id % 5
    // != 0) is fingerprinted ONCE into a parquet band index; when the
    // new batch (doc_id % 5 == 0) lands, ONLY the batch is hashed — the
    // corpus is never re-scanned. The index probe is an equi-join on
    // (band, h) with the small batch side broadcast (one map-side pass
    // over the index), within-batch dups use keep-first, and admitted
    // docs' bands are APPENDED to the index so the next batch sees this
    // batch's survivors (maintenance cost tracks |batch|, never
    // |corpus|). Oracle restates both sides' bands and both collision
    // tests from scratch.
    Q("d13_incremental_index_dedup",
      (s, d) => {
        val docs = withWords(Tables.documents(s, d))
        val corpus = docs.where(col("doc_id") % 5 =!= 0)
        val batch = docs.where(col("doc_id") % 5 === 0)
        val idxDir = Scratch.dir("graft_d13_").resolve("bands").toString
        // one-time backfill (at scale this already exists on disk)
        MinHashLSH.bands(corpus, "doc_id", col("w"), 4)
          .write.parquet(idxDir)
        MinHashLSH.incrementalDedup(
          MinHashLSH.bands(batch, "doc_id", col("w"), 4), "doc_id", idxDir)
      },
      Some(duckIncrementalVerdicts)),

    // ---- BUCKETED band index (d16): the 100 TB serving layout of d13
    // — the flat index pays a full (map-only) index scan per batch; at
    // real scale that is |corpus| I/O every batch. Here band rows carry
    // hb = pmod(xxhash64(h), 64), the index lives under gen=<batch>/
    // hb=<n>/ partition dirs (exactly-once generational appends), and
    // the batch probe PRUNES the scan to its own hash buckets — at
    // most |batch|·k of them — so probe I/O tracks |batch|, never
    // |corpus|. The bucket count is a recorded layout contract
    // (probing derives it from the index's marker — a mismatched guess
    // would silently prune true collisions, so the knob only exists at
    // build time). hb is a pure function of h (pruned rows cannot
    // collide), so the verdicts are byte-identical to d13's and the
    // gate shares its oracle; IncrementalDedupCrashSpec pins
    // layout-equality and the partition prune on the operator's own
    // pruned read.
    Q("d16_bucketed_index_dedup",
      (s, d) => {
        val docs = withWords(Tables.documents(s, d))
        val idxDir = Scratch.dir("graft_d16_").resolve("bands").toString
        MinHashLSH.buildBucketedIndex(
          MinHashLSH.bands(docs.where(col("doc_id") % 5 =!= 0),
            "doc_id", col("w"), 4), idxDir)
        MinHashLSH.incrementalDedupBucketed(
          MinHashLSH.bands(docs.where(col("doc_id") % 5 === 0),
            "doc_id", col("w"), 4),
          "doc_id", idxDir, batchId = 0L)
      },
      Some(duckIncrementalVerdicts)),

    // ---- Band-index COMPACTION round-trip (the x36 discipline for the
    // d13/e18 persisted index): every committed micro-batch appends one
    // delta file, so at streaming cadence the index accumulates
    // thousands of small files — a listing-time kill at 100 TB. The
    // gate drives the full lifecycle: backfill → two committed batches
    // (each landing a delta) → Sinks.compact (atomic rename-swap, same
    // crash discipline as x36) → a PROBE batch judged against the
    // compacted index. The probe mixes replayed texts under fresh ids
    // (must hit the corpus/admitted fingerprints — any compaction loss
    // flips them to admitted) with genuinely novel docs (must be
    // admitted — any compaction duplication cannot create collisions,
    // but a corrupted swap would); the `compacted` column carries the
    // file-count assertion (strictly fewer index files after). Commit
    // markers live in a sibling dir, so batch replay after compaction
    // stays a pure skip (IncrementalDedupCrashSpec pins that).
    Q("d15_index_compaction",
      (s, d) => {
        import graft.operators.MinHashLSH
        val docs = withWords(Tables.documents(s, d)).select("doc_id", "text", "w")
        val base = Scratch.dir("graft_d15_")
        val idxDir = base.resolve("bands").toString
        val vDir = base.resolve("verdicts").toString
        MinHashLSH.bands(docs.where(col("doc_id") % 5 =!= 0),
          "doc_id", col("w"), 4).write.parquet(idxDir)
        MinHashLSH.committedIncrementalDedup(
          MinHashLSH.bands(docs.where(col("doc_id") % 10 === 0),
            "doc_id", col("w"), 4), "doc_id", idxDir, vDir, 0L)
        MinHashLSH.committedIncrementalDedup(
          MinHashLSH.bands(docs.where(col("doc_id") % 10 === 5),
            "doc_id", col("w"), 4), "doc_id", idxDir, vDir, 1L)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        def nFiles = fs.listStatus(new org.apache.hadoop.fs.Path(idxDir))
          .count(_.getPath.getName.endsWith(".parquet"))
        val before = nFiles
        graft.sources.Sinks.compact(s, idxDir)
        val after = nFiles
        val replayProbe = docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val novelProbe = docs.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", (0 to 7).map(i =>
              concat(lit("u"), col("doc_id"), lit(s"x$i"))): _*).as("text"))
        val probe = withWords(replayProbe.unionByName(novelProbe))
        MinHashLSH.incrementalDedup(
          MinHashLSH.bands(probe, "doc_id", col("w"), 4),
          "doc_id", idxDir, appendAdmitted = false)
          .withColumn("compacted", lit(after < before))
      },
      Some(duckCompactionOracle)),

    // ---- Generational compaction for the BUCKETED layout (d19): d15
    // compacts the flat index, but the bucketed stores (d16's index,
    // s16's IVF cells, d18's band store) accumulate one gen=<batchId>
    // dir per micro-batch — and there the gen dir IS the replay
    // marker, so folding it away naively would let a replayed batch
    // re-ingest. `Sinks.compactGenerations` records the folded ids in
    // the sibling __committed manifest BEFORE the swap (every manifest
    // id is already committed, so a crash after the manifest write
    // over-skips nothing; the reverse order would double-ingest), then
    // folds all generations into one gen=-1 preserving the hb
    // partition layout (one file per bucket) with compact's
    // rename-aside recovery. The gate drives d15's exact dataflow
    // through the bucketed faces — backfill → two committed batches →
    // compactGenerations → probe — and its `compacted` column also
    // asserts the gen count collapsed to 1 AND that a driven replay of
    // a FOLDED batchId is a pure skip through the manifest tier (the
    // layout marker rides through as a sibling). Shared oracle with
    // d15: compaction and layout can never change verdicts.
    Q("d19_bucketed_compaction",
      (s, d) => {
        import graft.operators.MinHashLSH
        val docs = withWords(Tables.documents(s, d)).select("doc_id", "text", "w")
        val idxDir = Scratch.dir("graft_d19_").resolve("bands").toString
        MinHashLSH.buildBucketedIndex(
          MinHashLSH.bands(docs.where(col("doc_id") % 5 =!= 0),
            "doc_id", col("w"), 4), idxDir)
        MinHashLSH.incrementalDedupBucketed(
          MinHashLSH.bands(docs.where(col("doc_id") % 10 === 0),
            "doc_id", col("w"), 4), "doc_id", idxDir, batchId = 0L)
        MinHashLSH.incrementalDedupBucketed(
          MinHashLSH.bands(docs.where(col("doc_id") % 10 === 5),
            "doc_id", col("w"), 4), "doc_id", idxDir, batchId = 1L)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        def nGens = fs.listStatus(new org.apache.hadoop.fs.Path(idxDir))
          .count(_.getPath.getName.startsWith("gen="))
        val before = nGens // gen=-1 + two batch gens
        graft.sources.Sinks.compactGenerations(s, idxDir, Some("hb"))
        val after = nGens
        // replay of a FOLDED batch id: only the manifest tier can skip
        // it now (its gen dir is gone) — a re-append would double the
        // admitted bands and flip the replayed-text probes
        val replayed = graft.sources.Sinks.committedPartitionedAppend(
          MinHashLSH.withHashBucket(
            MinHashLSH.bands(docs.where(col("doc_id") % 10 === 0),
              "doc_id", col("w"), 4)
              .select(col("doc_id"), col("band"), col("h"))),
          idxDir, 0L, "hb")
        val replayProbe = docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        val novelProbe = docs.where(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat_ws(" ", (0 to 7).map(i =>
              concat(lit("u"), col("doc_id"), lit(s"x$i"))): _*).as("text"))
        MinHashLSH.incrementalDedupBucketed(
          MinHashLSH.bands(withWords(replayProbe.unionByName(novelProbe)),
            "doc_id", col("w"), 4),
          "doc_id", idxDir, batchId = 99L, appendAdmitted = false)
          .withColumn("compacted",
            lit(before == 3 && after == 1 && !replayed))
      },
      Some(duckCompactionOracle)),

    // ---- Candidate verification: exact n-gram Jaccard on LSH pairs only.
    Q("d3_lsh_jaccard",
      (s, d) => {
        val cand = MinHashLSH.candidatePairs(
          withWords(Tables.documents(s, d)), "doc_id", col("w"))
        val sh = withShingles(Tables.documents(s, d)).select(col("doc_id"), col("sh"))
        cand
          .join(sh.toDF("ia", "sha"), "ia")
          .join(sh.toDF("ib", "shb"), "ib")
          .select(col("ia"), col("ib"),
            round(size(array_intersect(col("sha"), col("shb"))).cast("double") /
              size(array_union(col("sha"), col("shb"))), 6).as("jaccard"))
      },
      Some(s"""$duckBands,
              cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                       FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
                       WHERE a.doc_id < b.doc_id)
              SELECT ia, ib,
                round(cast(len(list_intersect(sa.sh, sb.sh)) as double) /
                      len(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
              FROM cand JOIN sh sa ON cand.ia = sa.doc_id
                        JOIN sh sb ON cand.ib = sb.doc_id""")),

    // ---- TRAIN/TEST near-dup LEAKAGE report (the eval-hygiene pass
    // GPT-3/Pile-style papers publish): LSH candidate pairs joined to
    // the o12 content-hash split assignment; a pair whose ends sit in
    // DIFFERENT splits is evaluation leakage the content-hash rule
    // cannot catch (exact dups share a split by construction — only
    // NEAR-dups straddle). Output: straddling pair counts per
    // (ordered) split pair. The pair side reuses d2's bucket-capped
    // machinery; the split join is one broadcast-able id→split map.
    Q("d14_split_leakage",
      (s, d) => {
        val docs = withWords(Tables.documents(s, d))
        val splits = Tables.documents(s, d)
          .select(col("doc_id"), ContentSplits.splitCol(col("text")).as("split"))
        MinHashLSH.candidatePairs(docs, "doc_id", col("w"))
          .join(splits.toDF("ia", "split_a"), "ia")
          .join(splits.toDF("ib", "split_b"), "ib")
          .where(col("split_a") =!= col("split_b"))
          .select(least(col("split_a"), col("split_b")).as("split_lo"),
            greatest(col("split_a"), col("split_b")).as("split_hi"))
          .groupBy("split_lo", "split_hi")
          .agg(count(lit(1)).as("n_leaking_pairs"))
      },
      Some(s"""$duckBands,
              cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                       FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h
                       WHERE a.doc_id < b.doc_id),
              sp AS (SELECT doc_id, ${ContentSplits.duckSplit("text")} AS split
                     FROM documents)
              SELECT least(sa.split, sb.split) AS split_lo,
                     greatest(sa.split, sb.split) AS split_hi,
                     count(*) AS n_leaking_pairs
              FROM cand JOIN sp sa ON cand.ia = sa.doc_id
                        JOIN sp sb ON cand.ib = sb.doc_id
              WHERE sa.split <> sb.split
              GROUP BY 1, 2""")),

    // ---- SimHash (32-bit, token-multiset weighted): per-row, no
    // shuffle at all. Computed by the native codegen'd
    // `simhash_md5` expression (functions.SimHashMd5) — one digest per
    // token, all 32 bit-votes in one pass over raw bytes; bit-identical
    // to the interpreted higher-order-lambda SQL formulation
    // (SimHashMd5Spec pins the equivalence, tools.SimhashProbe the
    // speedup). Same fingerprint family as TextFunctions.simhash64
    // truncated to the md5-low-32 path.
    Q("d4_simhash",
      (s, d) => {
        graft.GraftExtensions.registerNative(s)
        withWords(Tables.documents(s, d))
          .select(col("doc_id"), expr("simhash_md5(w)").as("simhash"))
      },
      Some("""WITH tok AS (SELECT doc_id,
                CAST(('0x' || substr(md5(t), 25, 8)) AS BIGINT) AS h
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
              bits AS (SELECT doc_id, b,
                CASE WHEN sum(((h >> b) & 1) * 2 - 1) > 0
                     THEN (CAST(1 AS BIGINT) << b) ELSE 0 END AS v
                FROM tok CROSS JOIN (SELECT unnest(range(32)) AS b) GROUP BY doc_id, b)
              SELECT doc_id, CAST(sum(v) AS BIGINT) AS simhash
              FROM bits GROUP BY doc_id""")),

    // ---- Winnowing fingerprints (Schleimer et al. — the rolling-hash
    // document fingerprint): hash every 5-char k-gram (same md5-low-32
    // idiom as d4), slide a 4-hash window, keep each window's minimum,
    // dedupe. Pure per-row higher-order folds — zero shuffle; the
    // fingerprint SET is what a plagiarism/near-dup index would key on.
    Q("d7_winnowing",
      (s, d) => {
        graft.GraftExtensions.registerNative(s)
        Tables.documents(s, d)
          .withColumn("fp", expr("winnow_fp(text)"))
      }
        .select(col("doc_id"),
          size(col("fp")).cast("bigint").as("n_fingerprints"),
          expr("array_min(fp)").as("fp_min"),
          expr("array_max(fp)").as("fp_max")),
      Some("""WITH g AS (SELECT doc_id,
                CASE WHEN length(text) < 5 THEN []::BIGINT[]
                     ELSE list_transform(range(0, length(text) - 4),
                       i -> CAST(('0x' || substr(md5(substr(text, i + 1, 5)), 25, 8))
                                 AS BIGINT)) END AS h
              FROM documents),
              w AS (SELECT doc_id,
                CASE WHEN len(h) < 4 THEN list_distinct(h)
                     ELSE list_distinct(list_transform(range(0, len(h) - 3),
                       i -> list_aggregate(h[i + 1:i + 4], 'min'))) END AS fp
              FROM g)
              SELECT doc_id, cast(len(fp) as bigint) AS n_fingerprints,
                list_aggregate(fp, 'min') AS fp_min,
                list_aggregate(fp, 'max') AS fp_max
              FROM w""")),

    // ---- Benchmark decontamination (the training-data hygiene pass):
    // a document is contaminated when ANY of its 5-gram shingles
    // appears in the benchmark shingle set. Benchmark = an 80-char
    // snippet of every 50th document (the held-out-eval stand-in); its
    // shingle set is tiny → broadcast left-semi join, corpus side is
    // one explode + probe, no corpus shuffle.
    Q("d8_decontaminate",
      (s, d) => {
        graft.GraftExtensions.registerNative(s)
        val docs = withWords(Tables.documents(s, d))
        val grams5 = expr("word_ngrams(w, 5)")
        val bench = docs.where(col("doc_id") % 50 === 0)
          .withColumn("bw", expr("slice(w, 20, 12)"))
          .select(explode(expr("word_ngrams(bw, 5)")).as("g")).distinct()
        val hits = docs.select(col("doc_id"), explode(grams5).as("g"))
          .join(broadcast(bench), Seq("g"), "left_semi")
          .select("doc_id").distinct()
        docs.select("doc_id")
          .join(hits.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
          .select(col("doc_id"), coalesce(col("contaminated"), lit(false)).as("contaminated"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              bw AS (SELECT doc_id, w[20:31] AS bw FROM w WHERE doc_id % 50 = 0),
              bench AS (SELECT DISTINCT unnest(list_transform(range(1, len(bw) - 3),
                          i -> bw[i] || ' ' || bw[i+1] || ' ' || bw[i+2] || ' ' ||
                               bw[i+3] || ' ' || bw[i+4])) AS g
                        FROM bw),
              grams AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                               w[i+3] || ' ' || w[i+4])) AS g
                        FROM w WHERE len(w) >= 5),
              hits AS (SELECT DISTINCT doc_id FROM grams
                       WHERE g IN (SELECT g FROM bench))
              SELECT w.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
              FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id""")),

    // ---- Bloom-filtered decontamination (the 100 TB shape of d8): the
    // benchmark shingle set is folded into a Bloom filter
    // (DataFrameStatFunctions.bloomFilter — Spark's own sketch, the
    // structure its runtime row-group filters broadcast), the corpus
    // pays ONE stateless scan probing the broadcast sketch per doc (no
    // shuffle, no explode for the clean majority), and only the
    // candidate survivors explode into the EXACT broadcast semi-join.
    // False positives therefore cost a little verify work, never a
    // wrong row — the final output is exact and shares d8's oracle.
    Q("d11_bloom_decontaminate",
      (s, d) => {
        graft.GraftExtensions.registerNative(s)
        val docs = withWords(Tables.documents(s, d))
        val bench = docs.where(col("doc_id") % 50 === 0)
          .withColumn("bw", expr("slice(w, 20, 12)"))
          .select(explode(expr("word_ngrams(bw, 5)")).as("g")).distinct()
        val bloom = bench.stat.bloomFilter("g", 10000, 0.01)
        val bb = s.sparkContext.broadcast(bloom)
        val mightHit = udf { gs: Seq[String] =>
          gs != null && gs.exists(bb.value.mightContain) }
        val cand = docs
          .select(col("doc_id"), expr("word_ngrams(w, 5)").as("gs"))
          .where(mightHit(col("gs")))
        val hits = cand.select(col("doc_id"), explode(col("gs")).as("g"))
          .join(broadcast(bench), Seq("g"), "left_semi")
          .select("doc_id").distinct()
        docs.select("doc_id")
          .join(hits.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("contaminated"), lit(false)).as("contaminated"))
      },
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              bw AS (SELECT doc_id, w[20:31] AS bw FROM w WHERE doc_id % 50 = 0),
              bench AS (SELECT DISTINCT unnest(list_transform(range(1, len(bw) - 3),
                          i -> bw[i] || ' ' || bw[i+1] || ' ' || bw[i+2] || ' ' ||
                               bw[i+3] || ' ' || bw[i+4])) AS g
                        FROM bw),
              grams AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 3),
                          i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                               w[i+3] || ' ' || w[i+4])) AS g
                        FROM w WHERE len(w) >= 5),
              hits AS (SELECT DISTINCT doc_id FROM grams
                       WHERE g IN (SELECT g FROM bench))
              SELECT w.doc_id, (hits.doc_id IS NOT NULL) AS contaminated
              FROM w LEFT JOIN hits ON w.doc_id = hits.doc_id""")),

    // ---- Embedding-cosine near-dup, LSH-blocked: candidate pairs come
    // from hyperplane-bucket equality; the exact cosine verify runs per
    // bucket — all-pairs never materializes. Norms are precomputed once
    // per vector (not per pair). Buckets above the cap bypass the
    // one-row-per-bucket collect and run as an AQE-splittable equi-join
    // (VectorOps.neardupPairs).
    Q("d5_embedding_neardup",
      (s, d) => {
        val e = VectorOps.vecs(Tables.embeddings(s, d))
          .withColumn("bucket", VectorOps.bucket)
        // prefilter margin 0.29; the EXACT cut is on the rounded value
        VectorOps.neardupPairs(e, minCos = 0.29)
          .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
          .where(col("cos") > 0.3)
      },
      Some(s"""WITH e AS (SELECT vec_id, v, nn, ${VectorOps.duckBucket} AS bucket
                        FROM (${VectorOps.duckVecs})),
              p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                round(list_aggregate(list_transform(range(1, len(a.v) + 1),
                        i -> a.v[i] * b.v[i]), 'sum') / (sqrt(a.nn) * sqrt(b.nn)), 6) AS cos
                FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
              SELECT ia, ib, cos FROM p WHERE cos > 0.3""")),

    // ---- EMBEDDING keep-list (d20): completes the keep-first dedup
    // product across all three modalities — text (d6, minhash
    // buckets), images (m14, hamming pairs), and now embeddings (d5's
    // verified cosine pairs closed into connected components). Same
    // scale argument as m14: pairs are output-quadratic in duplicate
    // density, one-row-per-vector with a transitive representative is
    // the product shape; the fixpoint loops only over pair-graph
    // members (explicit edges), singletons map to themselves in one
    // left join, so the loop's working set tracks the duplicate graph,
    // never the corpus. Oracle: independent recursive closure over the
    // restated exact pair set.
    Q("d20_embedding_keeplist",
      (s, d) => {
        val e = VectorOps.vecs(Tables.embeddings(s, d))
          .withColumn("bucket", VectorOps.bucket)
        val pairs = VectorOps.neardupPairs(e, minCos = 0.29)
          .select(col("ia"), col("ib"), round(col("cos"), 6).as("cos"))
          .where(col("cos") > 0.3)
        val pairKey = concat(col("ia"), lit("_"), col("ib"))
        // one pass over the verified-pair join (round-16): the old
        // union-of-selects re-executed the cosine pair join per branch;
        // explode emits both endpoints from a single scan — identical
        // row multiset into the order-free closure
        val edges = pairs.select(
          explode(array(col("ia"), col("ib"))).as("vec_id"),
          lit(0).as("band"), pairKey.as("h"))
        val closed = MinHashLSH.convergeKeepList(edges, "vec_id")
        e.select("vec_id").join(closed, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("keep_id"), col("vec_id")).as("keep_id"))
      },
      Some(s"""WITH RECURSIVE
              e AS (SELECT vec_id, v, nn, ${VectorOps.duckBucket} AS bucket
                    FROM (${VectorOps.duckVecs})),
              p AS (SELECT a.vec_id AS ia, b.vec_id AS ib
                FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
                WHERE round(list_aggregate(list_transform(range(1, len(a.v) + 1),
                        i -> a.v[i] * b.v[i]), 'sum') / (sqrt(a.nn) * sqrt(b.nn)), 6)
                      > 0.3),
              sym AS (SELECT ia AS src, ib AS dst FROM p
                      UNION ALL SELECT ib, ia FROM p),
              reach(vec_id, r) AS (
                SELECT vec_id, vec_id FROM e
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.vec_id)
              SELECT vec_id, min(r) AS keep_id FROM reach GROUP BY vec_id""")),

    // ---- DECREMENTAL keep-list (d21): the DELETE path of dedup state
    // (takedown/GDPR removals) — the operation that makes the persisted
    // keep-list a full CRUD store. KeepListStore.deleteDocs drops the
    // docs' band rows (generational rewrite; the manifest keeps their
    // replayed batches as pure skips — deleting data does not un-commit
    // its batch) and re-solves ONLY the affected components from their
    // survivors' remaining buckets. The topology forces the case a
    // remap-only scheme gets wrong: deleting doc_id % 7 = 0 removes
    // mid-chain BRIDGES, so components must SPLIT (and deleted reps
    // force re-election of the next minimum). The affected subgraph is
    // provably closed — a survivor bucket-sharing with an outside doc
    // would already share its component — so untouched components can
    // never be merged into or stolen from. Oracle: recursive closure
    // over the SURVIVING docs only, edges requiring both endpoints to
    // survive.
    Q("d21_keeplist_delete",
      (s, d) => {
        import graft.operators.KeepListStore
        val ids = Tables.documents(s, d).select("doc_id")
        val dir = Scratch.dir("graft_d21_").resolve("kl").toString
        KeepListStore.backfill(chainBands(ids), "doc_id", dir)
        KeepListStore.deleteDocs(
          ids.where(col("doc_id") % 7 === 0), "doc_id", dir)
        KeepListStore.read(s, dir, "doc_id")
      },
      Some("""WITH RECURSIVE
              docs AS (SELECT doc_id FROM documents WHERE doc_id % 7 <> 0),
              edges AS (SELECT a.doc_id AS src, b.doc_id AS dst
                        FROM docs a JOIN docs b
                          ON b.doc_id = a.doc_id + 1 AND b.doc_id % 8 <> 0),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM docs
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id)
              SELECT doc_id, min(r) AS keep_id FROM reach GROUP BY doc_id""")),

    // ---- FINGERPRINT-INDEX delete (d22): the takedown path for the
    // dedup serving index — forgetting content means future landings of
    // the same text must be ADMITTED again, and that is exactly what
    // this gate proves. The bucketed index backfills from the corpus
    // (doc_id % 5 != 0), then doc_id % 3 = 0 is taken down via the same
    // generalized rewrite as d21/s17 (Sinks.rewriteGenerations: fold +
    // filter in one swap, manifest keeps folded batch ids as replay
    // skips, hb layout preserved so probes still prune). The probe
    // replays EVERY doc's text under fresh ids: texts whose only corpus
    // holder was deleted flip to admitted, texts still held keep
    // dup_of_corpus — the oracle restates verdicts against the
    // SURVIVING corpus only.
    Q("d22_index_delete",
      (s, d) => {
        import graft.operators.MinHashLSH
        val docs = withWords(Tables.documents(s, d)).select("doc_id", "text", "w")
        val idxDir = Scratch.dir("graft_d22_").resolve("bands").toString
        MinHashLSH.buildBucketedIndex(
          MinHashLSH.bands(docs.where(col("doc_id") % 5 =!= 0),
            "doc_id", col("w"), 4), idxDir)
        graft.sources.Sinks.rewriteGenerations(s, idxDir, Some("hb"),
          df => df.where(col("doc_id") % 3 =!= 0))
        val probe = docs.where(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
        MinHashLSH.incrementalDedupBucketed(
          MinHashLSH.bands(withWords(probe), "doc_id", col("w"), 4),
          "doc_id", idxDir, batchId = 0L, appendAdmitted = false)
      },
      Some(s"""$duckBands,
              corpus AS (SELECT * FROM bands
                         WHERE doc_id % 5 <> 0 AND doc_id % 3 <> 0
                           AND h IS NOT NULL),
              probe_docs AS (SELECT doc_id + 1000000 AS doc_id, text
                             FROM documents WHERE doc_id % 7 = 0),
              ${duckBandsChain("probe_docs", "p")},
              pb AS (SELECT * FROM pbands WHERE h IS NOT NULL),
              hcp AS (SELECT DISTINCT x.doc_id FROM pb x
                      JOIN corpus c ON x.band = c.band AND x.h = c.h),
              hbp AS (SELECT DISTINCT x.doc_id FROM pb x
                      JOIN pb y ON x.band = y.band AND x.h = y.h
                       AND y.doc_id < x.doc_id)
              SELECT i.doc_id,
                (hcp.doc_id IS NOT NULL) AS dup_of_corpus,
                (hbp.doc_id IS NOT NULL) AS dup_in_batch,
                (hcp.doc_id IS NULL AND hbp.doc_id IS NULL) AS admitted
              FROM (SELECT DISTINCT doc_id FROM pb) i
              LEFT JOIN hcp ON i.doc_id = hcp.doc_id
              LEFT JOIN hbp ON i.doc_id = hbp.doc_id""")),

    // ---- EXACT-SUBSTRING duplicate spans (the Lee et al. training-data
    // dedup class, k-gram-anchored): a character position is duplicated
    // when its 32-char gram occurs in MORE THAN ONE document; per doc we
    // count duplicated positions (the spans an ExactSubstr pass would
    // trim). The full suffix-array build is replaced by the k-gram
    // anchor join — one explode + one gram-key agg + one broadcast-able
    // semi-join back; at 100 TB the gram key shuffles hashed, and
    // positions stay doc-local so the trim itself is a per-row map.
    Q("d12_exact_substring_spans",
      (s, d) => {
        graft.GraftExtensions.registerNative(s)
        val k = 32
        val docs = Tables.documents(s, d)
        val grams = docs.where(length(col("text")) >= k)
          .select(col("doc_id"),
            posexplode(expr(s"char_ngrams(text, $k)")).as(Seq("pos", "g")))
        val dup = grams.groupBy("g")
          .agg(countDistinct("doc_id").as("nd"))
          .where(col("nd") > 1)
          .select("g")
        grams.join(dup, Seq("g"), "left_semi")
          .groupBy("doc_id").agg(count(lit(1)).as("n_dup_positions"))
          .join(docs.select(col("doc_id"),
            greatest(length(col("text")) - (k - 1), lit(0)).cast("bigint")
              .as("n_positions")), Seq("doc_id"), "right")
          .select(col("doc_id"),
            coalesce(col("n_dup_positions"), lit(0L)).as("n_dup_positions"),
            col("n_positions"))
      },
      Some("""WITH g AS (SELECT doc_id, unnest(list_transform(
                  range(1, length(text) - 30), i -> substr(text, i, 32))) AS g
              FROM documents WHERE length(text) >= 32),
              dup AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS nd
                      FROM g GROUP BY 1) WHERE nd > 1),
              per AS (SELECT doc_id, count(*) AS ndp FROM g
                      WHERE g IN (SELECT g FROM dup) GROUP BY 1)
              SELECT d.doc_id,
                cast(coalesce(per.ndp, 0) as bigint) AS n_dup_positions,
                cast(greatest(length(d.text) - 31, 0) as bigint) AS n_positions
              FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id""")),

    // ---- Duplicate-LINE removal (the CCNet/boilerplate pass): a line
    // appearing in more than `maxDf` documents is boilerplate (headers,
    // footers, nav chrome) and is struck from every document; the doc
    // reassembles from its surviving lines in order. The corpus pays
    // one explode + one line-key agg + one regroup — three shuffles on
    // line/doc keys, no pairwise work. The synthesized prose plants a
    // corpus-wide duplicate line ("Erster Satz") plus per-doc unique
    // lines, so the strike is provably non-trivial.
    Q("d9_line_dedup",
      (s, d) => {
        val maxDf = 3L
        val lines = Tables.documents(s, d)
          .withColumn("body", expr(
            "concat('Erster Satz', '. ', substr(text, 1, 40), '. Doc ', doc_id, ' Ende')"))
          .select(col("doc_id"),
            posexplode(split(col("body"), "\\. ")).as(Seq("idx", "line")))
        val df = lines.groupBy("line")
          .agg(countDistinct("doc_id").as("line_df"))
        lines.join(df, "line")
          .groupBy("doc_id")
          .agg(
            sum(when(col("line_df") <= maxDf, 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("line_df") > maxDf, 1L).otherwise(0L)).as("n_dropped"),
            array_join(expr(
              s"transform(array_sort(collect_list(CASE WHEN line_df <= $maxDf" +
                " THEN struct(idx, line) END)), x -> x.line)"), ". ")
              .as("rebuilt"))
      },
      Some("""WITH l AS (SELECT doc_id, unnest(ls) AS line,
                generate_subscripts(ls, 1) AS idx
              FROM (SELECT doc_id, string_split(
                'Erster Satz' || '. ' || substr(text, 1, 40) || '. Doc ' || doc_id || ' Ende',
                '. ') AS ls FROM documents)),
              f AS (SELECT line, count(DISTINCT doc_id) AS line_df FROM l GROUP BY 1)
              SELECT doc_id,
                cast(sum(CASE WHEN line_df <= 3 THEN 1 ELSE 0 END) as bigint) AS n_kept,
                cast(sum(CASE WHEN line_df > 3 THEN 1 ELSE 0 END) as bigint) AS n_dropped,
                string_agg(CASE WHEN line_df <= 3 THEN line END, '. ' ORDER BY idx) AS rebuilt
              FROM l JOIN f USING (line) GROUP BY doc_id""")),

    // ---- EXACT set-similarity join (prefix filtering / AllPairs):
    // the LSH-free third member of the near-dup family — d2 is
    // probabilistic candidates, d24 is the EXACT all-pairs result at
    // Jaccard ≥ 0.8 with lossless prefix-filter pruning (rarest-first
    // global token order keeps hot tokens out of the join key — see
    // SetSimJoin's scale notes). The oracle is the INDEPENDENT brute-
    // force token self-join with no prefix filter, so any lost pair
    // (an unsound prefix, a broken length bound) fails the hash, and
    // all threshold math is integer cross-multiplication on both
    // sides.
    Q("d24_setsim_join",
      (s, d) => graft.operators.SetSimJoin.jaccardJoin(
        withWords(Tables.documents(s, d)), "doc_id", col("w"), 4, 5),
      Some("""WITH t AS (SELECT doc_id,
                unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents),
              sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
              ov AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                       count(*) AS inter_sz
                     FROM t a JOIN t b
                       ON a.tok = b.tok AND a.doc_id < b.doc_id
                     GROUP BY 1, 2)
              SELECT ia, ib, inter_sz,
                sa.n + sb.n - inter_sz AS union_sz,
                inter_sz / (sa.n + sb.n - inter_sz) AS jaccard
              FROM ov
              JOIN sz sa ON sa.doc_id = ia
              JOIN sz sb ON sb.doc_id = ib
              WHERE 5 * inter_sz >= 4 * (sa.n + sb.n - inter_sz)""")),

    // ---- EMBEDDING decontamination (d28): the third decontamination
    // modality (n-gram equi-join d8, bloom prefilter d11, and now
    // semantic) — a corpus vector is contaminated iff its cosine with
    // ANY held-out eval vector clears the threshold. The eval set is
    // benchmarks, i.e. TINY at any corpus scale, so the plan is the
    // real production shape: eval broadcast to every executor, one
    // map-only corpus scan with the codegen'd cosine, no shuffle of
    // the corpus at all (the distinct + left join run on hit ids).
    // Threshold compares the ROUNDED cosine (d5's discipline).
    Q("d28_embedding_decontaminate",
      (s, d) => {
        graft.GraftExtensions.registerNative(s)
        val e = VectorOps.vecs(Tables.embeddings(s, d))
        val eval_ = e.where(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("eval_id"),
            col("v").as("qv"), col("nn").as("qn"))
        val corpus = e.where(col("vec_id") % 50 =!= 0)
        val hits = corpus.crossJoin(broadcast(eval_))
          .select(col("vec_id"),
            round(expr("cosine_sim(qv, v, qn, nn)"), 6).as("cos"))
          .where(col("cos") > 0.3)
          .select("vec_id").distinct()
        corpus.select("vec_id")
          .join(hits.withColumn("contaminated", lit(true)), Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("contaminated"), lit(false)).as("contaminated"))
      },
      Some(s"""WITH e AS (${VectorOps.duckVecs}),
              ev AS (SELECT vec_id AS eval_id, v AS qv, nn AS qn
                     FROM e WHERE vec_id % 50 = 0),
              c AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
              hits AS (SELECT DISTINCT c.vec_id FROM c CROSS JOIN ev
                       WHERE round(list_aggregate(list_transform(
                           range(1, len(c.v) + 1), i -> qv[i] * c.v[i]), 'sum')
                           / (sqrt(qn) * sqrt(c.nn)), 6) > 0.3)
              SELECT c.vec_id, (h.vec_id IS NOT NULL) AS contaminated
              FROM c LEFT JOIN hits h ON c.vec_id = h.vec_id""")),

    // ---- Asymmetric CONTAINMENT join (d27): |a∩b| ≥ τ·|a| — the
    // quote/excerpt/subset detector jaccardJoin structurally misses
    // (a short doc fully embedded in a long one never reaches a
    // symmetric threshold). Probe-side-only prefix pruning, length and
    // positional bounds, interned ids, native merge verify — see
    // SetSimJoin.containmentJoin. Oracle = independent brute-force
    // directed token self-join with no pruning.
    Q("d27_containment_join",
      (s, d) => graft.operators.SetSimJoin.containmentJoin(
        withWords(Tables.documents(s, d)), "doc_id", col("w"), 19, 20),
      Some("""WITH t AS (SELECT doc_id,
                unnest(list_distinct(string_split(text, ' '))) AS tok
              FROM documents),
              sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
              ov AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                       count(*) AS inter_sz
                     FROM t a JOIN t b
                       ON a.tok = b.tok AND a.doc_id <> b.doc_id
                     GROUP BY 1, 2)
              SELECT ia, ib, inter_sz, sa.n AS na, sb.n AS nb,
                inter_sz / sa.n AS containment
              FROM ov
              JOIN sz sa ON sa.doc_id = ia
              JOIN sz sb ON sb.doc_id = ib
              WHERE 20 * inter_sz >= 19 * sa.n""")),

    // ---- Containment join on a REALISTIC Zipfian vocabulary (d30):
    // d27 measures the b-side suffix bound on the adversarial 31-token
    // corpus — the worst case, where every posting is hot. This gate
    // runs the SAME operator over the documents' word-TRIGRAM sets
    // (16k+ distinct shingles at sf0.01, df max 7 / median 1 — the
    // long-tailed distribution a real corpus has), where the bound's
    // claimed real-world win applies: shingles absent from every probe
    // prefix drop out of the b side entirely via the minNa semi-join.
    // The pruning fraction is PINNED in tools.SetSimProbe's `zipf`
    // mode (PERF.md row); the oracle is the unchanged brute-force
    // directed self-join, restated over trigrams (the duckBandsChain
    // shingle expression — the established word_ngrams(w,3) dual).
    Q("d30_containment_zipf",
      (s, d) => graft.operators.SetSimJoin.containmentJoin(
        withShingles(Tables.documents(s, d)), "doc_id", col("sh"), 19, 20),
      Some("""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
                FROM documents),
              sh AS (SELECT doc_id,
                       list_distinct(list_transform(range(1, len(w) - 1),
                         i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
                     FROM w),
              t AS (SELECT doc_id, unnest(g) AS tok FROM sh),
              sz AS (SELECT doc_id, count(*) AS n FROM t GROUP BY 1),
              ov AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
                       count(*) AS inter_sz
                     FROM t a JOIN t b
                       ON a.tok = b.tok AND a.doc_id <> b.doc_id
                     GROUP BY 1, 2)
              SELECT ia, ib, inter_sz, sa.n AS na, sb.n AS nb,
                inter_sz / sa.n AS containment
              FROM ov
              JOIN sz sa ON sa.doc_id = ia
              JOIN sz sb ON sb.doc_id = ib
              WHERE 20 * inter_sz >= 19 * sa.n""")),

    // ---- KEEP-BEST representative selection: real pipelines keep the
    // highest-QUALITY member of each duplicate cluster, not the
    // smallest id — d26 composes the d6 keep-list (connected
    // components of the band graph) with a per-component argmax on
    // (n_chars, then smaller id as the tiebreak). The rep choice is
    // one partial-aggregable max_by groupBy — NO window sort over the
    // corpus — and the oracle recomputes the closure independently
    // (d6's recursive CTE) then takes the same argmax via row_number,
    // so a wrong component or a wrong tie-break both fail the hash.
    Q("d26_keep_best",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val kl = MinHashLSH.dedupKeepList(withWords(docs), "doc_id", col("w"))
        val reps = kl.join(docs.select("doc_id", "n_chars"), "doc_id")
          .groupBy("keep_id")
          .agg(max_by(col("doc_id"),
            struct(col("n_chars"), -col("doc_id"))).as("rep_id"))
        kl.join(reps, "keep_id").select(col("doc_id"), col("rep_id"))
      },
      Some(s"""${duckBands.replaceFirst("WITH", "WITH RECURSIVE")},
              edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                        FROM bands a JOIN bands b
                          ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id),
              sym AS (SELECT src, dst FROM edges
                      UNION ALL SELECT dst, src FROM edges),
              reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM (SELECT DISTINCT doc_id FROM bands)
                UNION
                SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.doc_id),
              comp AS (SELECT doc_id, min(r) AS root FROM reach GROUP BY doc_id),
              ranked AS (SELECT c.doc_id, c.root,
                           row_number() OVER (PARTITION BY c.root
                             ORDER BY d.n_chars DESC, c.doc_id) AS rn
                         FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
              best AS (SELECT root, doc_id AS rep_id FROM ranked WHERE rn = 1)
              SELECT c.doc_id, b.rep_id
              FROM comp c JOIN best b ON c.root = b.root""")),
  )
}
