package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, MapJoin}
import graft.sources.Tables

/** Relational operator pack over the TPC-H-ish tables — covers SURVEY §2
  * families: projections/filters (P*), joins (J1/J2/J6/J10/J12/J15),
  * aggregations (A1/A2/A4/A13), windows (W1-W3 + running/lag), set ops
  * (U1/U3/U5), sorts/limits/splits (O1/O5/O6), date scalars (F26).
  *
  * Scale notes per query are inline; the recurring ones:
  *  - dimension joins are `broadcast()` (region/nation/part are small
  *    even at 100 TB fact scale)
  *  - aggregate-before-join (MapJoin) keeps the shuffled child at ≤1 row
  *    per key
  *  - the as-of join is the union-sort rewrite: one shuffle, no pairwise
  *    blowup (see operators/AsOfJoin.scala)
  */
object RelationalQueries extends QueryPack {

  private def dec(c: Column, t: String = "decimal(12,2)"): Column = c.cast(t)

  /** DSIR model input: per-bucket (cr = pool count, ct = target-slice
    * count) over md5-hashed 4096 token buckets — ONE scan, and the
    * counts are ADDITIVE, which is what lets e29 maintain them as
    * streamed partials under the committed-generation protocol.
    */
  private[graft] def dsirCounts(docs: DataFrame): DataFrame =
    docs.select(col("lang"), explode(split(col("text"), " ")).as("token"))
      .select(col("lang"),
        pmod(expr("conv(substring(md5(token), 1, 8), 16, 10)")
          .cast("bigint"), lit(4096L)).as("b"))
      .groupBy("b")
      .agg(count(lit(1)).as("cr"),
        count(when(col("lang") === "de", 1)).as("ct"))

  /** DSIR scoring against a (b, cr, ct) counts relation (directly
    * computed by o15, merge-of-partials by e29 — one scorer, so the
    * incremental face can never drift from the direct one): per-bucket
    * log-likelihood-ratio model (fixed 4096 rows, broadcast at any
    * corpus size), decimal-exact per-doc accumulation, per-token
    * NORMALIZED weight — the raw llr sum is length-biased (long docs
    * accumulate the corpus-wide negative drift and never select);
    * normalizing doubles the target's enrichment in the top-50 (de 14%
    * base → 30% selected at sf0.01). Exact decimal sum first, one
    * double division last; top-50 via TakeOrderedAndProject.
    */
  private[graft] def dsirSelect(s: SparkSession, d: String,
                                  counts: DataFrame): DataFrame = {
    val docs = Tables.documents(s, d)
    dsirScore(docs, dsirModel(counts))
      .join(docs.select("doc_id", "lang"), "doc_id")
      .withColumn("weight",
        col("wsum").cast("double") / col("ntok").cast("double"))
      .orderBy(col("weight").desc, col("doc_id"))
      .limit(50)
      .select("doc_id", "lang", "weight")
  }

  /** The llr model relation from a (b, cr, ct) counts relation — fixed
    * ≤4096 rows, broadcast at any corpus size. Split out of
    * [[dsirSelect]] so the incremental tier (o18) scores against the
    * SAME model arithmetic the direct fit uses.
    */
  private[graft] def dsirModel(counts: DataFrame): DataFrame = {
    val n = counts.agg(sum("cr").as("nr"), sum("ct").as("nt"))
    counts.crossJoin(broadcast(n))
      .select(col("b"),
        (round(log((coalesce(col("ct"), lit(0L)) + 1).cast("double") /
          (col("nt") + 4096L).cast("double")), 6).cast("decimal(18,6)")
          - round(log((col("cr") + 1).cast("double") /
            (col("nr") + 4096L).cast("double")), 6).cast("decimal(18,6)"))
          .as("llr"))
  }

  /** Per-doc ADDITIVE score partials (doc_id, wsum DECIMAL, ntok)
    * against a broadcast model: one tokenize pass over exactly the
    * docs given — the incremental discipline's unit of work, and the
    * decimal wsum parquet-round-trips exactly, so a selection over
    * persisted per-batch partials is bit-identical to a monolithic
    * re-score through the same function.
    */
  private[graft] def dsirScore(docs: DataFrame, model: DataFrame): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"),
        pmod(expr("conv(substring(md5(token), 1, 8), 16, 10)")
          .cast("bigint"), lit(4096L)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("tf"))
    tf.join(broadcast(model), "b")
      .groupBy("doc_id")
      .agg(sum(col("llr") * col("tf").cast("decimal(10,0)")).as("wsum"),
        sum("tf").as("ntok"))
  }

  /** DSIR model STALENESS metric (the s15 discipline applied to the
    * selection tier): total-variation distance between a FROZEN model
    * snapshot's target-bucket distribution and the live accumulated
    * counts, with the refresh decision gated on a rational threshold.
    * A shifted target distribution would otherwise silently stale the
    * llr model — the committed partials keep ACCUMULATING correctly,
    * but a serving snapshot fit before the shift scores with the old
    * distribution until something notices (reference analog: the
    * re-runnable incremental batch contract,
    * `scrc/preprocessors/abstract_extractor.py:69-77` — state must
    * detect when a re-fit is due, not assume it).
    *
    * Arithmetic discipline (the SetSimJoin rule): the TV numerator is
    * an EXACT integer — Σ_b |ct_f·Nt_l − ct_l·Nt_f| as decimal(38,0)
    * cross-multiplications (no per-bucket division, no float sum) —
    * and `stale` is the exact cross-multiplied comparison
    * num·tauDen ≥ 2·Nt_f·Nt_l·tauNum. Only the REPORTED drift value
    * performs one terminal double division, so the decision and the
    * hash are bit-deterministic and engine-portable. Cost shape: the
    * inputs are bucket relations (≤4096 rows each at any corpus size),
    * so drift is a broadcast-sized full-outer join + one agg —
    * evaluating it per batch is free relative to any scoring run
    * (measured: tools.DsirRefreshProbe / PERF.md).
    *
    * ZERO-MASS convention (the terminal division is 0/0 when a side
    * has no target tokens, and NaN must never reach the decision):
    * both sides empty → drift 0.0 / fresh (nothing to compare, nothing
    * to refresh from); exactly one side empty → drift 1.0 / stale
    * (total variation between a distribution and no-mass is maximal —
    * a model frozen before the target language existed, or a live
    * store whose target mass vanished, must refresh).
    *
    * Returns one row: (drift DOUBLE, stale BOOLEAN).
    */
  private[graft] def dsirDrift(frozen: DataFrame, live: DataFrame,
                                 tauNum: Int, tauDen: Int): DataFrame = {
    val f = frozen.select(col("b"), col("ct").as("ctf"))
    val l = live.select(col("b"), col("ct").as("ctl"))
    val joined = f.join(l, Seq("b"), "full")
      .select(coalesce(col("ctf"), lit(0L)).as("ctf"),
        coalesce(col("ctl"), lit(0L)).as("ctl"))
    // totals first (one agg over ≤4096 rows), then the per-bucket
    // cross-multiplied deviations against the broadcast totals
    val n = joined.agg(sum(col("ctf")).as("ntf"), sum(col("ctl")).as("ntl"))
    joined.crossJoin(broadcast(n))
      .select(col("ntf"), col("ntl"),
        abs(col("ctf").cast("decimal(38,0)") * col("ntl") -
          col("ctl").cast("decimal(38,0)") * col("ntf")).as("d"))
      .groupBy("ntf", "ntl")
      .agg(sum(col("d")).cast("decimal(38,0)").as("num"))
      .select(
        when(col("ntf") === 0 && col("ntl") === 0, lit(0.0))
          .when(col("ntf") === 0 || col("ntl") === 0, lit(1.0))
          .otherwise(col("num").cast("double") /
            (col("ntf").cast("decimal(38,0)") * col("ntl") * 2).cast("double"))
          .as("drift"),
        when(col("ntf") === 0 && col("ntl") === 0, lit(false))
          .when(col("ntf") === 0 || col("ntl") === 0, lit(true))
          .otherwise(col("num") * tauDen >=
            col("ntf").cast("decimal(38,0)") * col("ntl") * (2 * tauNum))
          .as("stale"))
  }

  def all: Seq[Q] = Seq(

    // ---- K5/K6 write-path round-trips (k1/k2): the gzip-JSONL and
    // text-dropping CSV sinks exercised END-TO-END inside a gated
    // query — write to a fresh scratch dir, read back through the
    // standard readers, compare to the oracle's view of the same
    // source rows. Upgrades the export sinks from spec-only to
    // oracle-gated (the keyed/bucketed sinks stay spec-level — their
    // semantics are idempotence across RUNS, not a row transform).
    Q("k1_jsonl_roundtrip",
      (s, d) => {
        val out = Scratch.dir("graft_k1_").toString
        graft.sources.Sinks.writeJsonl(
          Tables.nation(s, d).select(col("n_nationkey"), col("n_name")), out)
        // reader-side registration: resolves .xz even when the write
        // happened in a DIFFERENT session/job (idempotent)
        graft.sources.XzCodec.register(s)
        s.read.json(out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"))
      },
      Some("SELECT n_nationkey, n_name FROM nation")),

    // ---- zstd JSONL round-trip (k16): the interchange format large
    // text corpora actually ship (`.jsonl.zst` shards — RedPajama/
    // SlimPajama/Pile layout). Hadoop's own ZStandardCodec needs
    // libhadoop (not loaded in pure-JVM deployments); sources.ZstdCodec
    // rides the zstd-jni binding Spark already bundles for parquet, so
    // the export works on any Spark image. Same write → fresh-reader
    // shape as k1.
    Q("k16_jsonl_zstd",
      (s, d) => {
        val out = Scratch.dir("graft_k16_").resolve("j").toString
        graft.sources.Sinks.writeJsonl(
          Tables.nation(s, d).select(col("n_nationkey"), col("n_name")),
          out, codec = "zstd")
        graft.sources.ZstdCodec.register(s)
        s.read.json(out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"))
      },
      Some("SELECT n_nationkey, n_name FROM nation")),

    Q("k2_csv_drops_text",
      (s, d) => {
        val out = Scratch.dir("graft_k2_").toString
        graft.sources.Sinks.writeCsv(
          Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
            col("n_regionkey")), out, dropTextCols = Seq("n_regionkey"))
        val back = s.read.option("header", "true").csv(out)
        back.select(col("n_nationkey").cast("bigint").as("n_nationkey"),
          col("n_name"),
          lit(back.columns.length).cast("bigint").as("n_cols"))
      },
      Some("SELECT n_nationkey, n_name, 2::BIGINT AS n_cols FROM nation")),

    // ---- ORC round-trip (k15): the second columnar format next to
    // parquet — an engine swap a downstream consumer may force. Write
    // sorted ORC (zlib), read back through the built-in reader with a
    // selective filter: ORC carries row-group min/max stats like
    // parquet, and the sorted layout makes them selective; the filter
    // must reach the scan as a pushed search argument (PlanShapeSpec
    // family assertion lives in the oracle equality here — a reader
    // bug or pushdown loss changes rows).
    Q("k15_orc_roundtrip",
      (s, d) => {
        val out = Scratch.dir("graft_k15_").resolve("orc").toString
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .sortWithinPartitions("o_orderkey")
          .write.option("compression", "zlib").orc(out)
        s.read.orc(out)
          .where(col("o_orderpriority") === "1-URGENT" &&
            col("o_totalprice") > lit(new java.math.BigDecimal("200000.00")))
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice").cast("double").as("o_totalprice"))
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice::DOUBLE AS o_totalprice
              FROM orders
              WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000.00""")),

    // ---- K7 labels-JSON round-trip (k3): writeLabels emits the
    // id2label/label2id file the dataset creators ship
    // (dataset_creator.py label maps); read back as JSON and exploded
    // to (id, label) rows against a literal oracle.
    Q("k3_labels_roundtrip",
      (s, d) => {
        val out = Scratch.dir("graft_k3_").toString
        graft.sources.Sinks.writeLabels(
          Seq("dismissal", "approval", "partial_approval"), out)
        s.read.option("multiLine", "true").json(s"$out/labels.json")
          .selectExpr("explode(map_entries(from_json(to_json(label2id), 'map<string,bigint>'))) AS e")
          .select(col("e.key").as("label"), col("e.value").cast("bigint").as("id"))
      },
      Some("""SELECT * FROM (VALUES
                ('dismissal', 0), ('approval', 1), ('partial_approval', 2)
              ) AS t(label, id)""")),

    // ---- K2/K3/K4 keyed-upsert round-trip (k4): the bucketed
    // delete-then-insert sink — the load-bearing primitive for 100 TB
    // incremental runs (abstract_preprocessor.py:202-244 bulk UPDATE;
    // section_splitter.py:140-174 delete+insert) — exercised
    // END-TO-END inside a gated query: write a base table, upsert an
    // overlapping delta TWICE (idempotency pinned under the oracle —
    // a re-run must not duplicate or drop rows), read back, and state
    // the merged rows. Oracle = delta value for delta keys, base value
    // otherwise, plus the brand-new key.
    Q("k4_upsert_roundtrip",
      (s, d) => {
        val out = Scratch.dir("graft_k4_")
          .resolve("t").toString
        val base = Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))
        graft.sources.Sinks.upsertBucketed(base, out, "n_nationkey", 8)
        // overlapping delta: region-1 nations get updated values, and
        // one key the base has never seen is inserted
        val delta = Tables.nation(s, d).where(col("n_regionkey") === 1)
          .select(col("n_nationkey"),
            concat(col("n_name"), lit("_V2")).as("n_name"))
          .unionByName(s.range(1).select(
            lit(99).cast("int").as("n_nationkey"),
            lit("ATLANTIS").as("n_name")))
        graft.sources.Sinks.upsertBucketed(delta, out, "n_nationkey", 8)
        graft.sources.Sinks.upsertBucketed(delta, out, "n_nationkey", 8)
        graft.sources.Sinks.readUpserted(s, out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey,
                     CASE WHEN n_regionkey = 1 THEN n_name || '_V2'
                          ELSE n_name END AS n_name
              FROM nation
              UNION ALL
              SELECT 99::BIGINT, 'ATLANTIS'""")),

    // ---- J12 high-watermark append sink (k5): appendNewKeys is the
    // reference's anti-join over already-processed rows (the
    // process-new-files-only path). Gate: seed with region-0 nations,
    // append ALL nations twice — only unseen keys may land, re-running
    // must not duplicate. Read back = exactly one row per nation.
    Q("k5_append_newkeys",
      (s, d) => {
        val out = Scratch.dir("graft_k5_")
          .resolve("t").toString
        val all = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        graft.sources.Sinks.appendNewKeys(
          Tables.nation(s, d).where(col("n_regionkey") === 0)
            .select(col("n_nationkey"), col("n_name")), out, "n_nationkey")
        graft.sources.Sinks.appendNewKeys(all, out, "n_nationkey")
        graft.sources.Sinks.appendNewKeys(all, out, "n_nationkey")
        s.read.parquet(out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"))
      },
      Some("SELECT n_nationkey::BIGINT AS n_nationkey, n_name FROM nation")),

    // ---- compaction round-trip (k6): the small-files maintenance pass
    // (incremental appends accumulate tiny files; compact() rewrites to
    // size-targeted files via temp-dir + atomic rename). Gate: write a
    // deliberately 16-way-fragmented table, compact to one file, read
    // back — rows and values must be untouched and the file count
    // provably dropped (stated as a column so the oracle checks it).
    Q("k6_compact_roundtrip",
      (s, d) => {
        val out = Scratch.dir("graft_k6_")
          .resolve("t").toString
        Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
          .repartition(16).write.parquet(out)
        val before = new java.io.File(out).listFiles()
          .count(_.getName.endsWith(".parquet"))
        graft.sources.Sinks.compact(s, out, targetFileBytes = 512L * 1024 * 1024)
        val after = new java.io.File(out).listFiles()
          .count(_.getName.endsWith(".parquet"))
        s.read.parquet(out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"),
            lit(before > after && after == 1).as("compacted"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
                     true AS compacted FROM nation""")),

    // ---- partitioned layout + pruning read (k7): writePartitioned is
    // the court/lang/year directory layout; the gate reads back ONE
    // partition through a partition-column predicate (pruned at
    // planning — PlanShapeSpec asserts the scan shape) and states the
    // surviving rows via the same predicate in the oracle.
    Q("k7_partitioned_read",
      (s, d) => {
        val out = Scratch.dir("graft_k7_")
          .resolve("t").toString
        graft.sources.Sinks.writePartitioned(
          Tables.nation(s, d).select(col("n_nationkey"), col("n_name"),
            col("n_regionkey")), out, "n_regionkey")
        s.read.parquet(out).where(col("n_regionkey") === 2)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"),
            col("n_regionkey").cast("bigint").as("n_regionkey"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
                     n_regionkey::BIGINT AS n_regionkey
              FROM nation WHERE n_regionkey = 2""")),

    // ---- PERMISSIVE ingest of damaged JSONL (x38): a landing file
    // where every 7th line is corrupt (truncated JSON) — the PERMISSIVE
    // reader captures damage in _corrupt_record instead of failing the
    // job or silently dropping rows; the gate states the good/quarantine
    // split exactly (the reference's log-and-skip ingest contract as
    // data).
    Q("x38_permissive_json",
      (s, d) => {
        val out = Scratch.dir("graft_x38_")
        val lines = (0 until 100).map { i =>
          if (i % 7 == 0) s"""{"id": $i, "v": "broken""" // truncated
          else s"""{"id": $i, "v": "ok$i"}"""
        }
        java.nio.file.Files.write(out.resolve("part.jsonl"),
          String.join("\n", lines: _*).getBytes("UTF-8"))
        val schema = "id BIGINT, v STRING, _corrupt_record STRING"
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .json(out.toString).cache() // corrupt-record column needs the cache (SPARK-21610)
        parsed.agg(
          sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(col("_corrupt_record").isNull, col("id"))).as("sum_good_ids"))
      },
      Some("""SELECT cast(sum(CASE WHEN i % 7 <> 0 THEN 1 ELSE 0 END) as bigint) AS n_good,
                     cast(sum(CASE WHEN i % 7 = 0 THEN 1 ELSE 0 END) as bigint) AS n_corrupt,
                     cast(sum(CASE WHEN i % 7 <> 0 THEN i END) as bigint) AS sum_good_ids
              FROM (SELECT unnest(range(100)) AS i)""")),

    // ---- SCHEMA EVOLUTION read (u7): a table whose later files carry
    // an ADDED column (the lake reality — writers upgrade, history
    // doesn't), read back with mergeSchema: old files' rows surface the
    // new column as NULL, nothing is rewritten. Oracle restates the
    // merged view.
    Q("u7_schema_evolution",
      (s, d) => {
        val out = Scratch.dir("graft_u7_")
          .resolve("t").toString
        val nation = Tables.nation(s, d)
        nation.where(col("n_nationkey") >= 5)
          .select(col("n_nationkey"), col("n_name"))
          .write.parquet(out) // v1 writer: 2 columns
        nation.where(col("n_nationkey") < 5)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          .write.mode("append").parquet(out) // v2 writer: +1 column
        s.read.option("mergeSchema", "true").parquet(out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"), col("n_regionkey").cast("bigint").as("n_regionkey"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
                     CASE WHEN n_nationkey < 5 THEN n_regionkey::BIGINT END AS n_regionkey
              FROM nation""")),

    // ---- TYPE-2 history sink (k10): SCD2 over the bucketed upsert
    // machinery — v1 loads the table, v2 changes three keys and adds
    // one, the closed versions keep their payload with valid_to
    // stamped, and REPLAYING v2 writes nothing (idempotence exercised
    // inside the gate: the third call must leave the history
    // row-identical for the oracle's hash to match).
    Q("k10_scd2_history",
      (s, d) => {
        val out = Scratch.dir("graft_k10_")
          .resolve("t").toString
        val nation = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        graft.sources.Sinks.scd2Upsert(nation, out, "n_nationkey", 1L, numBuckets = 8)
        val batch2 = nation.where(col("n_nationkey") < 3)
          .withColumn("n_name", concat(col("n_name"), lit("_v2")))
          .unionByName(nation.orderBy("n_nationkey").limit(1)
            .select((col("n_nationkey") * 0 + 999).as("n_nationkey"),
              lit("NEWLAND").as("n_name")))
        graft.sources.Sinks.scd2Upsert(batch2, out, "n_nationkey", 2L, numBuckets = 8)
        graft.sources.Sinks.scd2Upsert(batch2, out, "n_nationkey", 2L, numBuckets = 8)
        graft.sources.Sinks.readUpserted(s, out)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"), col("valid_from"), col("valid_to"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
                     CAST(1 AS BIGINT) AS valid_from,
                     CAST(CASE WHEN n_nationkey < 3 THEN 2 END AS BIGINT) AS valid_to
              FROM nation
              UNION ALL
              SELECT n_nationkey::BIGINT, n_name || '_v2', 2, NULL
              FROM nation WHERE n_nationkey < 3
              UNION ALL
              SELECT 999::BIGINT, 'NEWLAND', 2, NULL""")),

    // ---- TIME TRAVEL over the SCD2 history (k11): the same two-version
    // table read AS OF v1 — interval predicates reconstruct the exact
    // pre-update state (incl. the later-updated keys' ORIGINAL payloads,
    // and without the v2-only key) from history alone, no rewrites.
    Q("k11_scd2_asof",
      (s, d) => {
        val out = Scratch.dir("graft_k11_")
          .resolve("t").toString
        val nation = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        graft.sources.Sinks.scd2Upsert(nation, out, "n_nationkey", 1L, numBuckets = 8)
        val batch2 = nation.where(col("n_nationkey") < 3)
          .withColumn("n_name", concat(col("n_name"), lit("_v2")))
          .unionByName(nation.orderBy("n_nationkey").limit(1)
            .select((col("n_nationkey") * 0 + 999).as("n_nationkey"),
              lit("NEWLAND").as("n_name")))
        graft.sources.Sinks.scd2Upsert(batch2, out, "n_nationkey", 2L, numBuckets = 8)
        graft.sources.Sinks.scd2AsOf(s, out, 1L)
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"), col("n_name"))
      },
      Some("SELECT n_nationkey::BIGINT AS n_nationkey, n_name FROM nation")),

    // ---- K13: SCD2 RETENTION (vacuum) — histories grow forever at
    // 100 TB; scd2Retention drops closed versions whose interval ended
    // at or before the horizon via the layout-preserving bucket
    // rewrite. Three versions built (v1 all / v2 keys<3 / v3 key 0),
    // horizon=2 applied TWICE (idempotence under the oracle): the
    // three v1 rows closed at 2 vanish, key 0's v2 row (closed at 3)
    // and every live row survive — so as-of any v >= horizon is
    // unchanged while pre-horizon reads lose rows by design. The gate
    // states the complete post-retention history literally.
    Q("k13_scd2_retention",
      (s, d) => {
        val out = Scratch.dir("graft_k13_")
          .resolve("t").toString
        val nation = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        graft.sources.Sinks.scd2Upsert(nation, out, "n_nationkey", 1L, numBuckets = 8)
        graft.sources.Sinks.scd2Upsert(
          nation.where(col("n_nationkey") < 3)
            .withColumn("n_name", concat(col("n_name"), lit("_v2"))),
          out, "n_nationkey", 2L, numBuckets = 8)
        graft.sources.Sinks.scd2Upsert(
          nation.where(col("n_nationkey") === 0)
            .withColumn("n_name", concat(col("n_name"), lit("_v3"))),
          out, "n_nationkey", 3L, numBuckets = 8)
        graft.sources.Sinks.scd2Retention(s, out, horizon = 2L)
        graft.sources.Sinks.scd2Retention(s, out, horizon = 2L)
        graft.sources.Sinks.readUpserted(s, out).drop("__skey")
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"), col("valid_from"), col("valid_to"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
                     1::BIGINT AS valid_from, NULL::BIGINT AS valid_to
              FROM nation WHERE n_nationkey >= 3
              UNION ALL
              SELECT n_nationkey::BIGINT, n_name || '_v2', 2::BIGINT, NULL::BIGINT
              FROM nation WHERE n_nationkey IN (1, 2)
              UNION ALL
              SELECT n_nationkey::BIGINT, n_name || '_v2', 2::BIGINT, 3::BIGINT
              FROM nation WHERE n_nationkey = 0
              UNION ALL
              SELECT n_nationkey::BIGINT, n_name || '_v3', 3::BIGINT, NULL::BIGINT
              FROM nation WHERE n_nationkey = 0""")),

    // ---- K17: the PRE-HORIZON read contract (the k13 comment, now
    // enforced and gated): after retention at horizon 2, scd2AsOf(3)
    // and scd2AsOf(2) reconstruct their exact full states (restated
    // literally), while scd2AsOf(1) — whose closed v1 rows were
    // vacuumed — FAILS LOUDLY instead of silently returning partial
    // history. The gate catches the contract exception and emits a
    // marker row; an implementation that silently served the partial
    // v1 would emit pre_horizon=false (or v1 content rows) and fail
    // the hash. The horizon marker lives in a sibling file so the
    // retention/compaction dir swaps cannot erase it.
    Q("k17_scd2_horizon_guard",
      (s, d) => {
        import s.implicits._
        val out = Scratch.dir("graft_k17_")
          .resolve("t").toString
        val nation = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        graft.sources.Sinks.scd2Upsert(nation, out, "n_nationkey", 1L, numBuckets = 8)
        graft.sources.Sinks.scd2Upsert(
          nation.where(col("n_nationkey") < 3)
            .withColumn("n_name", concat(col("n_name"), lit("_v2"))),
          out, "n_nationkey", 2L, numBuckets = 8)
        graft.sources.Sinks.scd2Upsert(
          nation.where(col("n_nationkey") === 0)
            .withColumn("n_name", concat(col("n_name"), lit("_v3"))),
          out, "n_nationkey", 3L, numBuckets = 8)
        graft.sources.Sinks.scd2Retention(s, out, horizon = 2L)
        def asOfRows(v: Long): org.apache.spark.sql.DataFrame =
          try graft.sources.Sinks.scd2AsOf(s, out, v)
            .select(lit(v).as("asof_version"),
              col("n_nationkey").cast("bigint").as("n_nationkey"),
              col("n_name"), lit(false).as("pre_horizon"))
          catch {
            case _: IllegalStateException =>
              Seq((v, null.asInstanceOf[java.lang.Long], null.asInstanceOf[String], true))
                .toDF("asof_version", "n_nationkey", "n_name", "pre_horizon")
          }
        asOfRows(3L).unionByName(asOfRows(2L)).unionByName(asOfRows(1L))
      },
      Some("""SELECT 3::BIGINT AS asof_version, n_nationkey::BIGINT AS n_nationkey,
                     CASE WHEN n_nationkey = 0 THEN n_name || '_v3'
                          WHEN n_nationkey < 3 THEN n_name || '_v2'
                          ELSE n_name END AS n_name,
                     false AS pre_horizon
              FROM nation
              UNION ALL
              SELECT 2::BIGINT, n_nationkey::BIGINT,
                     CASE WHEN n_nationkey < 3 THEN n_name || '_v2' ELSE n_name END,
                     false
              FROM nation
              UNION ALL
              SELECT 1::BIGINT, NULL::BIGINT, NULL, true""")),

    // ---- K14: keyed TABLE DIFF (migration audit) — two logical
    // versions of a keyed table compared with one full-outer join:
    // added / removed / changed / unchanged per key, old and new
    // payloads side by side. The 100 TB shape: one co-partitioned
    // shuffle join on the key (bucketed tables make it exchange-free
    // per k12), output one row per key regardless of change density.
    // v2 deletes key 3, changes keys 0-1, inserts key 99.
    Q("k14_table_diff",
      (s, d) => {
        val v1 = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
        val v2 = v1.where(col("n_nationkey") =!= 3)
          .select(col("n_nationkey"),
            when(col("n_nationkey") < 2, concat(col("n_name"), lit("_v2")))
              .otherwise(col("n_name")).as("n_name"))
          .unionByName(s.range(1).select(
            lit(99).cast("int").as("n_nationkey"), lit("NEWLAND").as("n_name")))
        v1.select(col("n_nationkey"), col("n_name").as("old_name"))
          .join(v2.select(col("n_nationkey"), col("n_name").as("new_name")),
            Seq("n_nationkey"), "full_outer")
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("old_name"), col("new_name"),
            when(col("old_name").isNull, "added")
              .when(col("new_name").isNull, "removed")
              .when(col("old_name") =!= col("new_name"), "changed")
              .otherwise("unchanged").as("change_type"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey,
                     n_name AS old_name,
                     CASE WHEN n_nationkey = 3 THEN NULL
                          WHEN n_nationkey < 2 THEN n_name || '_v2'
                          ELSE n_name END AS new_name,
                     CASE WHEN n_nationkey = 3 THEN 'removed'
                          WHEN n_nationkey < 2 THEN 'changed'
                          ELSE 'unchanged' END AS change_type
              FROM nation
              UNION ALL
              SELECT 99::BIGINT, NULL, 'NEWLAND', 'added'""")),

    // ---- K18: Z-ORDER layout (multi-dimensional min/max clustering) —
    // the write-time answer to "a single-key sort prunes one column
    // only". Lineitem is rewritten clustered on the Morton curve of
    // (l_orderkey, l_partkey); every output file then covers a small
    // BOX in key space, so parquet footer min/max skips files for
    // predicates on EITHER column. The gate proves both halves:
    // (a) round-trip correctness — a 2-D box aggregate over the
    // rewritten files matches the oracle over the raw table (the
    // layout loses/duplicates nothing); (b) PRUNING — per-file min/max
    // boxes (exactly what a scan's footer stats offer, computed via
    // input_file_name so the assert is deterministic, not a runtime
    // metric) show a 10%×10% box touching ≤ 40% of files AND a
    // partkey-only slab (the dimension a l_orderkey-sorted layout
    // CANNOT prune) touching ≤ 60%. Box bounds are integer arithmetic
    // on the table's own min/max so both engines compute identical
    // literals at any SF.
    Q("k18_zorder_layout",
      (s, d) => {
        import graft.operators.ZOrder
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").cast("long").as("l_orderkey"),
            col("l_partkey").cast("long").as("l_partkey"),
            col("l_quantity"))
        val dir = Scratch.dir("graft_k18_").resolve("zli").toString
        ZOrder.writeLayout(li, dir, "l_orderkey", "l_partkey", 16)
        val st = li.agg(min("l_orderkey"), max("l_orderkey"),
          min("l_partkey"), max("l_partkey")).head()
        val (okLo, okMax, pkLo, pkMax) =
          (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
        val okHi = okLo + (okMax - okLo) / 10
        val pkHi = pkLo + (pkMax - pkLo) / 10
        val zread = s.read.parquet(dir)
        val boxes = ZOrder.fileBoxes(zread, "l_orderkey", "l_partkey")
          .collect()
        val nf = boxes.length
        val prunes = nf >= 8 &&
          ZOrder.boxHits(boxes, okLo, okHi, pkLo, pkHi) * 10 <= nf * 4 &&
          ZOrder.boxHits(boxes, Long.MinValue, Long.MaxValue,
            pkLo, pkHi) * 10 <= nf * 6
        zread
          .where(col("l_orderkey").between(okLo, okHi) &&
            col("l_partkey").between(pkLo, pkHi))
          .agg(count(lit(1)).as("n_rows"),
            sum("l_quantity").cast("bigint").as("sum_qty"))
          .withColumn("layout_prunes", lit(prunes))
      },
      Some("""WITH b AS (SELECT min(l_orderkey) AS oklo,
                     min(l_orderkey) + (max(l_orderkey) - min(l_orderkey)) // 10 AS okhi,
                     min(l_partkey) AS pklo,
                     min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 10 AS pkhi
              FROM lineitem)
              SELECT count(*)::BIGINT AS n_rows,
                     sum(l_quantity)::BIGINT AS sum_qty,
                     TRUE AS layout_prunes
              FROM lineitem, b
              WHERE l_orderkey BETWEEN b.oklo AND b.okhi
                AND l_partkey BETWEEN b.pklo AND b.pkhi""")),

    // ---- K19: Z-ORDER under SKEW — the equi-depth variant. Layout
    // keys are (l_orderkey², l_partkey): the squared key crowds 90% of
    // rows into the top ~99% of the value span, the shape where a
    // value-space mapping's resolution is at the mercy of the
    // distribution. writeLayoutEqDepth bins each key by approximate
    // quantile boundaries (code space uniform in ROW MASS by
    // construction — resolution tracks row-fraction, not value-span,
    // under ANY distribution, including the outlier span inflation
    // that provably zeroes linear scaling; ZOrderSpec pins that
    // degenerate contrast) at the same write cost: one sketch pass,
    // one range shuffle, reads stay pure parquet scans. The gate holds
    // the k18 thresholds on the skewed data: a 10%-of-rows ×
    // 10%-of-partkey box ≤ 40% of files, the partkey slab ≤ 60%. Box
    // bounds are integer arithmetic on l_orderkey's min/max, squared —
    // monotone on positive keys, so both engines state the predicate
    // exactly.
    Q("k19_zorder_eqdepth",
      (s, d) => {
        import graft.operators.ZOrder
        val li = Tables.lineitem(s, d)
          .select((col("l_orderkey").cast("long") *
            col("l_orderkey").cast("long")).as("skew"),
            col("l_partkey").cast("long").as("l_partkey"),
            col("l_quantity"))
        val dir = Scratch.dir("graft_k19_").resolve("zeq").toString
        ZOrder.writeLayoutEqDepth(li, dir, "skew", "l_partkey", 16)
        val st = Tables.lineitem(s, d)
          .select(col("l_orderkey").cast("long").as("ok"),
            col("l_partkey").cast("long").as("pk"))
          .agg(min("ok"), max("ok"), min("pk"), max("pk")).head()
        val (okLo, okMax, pkLo, pkMax) =
          (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
        val okHi = okLo + (okMax - okLo) / 10
        val (sqLo, sqHi) = (okLo * okLo, okHi * okHi)
        val pkHi = pkLo + (pkMax - pkLo) / 10
        val zread = s.read.parquet(dir)
        val boxes = ZOrder.fileBoxes(zread, "skew", "l_partkey").collect()
        val nf = boxes.length
        val prunes = nf >= 8 &&
          ZOrder.boxHits(boxes, sqLo, sqHi, pkLo, pkHi) * 10 <= nf * 4 &&
          ZOrder.boxHits(boxes, Long.MinValue, Long.MaxValue,
            pkLo, pkHi) * 10 <= nf * 6
        zread
          .where(col("skew").between(sqLo, sqHi) &&
            col("l_partkey").between(pkLo, pkHi))
          .agg(count(lit(1)).as("n_rows"),
            sum("l_quantity").cast("bigint").as("sum_qty"))
          .withColumn("layout_prunes", lit(prunes))
      },
      Some("""WITH b AS (SELECT min(l_orderkey) AS oklo,
                     min(l_orderkey) + (max(l_orderkey) - min(l_orderkey)) // 10 AS okhi,
                     min(l_partkey) AS pklo,
                     min(l_partkey) + (max(l_partkey) - min(l_partkey)) // 10 AS pkhi
              FROM lineitem)
              SELECT count(*)::BIGINT AS n_rows,
                     sum(l_quantity)::BIGINT AS sum_qty,
                     TRUE AS layout_prunes
              FROM lineitem, b
              WHERE l_orderkey * l_orderkey BETWEEN b.oklo * b.oklo AND b.okhi * b.okhi
                AND l_partkey BETWEEN b.pklo AND b.pkhi""")),

    // ---- K12: BUCKETED tables + exchange-free co-located join — the
    // brief's "co-locate joins via bucketing" as a gate. Both sides are
    // written as Spark bucketed tables (8 buckets on the join key, the
    // catalog carries HashPartitioning metadata), so the join compiles
    // WITHOUT a shuffle on either side: at 100 TB this is the
    // write-once/join-many contract — the big fact pays its shuffle at
    // ingest, never again. (At gate SF the small side may still
    // broadcast — broadcast thresholds are PLANNING-time confs, so a
    // construction-scoped withConf can't pin them for the driver's
    // later execution; the zero-Exchange bucket-SMJ plan is
    // machine-checked in PlanShapeSpec, which holds the conf across
    // execution.) The oracle restates the join over the raw parquet —
    // bucketing must be a pure physical property, invisible in the
    // result.
    Q("k12_bucketed_cojoin",
      (s, d) => {
        val wh = Scratch.dir("graft_k12_").toString
        s.sql("DROP TABLE IF EXISTS graft_k12_orders")
        s.sql("DROP TABLE IF EXISTS graft_k12_customer")
        Tables.orders(s, d).write.bucketBy(8, "o_custkey")
          .option("path", s"$wh/orders_b").mode("overwrite")
          .saveAsTable("graft_k12_orders")
        Tables.customer(s, d).write.bucketBy(8, "c_custkey")
          .option("path", s"$wh/customer_b").mode("overwrite")
          .saveAsTable("graft_k12_customer")
        s.table("graft_k12_orders")
          .join(s.table("graft_k12_customer"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n_orders"),
            sum(dec(col("o_totalprice"))).cast("double").as("sum_price"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY 1""")),

    // ---- §3.2 sub-dataset slices (k8): DatasetWriter.subDatasets —
    // one partitionBy(slice, split) pass per slice FAMILY (vs the
    // reference's loop of filtered writes, dataset_creator.py:941-1004)
    // — exercised end-to-end: write a year-band slice family over the
    // nation-derived fixture, read ONE slice directory back through the
    // partition-pruned path, oracle-state its rows (null label routes
    // to __other like the reference's unknown bucket).
    Q("k8_subdatasets_roundtrip",
      (s, d) => {
        val out = Scratch.dir("graft_k8_").toString
        val ds = Tables.nation(s, d)
          .withColumn("split",
            when(col("n_nationkey") % 2 === 0, "train").otherwise("test"))
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"), col("split"))
        graft.datasets.DatasetWriter.subDatasets(ds, out, Map(
          "region_band" -> when(col("n_regionkey") < 2, lit("low"))
            .when(col("n_regionkey") < 4, lit("mid"))))
        s.read.json(s"$out/by_region_band")
          .where(col("region_band") === "mid")
          .select(col("n_nationkey").cast("bigint").as("n_nationkey"),
            col("n_name"), col("region_band"), col("split"))
      },
      Some("""SELECT n_nationkey::BIGINT AS n_nationkey, n_name,
                     'mid' AS region_band,
                     CASE WHEN n_nationkey % 2 = 0 THEN 'train' ELSE 'test' END AS split
              FROM nation WHERE n_regionkey IN (2, 3)""")),

    // ---- run_nlp_pipe token persistence (abstract_preprocessor.py:
    // 256-298): per-section counts in both calibration currencies —
    // word-rule "spacy" analog + model-tokenizer len(input_ids),
    // language-dispatched: de/it → WordPiece (+[CLS]/[SEP]), fr → BPE
    // (+<s>/</s>) since the reference's fr model (camembert-base-ccnet)
    // is SentencePiece/BPE-family, not WordPiece. Fixture sentences
    // have HAND-DERIVED counts (t16's construction), so the oracle
    // states literal numbers and runs no tokenizer.
    Q("r8_num_tokens",
      (s, d) => {
        import s.implicits._
        val sections = Seq(
          (1, "Das Bundesgericht weist die Beschwerde ab.", "de"),
          (2, "Urteile des Kantons Zürich", "de"),
          (3, "Die Beschwerde wird gutgeheissen!", "de"),
          (4, "Œuvre unbekannt", "de"),
          (5, "Le recours est rejeté.", "fr"))
          .toDF("section_id", "section_text", "language")
        graft.relational.DecisionJoins.numTokens(sections, Some("language"))
          .select(col("num_tokens_id").cast("bigint").as("num_tokens_id"),
            col("section_id").cast("bigint").as("section_id"),
            col("num_tokens_spacy").cast("bigint").as("num_tokens_spacy"),
            col("num_tokens_bert").cast("bigint").as("num_tokens_bert"))
      },
      Some("""SELECT * FROM (VALUES
                (1, 1, 7, 9),   -- 6 words + '.'; WP 7 + [CLS]/[SEP]
                (2, 2, 4, 7),
                (3, 3, 5, 7),
                (4, 4, 2, 11),  -- [UNK] + prefix/char-fallback pieces
                (5, 5, 5, 20)   -- fr tier: 18 BPE subwords + <s>/</s>
              ) AS t(num_tokens_id, section_id, num_tokens_spacy, num_tokens_bert)""")),


    // ---- A1: grouped aggregation with multiple measures (TPC-H Q1 shape).
    // Partial (map-side) agg + single shuffle on the 4-value group key.
    Q("a1_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .where(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("bigint").as("sum_qty"),
          // sums accumulate in decimal (exact, order-independent) and the
          // FINAL value converts to double — decimal→nearest-double is
          // bit-identical on both engines, unlike decimal stringification
          // (trailing-zero repr differs; see VERDICT r1).
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order")),
      Some("""SELECT l_returnflag, l_linestatus,
              cast(sum(l_quantity) as bigint) AS sum_qty,
              cast(sum(cast(l_extendedprice as decimal(12,2))) as double) AS sum_base_price,
              cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2)))) as double) AS sum_disc_price,
              count(*) AS count_order
              FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              GROUP BY l_returnflag, l_linestatus""")),

    // ---- A1b: distinct aggregation.
    Q("a1_count_distinct",
      (s, d) => Tables.customer(s, d)
        .groupBy(col("c_nationkey").cast("bigint").as("nationkey"))
        .agg(countDistinct("c_mktsegment").as("n_segments"),
          count(lit(1)).as("n_customers")),
      Some("""SELECT cast(c_nationkey as bigint) AS nationkey,
              count(DISTINCT c_mktsegment) AS n_segments, count(*) AS n_customers
              FROM customer GROUP BY 1""")),

    // ---- J1: snowflake dimension-join chain (decision⟕language⟕chamber⟕court
    // in the reference). Dims broadcast — no shuffle of the fact side.
    Q("j1_snowflake_join",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name")),
      Some("""SELECT c_custkey, c_name, n_name, r_name
              FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
              LEFT JOIN region ON n_regionkey = r_regionkey""")),

    // ---- J2: aggregate-join ("map_join" — the reference's most load-bearing
    // operator). Child pre-aggregated to one row per key before the join.
    Q("j2_aggregate_join",
      (s, d) => MapJoin.aggregateJoin(
        Tables.orders(s, d).select("o_orderkey", "o_orderstatus"),
        Tables.lineitem(s, d).withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey",
        Seq(count(lit(1)).as("li_count"),
          sum("l_quantity").cast("bigint").as("sum_qty"))),
      Some("""SELECT o.o_orderkey, o.o_orderstatus, li.li_count, li.sum_qty
              FROM orders o LEFT JOIN (
                SELECT l_orderkey, count(*) AS li_count,
                       cast(sum(l_quantity) as bigint) AS sum_qty
                FROM lineitem GROUP BY 1) li ON o.o_orderkey = li.l_orderkey""")),

    // ---- J3: nested map_join — child pre-joined with its own dimension
    // (sections ⟕ section_type ⟕ num_tokens in the reference), THEN
    // aggregated to one row per fact key, then attached.
    Q("j3_nested_mapjoin",
      (s, d) => {
        val enriched = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        MapJoin.aggregateJoin(
          Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
          enriched.withColumnRenamed("l_orderkey", "o_orderkey"),
          "o_orderkey",
          Seq(count(lit(1)).as("n_lines"),
            countDistinct("p_brand").as("n_brands"),
            // max over doubles is order-independent — no decimal detour
            max("p_retailprice").as("max_retail")))
      },
      Some("""SELECT o.o_orderkey, o.o_orderpriority, c.n_lines, c.n_brands, c.max_retail
              FROM orders o LEFT JOIN (
                SELECT l_orderkey, count(*) AS n_lines,
                       count(DISTINCT p_brand) AS n_brands,
                       max(p_retailprice) AS max_retail
                FROM lineitem JOIN part ON l_partkey = p_partkey
                GROUP BY 1) c ON o.o_orderkey = c.l_orderkey""")),

    // ---- J2/A2: collect-join — child rows gathered as one ordered value per
    // key (reference: json_agg(json_build_object(...)) GROUP BY decision_id).
    // Emitted as a joined string so the oracle compare is engine-neutral.
    Q("j2_collect_join",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(expr("array_join(transform(array_sort(collect_list(l_linenumber)), x -> cast(x as string)), ',')")
          .as("line_numbers")),
      Some("""SELECT l_orderkey AS o_orderkey,
              string_agg(cast(l_linenumber as varchar), ',' ORDER BY l_linenumber) AS line_numbers
              FROM lineitem GROUP BY 1""")),

    // ---- J6: self-join (reference: header-section ⟕ footer-section of the
    // same decision). One shuffle on the shared key; AQE may broadcast.
    Q("j6_self_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        // per-row values pass through unchanged — raw doubles compare exact
        val a = li.where(col("l_linenumber") === 1)
          .select(col("l_orderkey"), col("l_extendedprice").as("price1"))
        val b = li.where(col("l_linenumber") === 2)
          .select(col("l_orderkey"), col("l_extendedprice").as("price2"))
        a.join(b, Seq("l_orderkey"), "left")
      },
      Some("""SELECT a.l_orderkey, a.l_extendedprice AS price1,
                     b.l_extendedprice AS price2
              FROM lineitem a LEFT JOIN lineitem b
                ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = 2
              WHERE a.l_linenumber = 1""")),

    // ---- J10: as-of join (nearest ruling page ≤ cited page in the
    // reference). Union-sort rewrite: single shuffle of |L|+|R| rows.
    // Comparisons on raw epoch-nanos to match DuckDB's ns precision.
    Q("j10_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts_ns")
        val purchases = ev.where(col("event_type") === "purchase")
        AsOfJoin.joinBackward(clicks, purchases, Seq("user_id"),
            leftOrd = "ts_ns", rightOrd = "ts_ns",
            rightVals = Seq("event_id", "value"))
          // join at ns precision; OUTPUT µs — DuckDB timestamps are µs, so
          // the oracle can't echo full nanos back (VERDICT r1, j10)
          .select(col("event_id"), col("user_id"),
            expr("ts_ns div 1000").as("ts_us"),
            col("asof_event_id"), col("asof_value"))
      },
      Some("""SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
                     p.event_id AS asof_event_id, p.value AS asof_value
              FROM (SELECT * FROM events WHERE event_type = 'click') c
              ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
                ON c.user_id = p.user_id AND c.ts >= p.ts""")),

    // ---- J12: anti join (reference: skip already-ingested files).
    Q("j12_anti_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // ---- J12 with a NONZERO result: the synthetic generator gives
    // every customer an order, so j12's 0-row match is weak evidence
    // that anti-join semantics are right; filtering the right side
    // ("customers with no large order") produces real rows at every SF
    // (3 / 30 / 308 at sf0.001/0.01/0.1).
    Q("j16_anti_join_filtered",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""")),

    // ---- J15: semi join (membership labeling).
    Q("j15_semi_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment"),
      Some("""SELECT c_custkey, c_mktsegment FROM customer c
              WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // ---- J17: SALTED skew join — the explicit skew lever the brief
    // names ("salting for skew") gated on result EQUALITY with the
    // plain join: the fact side (lineitem) is spread over 8 artificial
    // sub-keys, the mid-size build side (small parts) is replicated
    // once per salt, and the oracle restates the unsalted join — so
    // the gate pins that salting is a pure physical rewrite, invisible
    // in the result. Use when a skewed build side is too big to
    // broadcast and AQE's skew split can't engage (operators/Salting).
    Q("j17_salted_skew_join",
      (s, d) => {
        val fact = Tables.lineitem(s, d).select(col("l_orderkey"),
          col("l_linenumber").cast("bigint").as("l_linenumber"),
          col("l_partkey").as("partkey"), col("l_quantity"))
        val dim = Tables.part(s, d).where(col("p_size") <= 5)
          .select(col("p_partkey").as("partkey"), col("p_name"))
        graft.operators.Salting.saltedJoin(fact, dim, "partkey", nSalts = 8)
          .select("l_orderkey", "l_linenumber", "partkey", "p_name", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber,
                     l_partkey AS partkey, p_name, l_quantity
              FROM lineitem JOIN part ON l_partkey = p_partkey
              WHERE p_size <= 5""")),

    // ---- J20: RUNTIME BLOOM-FILTER join (Catalyst's
    // InjectRuntimeFilter, the big-big shuffle-join pruning lever):
    // when the dim side of a shuffle join carries a selective filter,
    // the optimizer builds a bloom filter over its join keys as a
    // scalar subquery and applies bloom_filter_might_contain on the
    // FACT side BEFORE its shuffle — at 100 TB that is the difference
    // between shuffling the whole fact table and shuffling the ~matching
    // slice. The sizing confs are scoped to EXECUTION here (the rule
    // runs at optimization time, not analysis — withConf's usual
    // construction-only scope would silently miss it), broadcast is
    // disabled to force the shuffle-join shape the rule targets, and
    // the gate asserts the filter actually injected (a silently
    // not-firing rule would otherwise still pass the value compare)
    // alongside result equality with the plain join restated by the
    // oracle.
    Q("j20_runtime_bloom_join",
      (s, d) => {
        val (flag, rows, schema) =
          withConf(s, "spark.sql.optimizer.runtime.bloomFilter.enabled", "true") {
            withConf(s, "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0") {
              withConf(s, "spark.sql.autoBroadcastJoinThreshold", "-1") {
                val dim = Tables.orders(s, d)
                  .where(col("o_orderpriority") === "1-URGENT")
                val j = Tables.lineitem(s, d)
                  .join(dim, col("l_orderkey") === col("o_orderkey"))
                  .groupBy("o_orderpriority")
                  .agg(count(lit(1)).as("n_items"),
                    sum("l_quantity").cast("bigint").as("sum_qty"))
                val injected = j.queryExecution.optimizedPlan.toString
                  .toLowerCase.contains("bloom_filter_might_contain") ||
                  j.queryExecution.executedPlan.toString
                    .toLowerCase.contains("bloomfilter")
                (injected, j.collect().toSeq, j.schema)
              }
            }
          }
        s.createDataFrame(
            s.sparkContext.parallelize(rows, 1), schema)
          .withColumn("bloom_injected", lit(flag))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
                     sum(l_quantity)::BIGINT AS sum_qty,
                     TRUE AS bloom_injected
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              WHERE o_orderpriority = '1-URGENT'
              GROUP BY 1""")),

    // ---- J18: RANGE (band) join — clicks within the hour BEFORE each
    // purchase by the same user, via the bucketized rewrite
    // (operators/RangeJoin): intervals explode to ≤2 coarse time
    // buckets, the join is a plain equi-join on (user, bucket) with
    // the exact band as residual — no BNLJ, no per-user cartesian.
    // Join logic on raw epoch nanos; output µs (DuckDB timestamps are
    // µs — the j10 convention).
    Q("j18_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.where(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts_ns").as("click_ns"))
        val purchases = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts_ns").as("purchase_ns"))
        graft.operators.RangeJoin.bandJoin(clicks, purchases,
            Seq("user_id"), ptCol = "click_ns", centerCol = "purchase_ns",
            before = 3600L * 1000 * 1000 * 1000, after = 0L)
          .select(col("purchase_id"), col("user_id"),
            expr("purchase_ns div 1000").as("purchase_ts_us"),
            col("click_id"), expr("click_ns div 1000").as("click_ts_us"))
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id,
                     epoch_us(p.ts) AS purchase_ts_us,
                     c.event_id AS click_id, epoch_us(c.ts) AS click_ts_us
              FROM (SELECT * FROM events WHERE event_type = 'purchase') p
              JOIN (SELECT * FROM events WHERE event_type = 'click') c
                ON c.user_id = p.user_id
               AND epoch_ns(c.ts) BETWEEN epoch_ns(p.ts) - 3600000000000 AND epoch_ns(p.ts)""")),

    // ---- J19: KEYLESS interval lookup — every event against a derived
    // table of 200 one-hour windows, NO equi key anywhere: the naive
    // plan is BroadcastNestedLoopJoin (|P|·|I| comparisons — the actual
    // 100 TB hazard); RangeJoin's bucket column manufactures an equi
    // key, so the plan is a hash join + residual (PlanShapeSpec pins
    // no BNLJ). Probe: flat ~0.4 s across a 50× point scale-up where
    // BNLJ grows as |P|·|I|. Oracle generates the identical window
    // table with range().
    Q("j19_window_lookup",
      (s, d) => {
        val hourNs = 3600L * 1000 * 1000 * 1000
        val base = 1704067200000000000L // 2024-01-01, the events epoch
        val stride = 2592000000000000L / 200L // 30 days / 200 windows
        val windows = s.range(200).select(
          col("id").as("win_id"),
          (lit(base) + col("id") * stride).as("win_lo"),
          (lit(base) + col("id") * stride + hourNs).as("win_hi"))
        val pts = Tables.events(s, d).select(col("event_id"), col("ts_ns"))
        graft.operators.RangeJoin.pointInInterval(pts, windows,
            Seq.empty, "ts_ns", "win_lo", "win_hi", width = hourNs)
          .select(col("win_id"), col("event_id"),
            expr("ts_ns div 1000").as("ts_us"))
      },
      Some("""SELECT w.win_id, e.event_id, epoch_us(e.ts) AS ts_us
              FROM events e
              JOIN (SELECT range AS win_id,
                           1704067200000000000 + range * 12960000000000 AS win_lo,
                           1704067200000000000 + range * 12960000000000 + 3600000000000 AS win_hi
                    FROM range(200)) w
                ON epoch_ns(e.ts) BETWEEN w.win_lo AND w.win_hi""")),

    // ---- W1: latest-row-per-key via row_number (reference: nearest-page
    // pick). Deterministic tie-break on the unique key.
    Q("w1_latest_order_per_customer",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        Tables.orders(s, d)
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("last_order_date"))
      },
      Some("""SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS last_order_date
              FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
              WHERE rn = 1""")),

    // ---- W2/O1: global top-k with deterministic tie-break. Spark plans
    // TakeOrderedAndProject — no full sort at scale.
    Q("w2_top25_parts_by_revenue",
      (s, d) => {
        val rev = Tables.lineitem(s, d).groupBy("l_partkey")
          // decimal accumulation, double output (decimal→double is monotonic,
          // so the top-k order is unchanged)
          .agg(sum(dec(col("l_extendedprice")) *
            (lit(1).cast("decimal(4,2)") - dec(col("l_discount"), "decimal(4,2)")))
            .cast("double").as("revenue"))
        rev.join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .orderBy(col("revenue").desc, col("p_partkey"))
          .limit(25)
          .select("p_partkey", "p_name", "revenue")
      },
      Some("""SELECT p_partkey, p_name, revenue FROM (
                SELECT l_partkey,
                  cast(sum(cast(l_extendedprice as decimal(12,2)) * (cast(1 as decimal(4,2)) - cast(l_discount as decimal(4,2)))) as double) AS revenue
                FROM lineitem GROUP BY 1) r
              JOIN part ON l_partkey = p_partkey
              ORDER BY revenue DESC, p_partkey LIMIT 25""")),

    // ---- W3/A8: ntile quartile labels (criticality labels in the
    // reference). Global-order window: fine for label vocab; at 100 TB the
    // input to it is an aggregate, never the raw fact table.
    // distributed global ntile (operators.GlobalRank): range-partition +
    // local index + broadcast prefix offsets — identical assignment to
    // `ntile OVER (ORDER BY …)` (GlobalRankSpec) without funneling the
    // table through one partition. The single-partition work is the
    // per-partition count table, never the data. Handle-free form on
    // purpose: this is PLAN HANDOFF (the driver runs the action), so a
    // try/finally release would fire before the action; the
    // size-adaptive dispatch takes the no-cache window path at this
    // input size (asserted in GlobalRankSpec), so nothing is pinned —
    // action-owning consumers (datasets.CriticalityDataset.build) use
    // the releasable form instead.
    Q("w3_ntile_quartiles",
      (s, d) => graft.operators.GlobalRank.ntileGlobal(
        Tables.customer(s, d), 4,
        Seq(col("c_acctbal"), col("c_custkey")), "quartile")
        .select("c_custkey", "quartile"),
      Some("""SELECT c_custkey, cast(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) as bigint) AS quartile
              FROM customer""")),

    // ---- W4: running aggregate per key.
    Q("w4_running_total",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.orders(s, d)
          .withColumn("running_spend",
            sum(dec(col("o_totalprice"))).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "running_spend")
      },
      Some("""SELECT o_custkey, o_orderkey,
              cast(sum(cast(o_totalprice as decimal(12,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS running_spend
              FROM orders""")),

    // ---- W5: lag — days since previous order per customer.
    Q("w5_order_gap_days",
      (s, d) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
          .select(col("o_custkey"), col("o_orderkey"),
            datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date"))
              .cast("bigint").as("gap_days"))
      },
      Some("""SELECT o_custkey, o_orderkey,
              cast(date_diff('day',
                cast(lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) as date),
                cast(o_orderdate as date)) as bigint) AS gap_days
              FROM orders""")),

    // ---- A4: hierarchical rollup (chamber→court→canton counters in the
    // reference).
    Q("a4_rollup_customers",
      (s, d) => withConf(s, "spark.sql.analyzer.failAmbiguousSelfJoin", "false") {
        // DetectAmbiguousSelfJoin false-positives on rollup-after-join
        // (fires even with fresh toDF lineage); the plan has no self join.
        Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("c_acctbal"))
        .rollup("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(dec(col("c_acctbal"))).cast("double").as("sum_acctbal"))
      },
      Some("""SELECT r_name, n_name, count(*) AS n_customers,
              cast(sum(cast(c_acctbal as decimal(12,2))) as double) AS sum_acctbal
              FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY ROLLUP(r_name, n_name)""")),

    // ---- (beyond ref) PIVOT: wide per-(source, lang) counts — the
    // report-table shape. The pivot column set is FIXED (the 5 corpus
    // languages) so the schema is static at plan time — at 100 TB an
    // inferred pivot would pay a distinct scan AND produce an unstable
    // schema; missing cells filled to 0 to match the oracle's
    // conditional counts.
    Q("a20_pivot_lang_counts",
      (s, d) => Tables.documents(s, d)
        .groupBy("source").pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh")),
      Some("""SELECT source,
                     count(CASE WHEN lang = 'de' THEN 1 END) AS de,
                     count(CASE WHEN lang = 'en' THEN 1 END) AS en,
                     count(CASE WHEN lang = 'es' THEN 1 END) AS es,
                     count(CASE WHEN lang = 'fr' THEN 1 END) AS fr,
                     count(CASE WHEN lang = 'zh' THEN 1 END) AS zh
              FROM documents GROUP BY source""")),

    // ---- (beyond ref) UNPIVOT/melt: the inverse — the wide pivot
    // table back to (source, lang, n) rows, INCLUDING the 0 cells the
    // fill created (the oracle restates them via the source×lang
    // cross join). Round-trips the a20 shape.
    Q("a21_unpivot_lang_counts",
      (s, d) => Tables.documents(s, d)
        .groupBy("source").pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .unpivot(Array(col("source")),
          Array(col("de"), col("en"), col("es"), col("fr"), col("zh")),
          "lang", "n_docs"),
      Some("""SELECT s.source, l.lang, count(d.doc_id) AS n_docs
              FROM (SELECT DISTINCT source FROM documents) s
              CROSS JOIN (SELECT unnest(['de','en','es','fr','zh']) AS lang) l
              LEFT JOIN documents d ON d.source = s.source AND d.lang = l.lang
              GROUP BY 1, 2""")),

    // ---- (beyond ref) CUBE: all grouping-set combinations of
    // (lang, source) in one pass — rollup's sibling (a4), 4 grouping
    // sets from one shuffle via the grouping-id expansion.
    Q("a22_cube_lang_source",
      (s, d) => Tables.documents(s, d)
        .cube("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars")),
      Some("""SELECT lang, source, count(*) AS n_docs,
                     CAST(sum(n_chars) AS BIGINT) AS sum_chars
              FROM documents GROUP BY CUBE(lang, source)""")),

    // ---- A13: histogram binning.
    Q("a13_price_histogram",
      (s, d) => Tables.orders(s, d)
        .groupBy((floor(col("o_totalprice") / 1000) * 1000).cast("bigint").as("price_bucket"))
        .agg(count(lit(1)).as("n_orders")),
      Some("""SELECT cast(floor(o_totalprice / 1000) * 1000 as bigint) AS price_bucket,
              count(*) AS n_orders FROM orders GROUP BY 1""")),

    // ---- U1: union + distinct.
    Q("u1_union_distinct",
      (s, d) => {
        val o = Tables.orders(s, d)
        o.where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
          .unionByName(o.where(col("o_totalprice") > 400000).select("o_orderkey"))
          .distinct()
      },
      Some("""SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
              UNION SELECT o_orderkey FROM orders WHERE o_totalprice > 400000""")),

    // ---- U3: except (set difference — progress tracking in the reference).
    Q("u3_except_nations",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("n_name").distinct()
        .except(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select("n_name").distinct()),
      Some("""SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
              EXCEPT
              SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey""")),

    // ---- U3 with a NONZERO result at every SF (u3's 0-row match is
    // weak evidence for set-difference semantics — the generator gives
    // every nation both customers and suppliers): row-level EXCEPT over
    // the full customer keyset against its mod-3 subset — 2/3 of the
    // table survives, both sides shuffle-dedup at data volume.
    Q("u6_except_rows",
      (s, d) => Tables.customer(s, d).select("c_custkey", "c_mktsegment")
        .except(Tables.customer(s, d).select("c_custkey", "c_mktsegment")
          .where(col("c_custkey") % 3 === 0)),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              EXCEPT
              SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey % 3 = 0""")),

    // ---- U5: intersect.
    Q("u5_intersect_nations",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select("n_name").distinct()
        .intersect(Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .select("n_name").distinct()),
      Some("""SELECT DISTINCT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey
              INTERSECT
              SELECT DISTINCT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey""")),

    // ---- O6: date-stratified split labels (train/val/test/secret in the
    // reference's dataset creators).
    Q("o6_date_split",
      (s, d) => Tables.orders(s, d)
        .withColumn("split",
          when(year(col("o_orderdate")) < 1996, "train")
            .when(year(col("o_orderdate")) <= 1997, "validation")
            .when(year(col("o_orderdate")) <= 1999, "test")
            .otherwise("secret_test"))
        .groupBy("split").agg(count(lit(1)).as("n_orders")),
      Some("""SELECT CASE WHEN year(o_orderdate) < 1996 THEN 'train'
                          WHEN year(o_orderdate) <= 1997 THEN 'validation'
                          WHEN year(o_orderdate) <= 1999 THEN 'test'
                          ELSE 'secret_test' END AS split,
              count(*) AS n_orders FROM orders GROUP BY 1""")),

    // ---- O5: deterministic hash-free split (randomSplit analog made
    // reproducible: modulo on the unique key).
    Q("o5_modulo_split",
      (s, d) => Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_orderkey") % 10 < 8, "train")
            .when(col("o_orderkey") % 10 < 9, "validation")
            .otherwise("test"))
        .groupBy("bucket").agg(count(lit(1)).as("n_orders"),
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price")),
      Some("""SELECT CASE WHEN o_orderkey % 10 < 8 THEN 'train'
                          WHEN o_orderkey % 10 < 9 THEN 'validation'
                          ELSE 'test' END AS bucket,
              count(*) AS n_orders,
              cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS sum_price
              FROM orders GROUP BY 1""")),

    // ---- O2/O3: stratified sampling, made reproducible: the random
    // order is md5-of-key (engine-independent), n=3 per stratum — the
    // reference's groupby().sample(n=3, random_state=42) without
    // engine-specific RNG state.
    Q("o3_stratified_sample",
      (s, d) => {
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
          .select(col("c_custkey"), col("c_mktsegment"), col("rn").cast("bigint").as("rn"))
      },
      Some("""SELECT c_custkey, c_mktsegment, cast(rn as bigint) AS rn FROM (
                SELECT c_custkey, c_mktsegment, row_number() OVER (
                  PARTITION BY c_mktsegment
                  ORDER BY md5(cast(c_custkey as varchar)), c_custkey) AS rn
                FROM customer) WHERE rn <= 3""")),

    // ---- Weighted corpus mixing — the domain-reweighting sampler a
    // pretraining pipeline runs over source mixtures: keep each row
    // with a per-source rate, decided by an md5 hex-prefix threshold
    // (first nibble < 'c' ⇔ rate 0.75, '8' ⇔ 0.5, '4' ⇔ 0.25) — the
    // same engine-neutral determinism trick as o3, scan-level filter,
    // reproducible across runs and engines.
    Q("o8_weighted_mix",
      (s, d) => Tables.documents(s, d)
        .withColumn("thr", expr(
          "CASE lang WHEN 'de' THEN 'c' WHEN 'fr' THEN '8' WHEN 'it' THEN '4' ELSE 'g' END"))
        .where(substring(md5(col("doc_id").cast("string")), 1, 1) < col("thr"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").cast("bigint").as("sum_chars")),
      Some("""SELECT lang, count(*) AS n_docs, cast(sum(n_chars) as bigint) AS sum_chars
              FROM documents
              WHERE substr(md5(cast(doc_id as varchar)), 1, 1) <
                CASE lang WHEN 'de' THEN 'c' WHEN 'fr' THEN '8'
                          WHEN 'it' THEN '4' ELSE 'g' END
              GROUP BY 1""")),

    // ---- Schema-reconciling multi-source union (the ingestion-side
    // dual of u7's on-disk evolution): two sources disagree on columns
    // — one carries n_chars, the other a crawl_batch tag the first
    // lacks. `unionByName(allowMissingColumns = true)` aligns by NAME
    // (never position) and null-fills both directions; a positional
    // UNION would silently misalign or reject. Pure map-side concat —
    // no shuffle.
    Q("u8_union_by_name",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val a = docs.where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"),
            col("n_chars").cast("bigint").as("n_chars"),
            lit("archive").as("origin"))
        val b = docs.where(col("doc_id") % 2 =!= 0)
          .select(col("doc_id"), col("lang"), lit("crawl").as("origin"),
            (col("doc_id") % 7).as("crawl_batch"))
        a.unionByName(b, allowMissingColumns = true)
          .select("doc_id", "lang", "n_chars", "origin", "crawl_batch")
      },
      Some("""SELECT doc_id, lang, n_chars::BIGINT AS n_chars,
                'archive' AS origin, NULL::BIGINT AS crawl_batch
              FROM documents WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id, lang, NULL, 'crawl', doc_id % 7
              FROM documents WHERE doc_id % 2 <> 0""")),

    // ---- CONTENT-HASH split assignment (the split rule that survives
    // re-crawls): membership derives from md5 of the CONTENT, not the
    // doc id — when a later snapshot re-ingests the same text under a
    // new id, it lands in the SAME split, and exact duplicates can
    // never straddle train/test (the gate computes that straddle count
    // and states it: 0 by construction). 80/10/10 via hash-bucket
    // modulo; one scan + one tiny fingerprint-level aggregate.
    Q("o12_content_hash_split",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("fp", md5(col("text")))
          .withColumn("split", ContentSplits.splitCol(col("text")))
        val leaked = docs.groupBy("fp")
          .agg(countDistinct("split").as("ns")).where(col("ns") > 1)
          .agg(count(lit(1)).as("n_leaked_fingerprints"))
        docs.groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct("fp").as("n_distinct_texts"))
          .crossJoin(broadcast(leaked))
      },
      Some(s"""WITH t AS (SELECT md5(text) AS fp,
                ${ContentSplits.duckSplit("text")} AS split
              FROM documents),
              leaked AS (SELECT count(*) AS n_leaked_fingerprints FROM (
                SELECT fp FROM t GROUP BY fp HAVING count(DISTINCT split) > 1))
              SELECT split, count(*) AS n_docs,
                count(DISTINCT fp) AS n_distinct_texts,
                (SELECT n_leaked_fingerprints FROM leaked) AS n_leaked_fingerprints
              FROM t GROUP BY 1""")),

    // ---- TEMPERATURE-weighted source mixing (the data-mixing step a
    // multilingual/multi-domain pretraining run computes, not hand-
    // tunes): per-source keep rates DERIVE from corpus counts via the
    // exponential-smoothing rule rate_l = (n_min/n_l)^(1/2) (α = 0.5 —
    // the smallest source keeps everything, larger sources are
    // downsampled toward balance). The count pass is a tiny aggregate
    // (one row per source, broadcast back); the sampling decision is
    // the same engine-neutral md5-uniform threshold as o8 — u =
    // int(md5[0:8])/2^32 < rate — so runs are reproducible across
    // engines and restarts, and the corpus pays one scan-level filter.
    Q("o10_temperature_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_total"))
        val nmin = counts.agg(min("n_total").as("n_min"))
        val rates = counts.crossJoin(broadcast(nmin))
          .withColumn("rate", sqrt(col("n_min").cast("double") / col("n_total")))
          .select("lang", "n_total", "rate")
        docs.join(broadcast(rates), "lang")
          .where(expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 8), 16, 10) as bigint)")
            / lit(4294967296.0) < col("rate"))
          .groupBy("lang")
          .agg(max("n_total").as("n_total"),
            round(max("rate"), 6).as("rate"),
            count(lit(1)).as("n_sampled"))
      },
      Some("""WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY 1),
              r AS (SELECT lang, n_total,
                      sqrt(CAST((SELECT min(n_total) FROM c) AS DOUBLE) / n_total) AS rate
                    FROM c),
              kept AS (SELECT d.lang FROM documents d JOIN r USING (lang)
                       WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                             / 4294967296.0 < r.rate)
              SELECT r.lang, r.n_total, round(r.rate, 6) AS rate,
                     count(*) AS n_sampled
              FROM kept JOIN r USING (lang)
              GROUP BY r.lang, r.n_total, r.rate""")),

    // ---- SEEDED EPOCH SHUFFLE (o13): the training-loader's global
    // reshuffle, computed ONCE per epoch as data instead of at read
    // time — every doc gets a dense 1-based position in a permutation
    // that is (a) deterministic in (seed, doc_id) — reproducible across
    // engines, restarts, and partitionings, (b) different per seed, and
    // (c) computed DISTRIBUTED: sort key = md5(seed || doc_id), ranked
    // by GlobalRank's range-exchange + broadcast-offset plan, so no
    // single-partition window ever sees the corpus (the naive
    // row_number() OVER (ORDER BY …) funnels 100 TB through one task).
    // The doc_id tiebreaker makes the order total without relying on
    // hash uniqueness.
    Q("o13_seeded_shuffle",
      (s, d) => {
        val keyed = Tables.documents(s, d).select(col("doc_id"))
          .withColumn("k",
            md5(concat(lit("epoch7:"), col("doc_id").cast("string"))))
        graft.operators.GlobalRank
          .withGlobalRank(keyed, Seq(col("k"), col("doc_id")), "pos")
          .select(col("doc_id"), col("pos"))
      },
      Some("""SELECT doc_id,
                row_number() OVER (
                  ORDER BY md5('epoch7:' || doc_id), doc_id) AS pos
              FROM documents""")),

    // ---- O14: WEIGHTED sampling without replacement (lottery
    // scheme): each doc gets `w` deterministic md5 tickets and its
    // priority is the BEST (minimum) ticket — the doc-level priority
    // is distributed as the min of w iid uniforms, so higher-weight
    // docs win proportionally more of the top-k, and the whole draw
    // is exact integer/string arithmetic (no pow/ln whose libm
    // rounding could diverge across engines). Tickets are map-only
    // per row; the top-100 is ORDER BY + LIMIT, which Spark plans as
    // TakeOrderedAndProject — per-partition heaps merged at the
    // driver, never a global sort. At 100 TB the same plan holds: k
    // rows per partition flow to the driver, nothing else moves.
    Q("o14_weighted_lottery",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(col("lang") === "de", 3L).when(col("lang") === "fr", 2L)
            .otherwise(1L).as("w"))
        .withColumn("ticket", array_min(expr(
          "transform(sequence(1L, w), j -> " +
            "md5(concat(cast(doc_id as string), ':', cast(j as string))))")))
        .orderBy(col("ticket"))
        .limit(100),
      Some("""WITH base AS (SELECT doc_id, lang,
                CASE lang WHEN 'de' THEN 3 WHEN 'fr' THEN 2 ELSE 1 END
                  ::BIGINT AS w
              FROM documents),
              t AS (SELECT doc_id, lang, w,
                list_aggregate(list_transform(range(1, w + 1),
                  j -> md5(doc_id::VARCHAR || ':' || j::VARCHAR)), 'min')
                  AS ticket
              FROM base)
              SELECT doc_id, lang, w, ticket FROM t
              ORDER BY ticket LIMIT 100""")),

    // ---- O15: DSIR-style importance selection — score every doc by
    // how much more likely its tokens are under a TARGET distribution
    // (the trusted de-language slice) than under the raw pool, and
    // keep the top-50. Features are md5-HASHED token buckets (4096),
    // the published DSIR move that makes the model FIXED-SIZE: the
    // per-bucket log-likelihood-ratio table is 4096 rows broadcast to
    // every executor no matter how large the corpus, so scoring is one
    // map-side join over (doc, bucket) term frequencies. Float
    // discipline is t30's: each log is rounded to 6 decimals and cast
    // to DECIMAL so the cross-engine libm agreement is at a scale
    // rounding absorbs, then all summation is decimal-exact and
    // order-independent; the top-50 orders by the EXACT decimal score
    // before the final double cast.
    Q("o15_dsir_select",
      (s, d) => dsirSelect(s, d,
        dsirCounts(Tables.documents(s, d))),
      Some("""WITH tok AS (SELECT doc_id, lang,
                CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 4096 AS b
              FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
                    FROM documents)),
              cr AS (SELECT b, count(*) AS cr FROM tok GROUP BY 1),
              ct AS (SELECT b, count(*) AS ct FROM tok WHERE lang = 'de' GROUP BY 1),
              n AS (SELECT count(*) AS nr,
                      count(*) FILTER (lang = 'de') AS nt FROM tok),
              model AS (SELECT cr.b,
                  round(ln((coalesce(ct.ct, 0) + 1) / (n.nt + 4096)), 6)::DECIMAL(18,6)
                - round(ln((cr.cr + 1) / (n.nr + 4096)), 6)::DECIMAL(18,6) AS llr
                FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN n),
              tf AS (SELECT doc_id, b, count(*) AS tf FROM tok GROUP BY 1, 2),
              w AS (SELECT doc_id, sum(llr * tf::DECIMAL(10,0)) AS wsum,
                      sum(tf) AS ntok
                    FROM tf JOIN model USING (b) GROUP BY 1)
              SELECT d.doc_id, d.lang,
                wsum::DOUBLE / ntok::DOUBLE AS weight
              FROM w JOIN documents d USING (doc_id)
              ORDER BY weight DESC, d.doc_id LIMIT 50""")),

    // ---- DSIR model AS-OF (o17): the model generations were
    // committed (e29) and drift-gated (e31) but not ADDRESSABLE — a
    // training snapshot could not pin which model selected it. The
    // additive layout makes a past model a subset union of partials
    // (gen ≤ b merged), exactly the d23/s18/t32 discipline; the
    // contract column asserts the at-head model equals the
    // generation-blind merge AND that compaction advances a horizon
    // the pre-fold snapshot refuses past. Oracle: o15's selection
    // under the model fit on batch 0's world only (even docs),
    // scored over the full corpus, batch-blind.
    Q("o17_dsir_model_asof",
      (s, d) => {
        val dir = Scratch.dir("graft_o17_").toString + "/counts"
        val docs = Tables.documents(s, d)
        graft.sources.Sinks.committedAppend(
          dsirCounts(docs.where(col("doc_id") % 2 === 0)), dir, 0L)
        graft.sources.Sinks.committedAppend(
          dsirCounts(docs.where(col("doc_id") % 2 === 1)), dir, 1L)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        def modelAsOf(g: Long): DataFrame = {
          for (m <- graft.sources.Sinks.maxFoldedGen(fs, dir) if m > g)
            throw new IllegalStateException(
              s"as-of gen $g predates the compaction horizon $m of $dir — " +
                "folded model partials are not reconstructible; snapshot " +
                "before compacting or keep more history")
          s.read.parquet(dir).where(col("gen") <= lit(g.toInt))
            .groupBy("b").agg(sum("cr").as("cr"), sum("ct").as("ct"))
        }
        // the snapshot selection — materialized before the fold below
        val outDir = Scratch.dir("graft_o17_out_").resolve("sel").toString
        dsirSelect(s, d, modelAsOf(0L)).write.parquet(outDir)
        // at-head ≡ generation-blind: equal COUNTS relations imply
        // equal models and selections (cheap 4096-row compare)
        val blind = s.read.parquet(dir).groupBy("b")
          .agg(sum("cr").as("cr"), sum("ct").as("ct"))
        val headConsistent = modelAsOf(1L).unionByName(blind)
          .groupBy("b", "cr", "ct").count()
          .where(col("count") =!= 2).isEmpty
        graft.sources.Sinks.compactGenerations(s, dir, None)
        val loud =
          try { modelAsOf(0L); false }
          catch { case _: IllegalStateException => true }
        s.read.parquet(outDir)
          .withColumn("asof_contract", lit(headConsistent && loud))
      },
      Some("""WITH tok AS (SELECT doc_id, lang,
                CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 4096 AS b
              FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
                    FROM documents)),
              etok AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
              cr AS (SELECT b, count(*) AS cr FROM etok GROUP BY 1),
              ct AS (SELECT b, count(*) AS ct FROM etok WHERE lang = 'de' GROUP BY 1),
              n AS (SELECT count(*) AS nr,
                      count(*) FILTER (lang = 'de') AS nt FROM etok),
              model AS (SELECT cr.b,
                  round(ln((coalesce(ct.ct, 0) + 1) / (n.nt + 4096)), 6)::DECIMAL(18,6)
                - round(ln((cr.cr + 1) / (n.nr + 4096)), 6)::DECIMAL(18,6) AS llr
                FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN n),
              tf AS (SELECT doc_id, b, count(*) AS tf FROM tok GROUP BY 1, 2),
              w AS (SELECT doc_id, sum(llr * tf::DECIMAL(10,0)) AS wsum,
                      sum(tf) AS ntok
                    FROM tf JOIN model USING (b) GROUP BY 1)
              SELECT d.doc_id, d.lang,
                wsum::DOUBLE / ntok::DOUBLE AS weight, TRUE AS asof_contract
              FROM w JOIN documents d USING (doc_id)
              ORDER BY weight DESC, d.doc_id LIMIT 50""")),

    // ---- INCREMENTAL DSIR scoring (o18): e31's refresh re-scored the
    // CORPUS — correct, but corpus-linear per refresh. The per-doc
    // score partials (wsum decimal, ntok) are themselves additive
    // facts that never change while the model is fixed, so each batch
    // tokenizes and scores ONLY ITS OWN docs against the broadcast
    // model and lands the partials under the committed-generation
    // protocol (batch 1's replay is DRIVEN and must skip — a landed
    // replay double-selects every odd doc); the selection is a top-50
    // over the merged persisted partials, BIT-IDENTICAL to the
    // monolithic re-score because dsirScore is one function and
    // decimal wsum parquet-round-trips exactly —
    // `incremental_consistent` asserts it in-gate against the full
    // dsirSelect. The refresh-step economics (score one batch vs
    // re-score the corpus) are pinned in tools.DsirRefreshProbe.
    Q("o18_dsir_incremental_score",
      (s, d) => {
        val dir = Scratch.dir("graft_o18_").toString + "/scores"
        val docs = Tables.documents(s, d)
        val frozen = dsirCounts(docs.where(col("doc_id") % 2 === 0))
        val model = dsirModel(frozen)
        graft.sources.Sinks.committedAppend(
          dsirScore(docs.where(col("doc_id") % 2 === 0), model), dir, 0L)
        graft.sources.Sinks.committedAppend(
          dsirScore(docs.where(col("doc_id") % 2 === 1), model), dir, 1L)
        // driven replay of batch 1: exactly-once or the hash fails
        graft.sources.Sinks.committedAppend(
          dsirScore(docs.where(col("doc_id") % 2 === 1), model), dir, 1L)
        val sel = s.read.parquet(dir)
          .select("doc_id", "wsum", "ntok")
          .join(docs.select("doc_id", "lang"), "doc_id")
          .withColumn("weight",
            col("wsum").cast("double") / col("ntok").cast("double"))
          .orderBy(col("weight").desc, col("doc_id"))
          .limit(50)
          .select("doc_id", "lang", "weight")
        val consistent = sel.unionByName(dsirSelect(s, d, frozen))
          .groupBy("doc_id", "lang", "weight").count()
          .where(col("count") =!= 2).isEmpty
        sel.withColumn("incremental_consistent", lit(consistent))
      },
      Some("""WITH tok AS (SELECT doc_id, lang,
                CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % 4096 AS b
              FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
                    FROM documents)),
              etok AS (SELECT * FROM tok WHERE doc_id % 2 = 0),
              cr AS (SELECT b, count(*) AS cr FROM etok GROUP BY 1),
              ct AS (SELECT b, count(*) AS ct FROM etok WHERE lang = 'de' GROUP BY 1),
              n AS (SELECT count(*) AS nr,
                      count(*) FILTER (lang = 'de') AS nt FROM etok),
              model AS (SELECT cr.b,
                  round(ln((coalesce(ct.ct, 0) + 1) / (n.nt + 4096)), 6)::DECIMAL(18,6)
                - round(ln((cr.cr + 1) / (n.nr + 4096)), 6)::DECIMAL(18,6) AS llr
                FROM cr LEFT JOIN ct ON cr.b = ct.b CROSS JOIN n),
              tf AS (SELECT doc_id, b, count(*) AS tf FROM tok GROUP BY 1, 2),
              w AS (SELECT doc_id, sum(llr * tf::DECIMAL(10,0)) AS wsum,
                      sum(tf) AS ntok
                    FROM tf JOIN model USING (b) GROUP BY 1)
              SELECT d.doc_id, d.lang,
                wsum::DOUBLE / ntok::DOUBLE AS weight,
                TRUE AS incremental_consistent
              FROM w JOIN documents d USING (doc_id)
              ORDER BY weight DESC, d.doc_id LIMIT 50""")),

    // ---- O16: EXACT-TOTAL stratified sampling via largest-remainder
    // apportionment — o3 takes a fixed n per stratum; real eval-set
    // construction asks for "exactly k rows overall, proportional by
    // stratum", and naive floor quotas under-fill. Quotas are the
    // Hamilton method in exact integers: base = ⌊k·n_s/N⌋, the k−Σbase
    // deficit goes to the largest remainders (ties → stratum name).
    // The quota table is #strata rows (the only windows run over it
    // and over per-stratum hash ranks); membership is the same
    // engine-neutral md5 rank as o3, joined against the broadcast
    // quota. Oracle restates the apportionment with identical integer
    // arithmetic and tie-breaks.
    Q("o16_quota_stratified",
      (s, d) => {
        val k = 100L
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
        val sizes = cust.groupBy("c_mktsegment").agg(count(lit(1)).as("ns"))
        val tot = sizes.agg(sum("ns").as("n"))
        val q0 = sizes.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"CAST(($k * ns) DIV n AS BIGINT)"))
          .withColumn("rem", expr(s"($k * ns) % n"))
        val baseSum = q0.agg(sum("base").as("bsum"))
        val quotas = q0.crossJoin(broadcast(baseSum))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("c_mktsegment"))))
          .withColumn("quota", col("base") +
            when(col("rk") <= lit(k) - col("bsum"), 1L).otherwise(0L))
          .select("c_mktsegment", "quota")
        val w = Window.partitionBy("c_mktsegment")
          .orderBy(md5(col("c_custkey").cast("string")), col("c_custkey"))
        cust.withColumn("rn", row_number().over(w))
          .join(broadcast(quotas), "c_mktsegment")
          .where(col("rn") <= col("quota"))
          .select(col("c_custkey"), col("c_mktsegment"),
            col("rn").cast("bigint").as("rn"))
      },
      Some("""WITH sz AS (SELECT c_mktsegment, count(*) AS ns
                          FROM customer GROUP BY 1),
              n AS (SELECT sum(ns) AS n FROM sz),
              q0 AS (SELECT c_mktsegment, ns,
                       (100 * ns) // n AS base, (100 * ns) % n AS rem
                     FROM sz CROSS JOIN n),
              b AS (SELECT sum(base) AS bsum FROM q0),
              qt AS (SELECT c_mktsegment,
                       base + CASE WHEN row_number() OVER (
                           ORDER BY rem DESC, c_mktsegment) <= 100 - bsum
                         THEN 1 ELSE 0 END AS quota
                     FROM q0 CROSS JOIN b),
              r AS (SELECT c_custkey, c_mktsegment, row_number() OVER (
                      PARTITION BY c_mktsegment
                      ORDER BY md5(cast(c_custkey as varchar)), c_custkey) AS rn
                    FROM customer)
              SELECT r.c_custkey, r.c_mktsegment, cast(r.rn as bigint) AS rn
              FROM r JOIN qt USING (c_mktsegment)
              WHERE r.rn <= qt.quota""")),

    // ---- A25: TOP-K PER GROUP — the classic rank-filter, written as
    // the declarative row_number ≤ 3 so Catalyst's WindowGroupLimit
    // kicks in: each partition keeps a bounded per-group heap BEFORE
    // the shuffle and the full sort never materializes (plan-asserted
    // in PlanShapeSpec) — the difference between "sort the corpus per
    // group" and "carry 3 rows per group" at 100 TB.
    Q("a25_topk_per_group",
      (s, d) => {
        val w = Window.partitionBy("s_nationkey")
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
        Tables.supplier(s, d)
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select(col("s_nationkey").cast("bigint").as("s_nationkey"),
            col("s_suppkey").cast("bigint").as("s_suppkey"),
            col("s_acctbal").cast("double").as("s_acctbal"),
            col("rk").cast("bigint").as("rk"))
      },
      Some("""SELECT cast(s_nationkey as bigint) AS s_nationkey,
                cast(s_suppkey as bigint) AS s_suppkey,
                cast(s_acctbal as double) AS s_acctbal,
                cast(rk as bigint) AS rk
              FROM (SELECT s_nationkey, s_suppkey, s_acctbal, row_number() OVER (
                      PARTITION BY s_nationkey
                      ORDER BY s_acctbal DESC, s_suppkey) AS rk
                    FROM supplier) WHERE rk <= 3""")),

    // ---- O4: random-label sample submission (kaggle variant in the
    // reference) — deterministic label pick via md5-hash bucketing.
    Q("o4_sample_submission",
      (s, d) => Tables.customer(s, d)
        .select(col("c_custkey"),
          element_at(
            expr("array('approval', 'dismissal')"),
            (pmod(expr("conv(substring(md5(cast(c_custkey as string)), 1, 8), 16, 10)").cast("bigint"),
              lit(2)) + 1).cast("int")).as("predicted_label")),
      Some("""SELECT c_custkey,
                (['approval', 'dismissal'])[
                  CAST(CAST(('0x' || substr(md5(cast(c_custkey as varchar)), 1, 8)) AS BIGINT) % 2 AS INT) + 1
                ] AS predicted_label
              FROM customer""")),

    // ---- F26: date-part scalars (year/quarter/month/isodow).
    Q("f26_date_parts",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("bigint").as("o_year"),
        quarter(col("o_orderdate")).cast("bigint").as("o_quarter"),
        month(col("o_orderdate")).cast("bigint").as("o_month"),
        (weekday(col("o_orderdate")) + 1).cast("bigint").as("o_isodow")),
      Some("""SELECT o_orderkey, cast(year(o_orderdate) as bigint) AS o_year,
              cast(quarter(o_orderdate) as bigint) AS o_quarter,
              cast(month(o_orderdate) as bigint) AS o_month,
              cast(isodow(o_orderdate) as bigint) AS o_isodow FROM orders""")),

    // ---- K20: INCREMENTAL MATERIALIZED VIEW — the aggregate face of
    // the incremental tier (d13 is the dedup face, t27 the index
    // face): a per-customer revenue view maintained by folding each
    // arriving batch's PARTIAL aggregate into the crash-atomic
    // generational store ([[graft.sources.Sinks.committedAppend]]),
    // never recomputing from the base table. Sum/count are
    // self-mergeable, so partial-of-batch + merge-on-read is EXACTLY
    // the full recompute — which is what the oracle restates, making
    // the gate a real algebraic-identity check, not a tautology.
    //
    // The gate drives the full lifecycle: 4 batches append partials →
    // batch 1 is REDELIVERED (the store's gen marker makes it a pure
    // skip — asserted) → compaction folds the generations to one
    // (asserted via dir listing: exactly gen=-1 remains) → batch 1 is
    // redelivered AGAIN post-fold (the manifest tier keeps it a skip
    // even though its gen dir is gone — asserted) → the view reads
    // merged partials. Any failed skip double-counts and breaks the
    // oracle hash, so idempotence is hash-gated, not just require()d.
    //
    // 100 TB shape: each batch shuffles only ITS OWN rows (map-side
    // combine to ≤1 row per key per batch); the view read merges
    // #keys × #gens partial rows — corpus-size-independent — and
    // compaction bounds #gens, so neither write nor read cost grows
    // with the accumulated base table. Decimal discipline: partials
    // accumulate in decimal(12,2)-widened sums (exact, order-free),
    // double only at the output edge.
    Q("k20_incremental_matview",
      (s, d) => {
        val out = Scratch.dir("graft_k20_").resolve("mv").toString
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        def partial(b: Long): DataFrame = orders
          .where(pmod(col("o_orderkey"), lit(4)) === b)
          .groupBy("o_custkey")
          .agg(sum(dec(col("o_totalprice"))).as("sp"),
            count(lit(1)).as("cnt"))
        for (b <- 0L to 3L)
          require(graft.sources.Sinks.committedAppend(partial(b), out, b),
            s"fresh batch $b must land")
        require(!graft.sources.Sinks.committedAppend(partial(1L), out, 1L),
          "pre-fold redelivery of batch 1 must be a pure skip")
        graft.sources.Sinks.compactGenerations(s, out, None)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          s.sparkContext.hadoopConfiguration)
        val gens = fs.listStatus(new org.apache.hadoop.fs.Path(out))
          .map(_.getPath.getName).filter(_.startsWith("gen=")).toSeq
        require(gens == Seq("gen=-1"),
          s"compaction must fold to exactly gen=-1, saw $gens")
        require(!graft.sources.Sinks.committedAppend(partial(1L), out, 1L),
          "post-fold redelivery of batch 1 must skip via the manifest tier")
        s.read.parquet(out)
          .groupBy("o_custkey")
          .agg(sum("cnt").as("n_orders"),
            sum("sp").cast("double").as("sum_price"))
      },
      Some("""SELECT o_custkey, count(*) AS n_orders,
                     cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS sum_price
              FROM orders GROUP BY 1""")),

    // ---- K21: matview RETRACTION — the delete face of k20, by the
    // same additive trick t29 uses for the BM25 index: deleting rows
    // appends a batch of NEGATIVE partials (-count, -sum) computed
    // from ONLY the deleted rows — the base table is never rescanned,
    // and the merged view then describes exactly the survivors.
    // Sum/count retract cleanly because they are group-invertible
    // (min/max are NOT — a min-bearing view would need k20's full
    // recompute of the affected keys; the view picks its aggregates
    // to match its maintenance story). The sharp edge is the
    // EMPTY GROUP: a customer whose every order is retracted merges to
    // cnt=0 and must be DROPPED, not emitted as a zero row — the
    // delete predicate includes `o_custkey % 97 = 0` (whole customers
    // vanish) precisely so that filter is hash-load-bearing against
    // the oracle's recompute over survivors (which has no such
    // groups). A redelivered retraction would double-subtract; the
    // gate replays it and asserts the generational skip.
    Q("k21_matview_retract",
      (s, d) => {
        val out = Scratch.dir("graft_k21_").resolve("mv").toString
        val orders = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        // every batch must write ONE schema: the × sign widens the
        // decimal, so pin sp back to sum's own decimal(22,2) (negated
        // partials fit by construction — negation never adds digits)
        def partial(df: DataFrame, sign: Int): DataFrame = df
          .groupBy("o_custkey")
          .agg((sum(dec(col("o_totalprice"))) * sign)
            .cast("decimal(22,2)").as("sp"),
            (count(lit(1)) * sign).as("cnt"))
        for (b <- 0L to 1L)
          require(graft.sources.Sinks.committedAppend(
            partial(orders.where(pmod(col("o_orderkey"), lit(2)) === b), 1),
            out, b), s"base batch $b must land")
        val deleted = orders.where(
          col("o_orderkey") % 7 === 0 || col("o_custkey") % 97 === 0)
        require(graft.sources.Sinks.committedAppend(partial(deleted, -1), out, 2L),
          "retraction batch must land")
        require(!graft.sources.Sinks.committedAppend(partial(deleted, -1), out, 2L),
          "redelivered retraction must skip — a double-subtract corrupts the view")
        val merged = s.read.parquet(out)
          .groupBy("o_custkey")
          .agg(sum("cnt").as("n_orders"),
            sum("sp").cast("double").as("sum_price"))
        // the documented edge must actually OCCUR, or the drop filter
        // below is vacuously green (16 such customers at sf0.01)
        require(merged.where(col("n_orders") === 0).limit(1).count() == 1L,
          "fixture must produce at least one fully-retracted customer")
        merged.where(col("n_orders") > 0)
      },
      Some("""SELECT o_custkey, count(*) AS n_orders,
                     cast(sum(cast(o_totalprice as decimal(12,2))) as double) AS sum_price
              FROM orders
              WHERE NOT (o_orderkey % 7 = 0 OR o_custkey % 97 = 0)
              GROUP BY 1""")),

    // ---- K22: CDC CHANGELOG APPLY (MERGE INTO semantics) — the
    // ingestion shape every warehouse-fed corpus store needs: a
    // snapshot table plus an (op, seq, payload) changelog collapse to
    // the post-merge state. Latest op per key wins (row_number over
    // seq desc — the changelog-sized shuffle, never the snapshot),
    // then ONE full-outer join applies it: U rewrites the payload, I
    // lands keys the snapshot lacks, D drops the key, untouched keys
    // pass through. The fixture interleaves deliberately: %10 keys get
    // TWO updates (latest-wins is hash-load-bearing — applying seq 1
    // would emit '_u1'), %7 keys a delete at the highest seq (so
    // %70 keys prove D beats earlier Us), %13 keys an insert under a
    // fresh key. 100 TB: the join co-partitions on the key (bucketed
    // snapshots make it exchange-free per k12); cost tracks
    // snapshot + changelog, with no per-op row churn.
    Q("k22_cdc_apply",
      (s, d) => {
        val snap = Tables.customer(s, d).select(col("c_custkey"), col("c_name"))
        def slice(m: Int) = snap.where(col("c_custkey") % m === 0)
        val log = slice(10)
          .select(col("c_custkey"), lit("U").as("op"),
            concat(col("c_name"), lit("_u1")).as("new_name"), lit(1L).as("seq"))
          .unionByName(slice(10).select(col("c_custkey"), lit("U").as("op"),
            concat(col("c_name"), lit("_u2")).as("new_name"), lit(2L).as("seq")))
          .unionByName(slice(7).select(col("c_custkey"), lit("D").as("op"),
            lit(null).cast("string").as("new_name"), lit(3L).as("seq")))
          .unionByName(slice(13).select(
            (col("c_custkey") + 1000000L).as("c_custkey"), lit("I").as("op"),
            concat(col("c_name"), lit("_new")).as("new_name"), lit(1L).as("seq")))
        val latest = log
          .withColumn("rn", row_number().over(
            Window.partitionBy("c_custkey").orderBy(col("seq").desc)))
          .where(col("rn") === 1)
          .select(col("c_custkey"), col("op"), col("new_name"))
        snap.join(latest, Seq("c_custkey"), "full_outer")
          .where(coalesce(col("op"), lit("")) =!= "D")
          .select(col("c_custkey").cast("bigint").as("c_custkey"),
            coalesce(col("new_name"), col("c_name")).as("c_name"))
      },
      Some("""SELECT c_custkey::BIGINT AS c_custkey,
                     CASE WHEN c_custkey % 10 = 0 THEN c_name || '_u2'
                          ELSE c_name END AS c_name
              FROM customer WHERE c_custkey % 7 <> 0
              UNION ALL
              SELECT (c_custkey + 1000000)::BIGINT, c_name || '_new'
              FROM customer WHERE c_custkey % 13 = 0""")),
  )
}
