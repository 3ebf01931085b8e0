package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Physical-plan discipline: the properties that matter at 100 TB,
  * asserted on the actual executed plans so a regression (a broadcast
  * silently becoming a shuffle join, a filter no longer pushing into the
  * scan) fails the build — not just the bench.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("j1 snowflake joins broadcast the dimension tables") {
    val p = plan("j1_snowflake_join")
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "dims must not shuffle the fact side")
  }

  test("a1 grouped agg does map-side partial aggregation") {
    val p = plan("a1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p.take(800))
  }

  test("a1 ship-date filter pushes into the parquet scan") {
    val p = plan("a1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      p.take(1200))
  }

  test("top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("w2_top25_parts_by_revenue")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("column pruning reaches the scan (2-col projection reads 2 cols)") {
    val df = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      scan.take(800))
  }

  test("as-of join is a single shuffle, no nested-loop join") {
    val p = plan("j10_asof_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of must use the union-sort rewrite, not a pair blowup: " + p.take(800))
  }

  test("semi/anti joins plan as joins, not filters-with-subquery") {
    assert(plan("j12_anti_join").contains("LeftAnti"))
    assert(plan("j15_semi_join").contains("LeftSemi"))
    // the nonzero-result variant must ALSO push its price filter into
    // the right-side scan, not evaluate it post-join
    val j16 = plan("j16_anti_join_filtered")
    assert(j16.contains("LeftAnti"), j16.take(600))
    assert(j16.contains("GreaterThan(o_totalprice"), "filter must reach the scan: " + j16.take(1200))
  }

  test("whole-stage codegen covers the exact-dedup path") {
    // (d4_simhash uses higher-order lambdas, which Catalyst evaluates
    // outside codegen; the hash-agg dedup path must stay codegen'd).
    // AQE finalizes the plan only on execution, so run it first.
    val df = SparkEntry.queries("d1_exact_dedup")(spark, sfDir)
    df.collect()
    // codegen'd operators render as "*(n) Op" in the final plan tree
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") || p.contains("*(2)"), p.take(800))
  }

  test("decontamination probes via broadcast semi-join, never a shuffle join") {
    val p = plan("d8_decontaminate")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p.take(1000))
    assert(!p.contains("SortMergeJoin"), "benchmark set must broadcast")
  }

  test("ntile dispatches adaptively: small gate input takes the one-task window") {
    // at this SF the customer table is far below the dispatch threshold,
    // so the plan must NOT pay the distributed machinery's fixed cost;
    // the large-input range-partitioning shape is pinned in GlobalRankSpec
    val p = plan("w3_ntile_quartiles")
    assert(!p.toLowerCase.contains("rangepartitioning"), p.take(1000))
    assert(p.contains("Window"), p.take(1000))
  }

  test("per-row tiers (langid, sentences, pdf incl. crypto) plan no Exchange") {
    for (name <- Seq("t10_langid_trigram", "t11_sentence_icu", "m3_pdf_text",
      "m4_pdf_secure", "m5_pdf_hostile", "m6_pdf_cid_fontcmap",
      "t19_pii_mask", "t21_overlap_chunks")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name should be map-only:\n${p.take(600)}")
    }
  }

  test("every oracle query analyzes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.nonEmpty, s"$name produced no schema")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() == 10)
  }

  test("creator e2e gates keep their scale shapes") {
    // doc2doc vocab top-k must be TakeOrderedAndProject, never a global
    // sort; the criticality e2e takes the cache-free ntile small path
    val x27 = plan("x27_doc2doc_e2e")
    assert(x27.contains("TakeOrderedAndProject"), x27.take(800))
    val x26 = plan("x26_criticality_e2e")
    assert(!x26.contains("InMemoryRelation") && !x26.contains("InMemoryTableScan"),
      "x26 must not pin a cache on plan handoff")
    // the §3.3 scan pushes its contains-predicate to the source
    val x31 = plan("x31_fi_summary")
    assert(x31.contains("PushedFilters") || x31.contains("Filter"), x31.take(400))
  }

  test("plan-handoff ntile queries pin no cache (w3/r5 small path)") {
    // these call sites hand their plan to the driver, so they cannot
    // try/finally-release; the size-adaptive dispatch must take the
    // cache-free window path at gate scale — no InMemoryRelation may
    // appear, and the storage registry must stay untouched by the action
    val before = spark.sparkContext.getPersistentRDDs.size
    for (name <- Seq("w3_ntile_quartiles", "r5_criticality_labels")) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      assert(!df.queryExecution.executedPlan.toString.contains("InMemoryRelation")
        && !df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
        s"$name must not pin a cache on plan handoff")
      df.count()
    }
    assert(spark.sparkContext.getPersistentRDDs.size <= before)
  }

  test("d11 bloom probe filters BEFORE the gram explode") {
    // the 100 TB shape: the stateless bloom-sketch probe must sit below
    // the Generate so the clean majority of the corpus never explodes;
    // the exact semi-join then sees candidates only
    val p = plan("d11_bloom_decontaminate")
    val lines = p.linesIterator.toSeq
    val genIdx = lines.indexWhere(_.contains("Generate explode"))
    val bloomIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("UDF(word_ngrams"))
    assert(genIdx >= 0 && bloomIdx >= 0, p.take(1200))
    // deeper in the printed tree = later index; the probe filter must be
    // BELOW (after) the Generate node in the tree dump
    assert(bloomIdx > genIdx, "bloom probe must run pre-explode: " + p.take(1200))
    assert(p.contains("LeftSemi"), "exact verify must stay a semi-join")
  }

  test("media decode tiers: one cores-repartition, then pure map (no agg shuffle)") {
    for (name <- Seq("m1_media_meta", "m8_audio_meta", "m9_image_features")) {
      val p = plan(name)
      assert(p.contains("Exchange RoundRobinPartitioning") || p.contains("roundrobin"),
        s"$name must repartition by cores for the CPU-bound codec loop: " + p.take(800))
      assert(!p.contains("HashAggregate") && !p.contains("SortMergeJoin"),
        s"$name must stay a per-row map after the repartition: " + p.take(800))
    }
  }

  test("s5 centroids slice the embedding before the explode (8 dims, not 64)") {
    // a dim filter above the Generate can't push below it; the slice must
    // sit inside the exploded expression so only 8 components are
    // generated and shuffled per row
    val p = plan("s5_label_centroids")
    assert(p.contains("slice"), "Generate input must be sliced pre-explode: " + p.take(1000))
    val filterAboveGenerate = p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("dim"))
    assert(!filterAboveGenerate, "no post-explode dim filter may remain: " + p.take(1000))
  }

  test("j18/j19 range joins bucket into an equi-join, never a nested loop") {
    for (name <- Seq("j18_range_join", "j19_window_lookup")) {
      val p = plan(name)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name: range predicate must ride the bucket equi-join as a residual: " + p.take(1000))
    }
  }

  test("k12 bucketed tables join WITHOUT a shuffle on either side") {
    // replicate the gate's write (tiny sf0.001 tables), then assert the
    // JOIN subtree alone: bucket metadata must satisfy the join's
    // distribution requirement — sorts are fine, exchanges are not
    val wh = java.nio.file.Files.createTempDirectory("graft_k12spec_").toString
    spark.sql("DROP TABLE IF EXISTS graft_k12s_orders")
    spark.sql("DROP TABLE IF EXISTS graft_k12s_customer")
    graft.sources.Tables.orders(spark, sfDir).write.bucketBy(8, "o_custkey")
      .option("path", s"$wh/o").mode("overwrite").saveAsTable("graft_k12s_orders")
    graft.sources.Tables.customer(spark, sfDir).write.bucketBy(8, "c_custkey")
      .option("path", s"$wh/c").mode("overwrite").saveAsTable("graft_k12s_customer")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_k12s_orders")
        .join(spark.table("graft_k12s_customer"),
          org.apache.spark.sql.functions.col("o_custkey") ===
            org.apache.spark.sql.functions.col("c_custkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed-by-join-key scans must co-locate — a shuffle defeats the " +
          "write-once/join-many contract: " + p.take(1200))
      assert(p.contains("SortMergeJoin"), p.take(600))
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("k15 ORC read pushes both predicates into the scan") {
    import org.apache.spark.sql.functions._
    val out = Scratch.dir("orc_push_").resolve("orc").toString
    graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .sortWithinPartitions("o_orderkey")
      .write.option("compression", "zlib").orc(out)
    val df = spark.read.orc(out)
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > lit(new java.math.BigDecimal("200000.00")))
    // FormattedMode: the plain toString truncates long PushedFilters lists
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters: [") &&
      p.contains("EqualTo(o_orderpriority,1-URGENT)") &&
      p.contains("GreaterThan(o_totalprice"),
      "ORC min/max skipping needs both predicates at the scan: " + p.take(1500))
  }

  test("hamming near-dup pairs: banded equi-join, never a nested loop or cartesian") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hashes = (1L to 200L).map(i => (i, (i * 2654435761L) & 0xFFFFFFFFFFFFL))
      .toDF("doc_id", "h")
    val p = graft.operators.HammingLSH
      .nearDupPairs(hashes, "doc_id", "h", bits = 48, bands = 4)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "the pair source must stay the (band, band_val) equi-join: " + p.take(800))
    // the exact popcount filter must run BEFORE the pair distinct (the
    // r7 ADVICE item): false candidates drop pre-shuffle
    assert(p.contains("HashAggregate"),
      "pair distinct expected to lower to HashAggregate: " + p.take(1200))
    val below = p.substring(p.indexOf("HashAggregate")) // distinct's agg
    assert(below.contains("bit_count"),
      "popcount must sit below the distinct aggregate: " + p.take(1200))
  }

  test("s15 staleness: IVF side joins broadcast on cell; only the 6-query side crosses") {
    val p = plan("s15_ivf_staleness")
    assert(p.contains("BroadcastHashJoin"), "cell probe must broadcast: " + p.take(800))
    assert(!p.contains("SortMergeJoin"),
      "neither search path may shuffle the corpus for 6 queries: " + p.take(800))
  }

  test("t26 BM25: query terms and corpus stats broadcast; top-20 is TakeOrdered") {
    val p = plan("t26_bm25_topk")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-20 must not be a full sort: " + p.take(800))
    assert(p.contains("BroadcastHashJoin"),
      "the 5-term query join must broadcast: " + p.take(800))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "tf/df aggregations must map-side combine: " + p.take(800))
  }

  test("zorder layouts write through ONE range exchange (linear and eqdepth)") {
    import org.apache.spark.sql.functions._
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").cast("long").as("a"),
        col("l_partkey").cast("long").as("b"))
    for (dir <- Seq("lin", "eq")) {
      val clustered =
        if (dir == "lin") graft.operators.ZOrder.clustered(li, "a", "b", 4)
        else graft.operators.ZOrder.clusteredEqDepth(li, "a", "b", 4, bins = 64)
      // the write-cost claim: the pre-write plan is exactly ONE
      // exchange (rangepartitioning on the interleaved code) — a
      // regression to a sort or an extra repartition would add one
      val wp = clustered.queryExecution.executedPlan.toString
      assert(wp.sliding("Exchange".length).count(_ == "Exchange") == 1 &&
        wp.contains("rangepartitioning"),
        s"$dir: layout must cost exactly one range exchange: " + wp.take(1200))
      val path = Scratch.dir(s"zplan_${dir}_").toString + "/t"
      clustered.write.parquet(path)
      // read back: predicates on either key must reach the parquet scan
      // (the layout's whole payoff is footer-stats skipping under them)
      val p = spark.read.parquet(path).where(col("b") < 100L)
        .queryExecution.executedPlan.toString
      assert(p.contains("PushedFilters: [IsNotNull(b), LessThan(b,100)]"),
        s"$dir: pruning predicate must push to the scan: " + p.take(1200))
    }
  }

  test("d24 set-similarity join: prefix equi-joins only, never a nested loop or cartesian") {
    val p = plan("d24_setsim_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the prefix-token equi-join: " + p.take(800))
    // the candidate distinct lowers to a HashAggregate with the integer
    // length cross-multiplication BELOW it — impossible-length pairs
    // are dropped before they shuffle into the distinct
    assert(p.contains("HashAggregate"),
      "candidate distinct expected to lower to HashAggregate: " + p.take(800))
    val below = p.substring(p.indexOf("HashAggregate"))
    assert(below.contains("least") && below.contains("greatest"),
      "length filter must sit below the candidate distinct: " + p.take(1200))
  }

  test("o14 weighted lottery: map-only tickets, top-100 is TakeOrderedAndProject") {
    val p = plan("o14_weighted_lottery")
    assert(p.contains("TakeOrderedAndProject"),
      "the draw must be a per-partition heap merge, not a global sort: " + p.take(800))
    assert(!p.contains("Exchange"),
      "ticket computation is per-row; nothing may shuffle: " + p.take(800))
  }

  test("d27 containment join: directed prefix equi-join, no nested loop, native merge verify") {
    val p = plan("d27_containment_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "candidates must come from the interned-id equi-join: " + p.take(800))
    assert(p.contains("sorted_intersect_size"),
      "verify must be the codegen'd sorted-merge, not array_intersect: " + p.take(1200))
  }

  test("o15 DSIR: the LLR model joins broadcast (fixed-size at any corpus scale)") {
    val p = plan("o15_dsir_select")
    assert(p.contains("BroadcastHashJoin"),
      "the 4096-row model must broadcast to the tf side: " + p.take(800))
    assert(p.contains("TakeOrderedAndProject"),
      "the top-50 must not be a global sort: " + p.take(800))
  }

  test("d25 SemDeDup: within-cell pairs via equi-join on cid, never all-pairs") {
    val p = plan("d25_semantic_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the pair source must stay the cell equi-join: " + p.take(800))
  }

  test("a25 rank filter lowers to WindowGroupLimit (bounded per-group heap, no full sort)") {
    val p = plan("a25_topk_per_group")
    assert(p.contains("WindowGroupLimit"),
      "row_number <= k must push a group limit below the window: " + p.take(1200))
  }

  test("d26 keep-best picks the rep via partial-aggregable max_by, not a window sort") {
    val p = plan("d26_keep_best")
    assert(!p.contains("Window"),
      "rep selection must be a groupBy max_by (partial agg), never a per-component window: "
        + p.take(1200))
    assert(p.contains("max_by") || p.contains("partial_max_by"),
      "expected the max_by aggregate in the rep pick: " + p.take(1200))
  }

  test("centroids-as-DataFrame assignment: routed equi-join + keyed window, no funnel") {
    // s24/d34's dumped PLANS are their materialized results (the
    // lifecycle pattern), so the scale shape of the DISTRIBUTED
    // assignment is machine-checked here on the inner frame: the fine
    // argmax must be an equi-JOIN keyed on the routed coarse cell
    // with the per-vector window HASH-PARTITIONED on the vector id —
    // never a single-partition window (the funnel the dist tier
    // exists to avoid), never a nested-loop pair source on the
    // matched leg
    import org.apache.spark.sql.functions._
    graft.GraftExtensions.registerNative(spark)
    val e = graft.operators.VectorOps
      .vecs(graft.sources.Tables.embeddings(spark, sfDir))
      .select("vec_id", "v", "nn")
    val fineCb = graft.operators.KMeansLite.fit(e, "vec_id", "v", 8, 1)
    val coarseCb = graft.operators.KMeansLite.fit(e, "vec_id", "v", 3, 1)
    def norms(cb: Seq[(Int, Array[Double])]) = cb.map { case (c, v) =>
      (c.toLong, v, v.map(x => x * x).sum) }
    val fineDf = spark.createDataFrame(
      java.util.Arrays.asList(norms(fineCb).map { case (c, v, n) =>
        org.apache.spark.sql.Row(c, v.toSeq, n) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("cn",
          org.apache.spark.sql.types.DoubleType))))
    val asg = graft.operators.VectorOps
      .ivfAssignHierDist(e, "vec_id", norms(coarseCb), fineDf)
    val p = asg.queryExecution.executedPlan.toString
    assert(p.contains("Window"), "expected the per-vector argmax window")
    // every physical Window line contains 'windowspecdefinition', so a
    // disjunct on it would be vacuous — assert the partition key itself
    assert(p.linesIterator.filter(_.contains("windowspecdefinition"))
        .forall(_.contains("windowspecdefinition(__aid")),
      "the argmax window must be keyed on the vector id: " + p.take(1500))
    assert(!p.contains("No Partition Defined"),
      "single-partition window funnel in the dist assignment")
    assert(p.contains("hashpartitioning(__aid") ||
      p.contains("hashpartitioning(__ccid"),
      "the fine argmax must hash-partition on the routed key or vector id: " +
        p.take(1500))
  }
}
