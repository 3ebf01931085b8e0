package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.VectorOps

/** The bucketed-cell IVF store layout (s26–s29): `cell_bucket =
  * cell % B` is the PARTITION key and `cell` a cell-sorted DATA column,
  * so directory count is bounded by B no matter how many cells exist —
  * the 100 TB replacement for the `cell=<id>` directory-per-cell
  * scheme that walls at ~10⁵ cells. These tests pin the two-level
  * prune from the EXECUTED plan (bucket partition prune + pushed
  * In(cell) filter), the cell-sort write contract that makes the
  * pushed filter a row-group min/max skip at production row-group
  * counts, the layout-marker contract, the fold's layout preservation,
  * and layout invisibility in served results (s26 == s20's oracle
  * family; same DuckDB hashes in CORRECTNESS).
  */
class BucketedIvfSpec extends SparkSpec {

  private def synthStore(dir: String, cells: Int, buckets: Int,
                         gen: Long = -1L, rows: Int = 3): Unit = {
    import spark.implicits._
    val df = (0 until cells * rows)
      .map(i => (i.toLong, (i % cells).toLong)).toDF("vec_id", "cell")
    VectorOps.committedBucketedCellAppend(df, dir, gen, buckets)
  }

  test("serve-shaped read: bucket partition prune + pushed cell filter, " +
       "directory count bounded by B at 200 cells") {
    import spark.implicits._
    val dir = Scratch.dir("bivf_prune_").resolve("ivf").toString
    synthStore(dir, cells = 200, buckets = 8)
    // 200 cells would be 200 directories under the flat layout; here
    // the generation holds at most B=8 bucket dirs
    val bucketDirs = new java.io.File(s"$dir/gen=-1").listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(bucketDirs.size <= 8 && bucketDirs.forall(_.startsWith("cell_bucket=")),
      s"expected <= 8 cell_bucket dirs, got $bucketDirs")
    // the serve shape: probed cells {3, 11} live in buckets {3 % 8, 11 % 8}
    val probed = Seq(3L, 11L)
    val bks = probed.map(c => (c % 8).toInt).distinct
    val served = spark.read.parquet(dir)
      .where(col("cell_bucket").isin(bks: _*))
      .where(col("cell").isin(probed: _*))
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("cell_bucket"),
      s"expected a partition filter on cell_bucket, got:\n$p")
    assert(p.contains("PushedFilters:") && p.contains("In(cell"),
      s"expected In(cell, ...) pushed into the parquet scan, got:\n$p")
    // execution-time truth: rows only from the probed bucket dirs
    val files = served.select(input_file_name().as("f")).distinct()
      .as[String].collect()
    assert(files.nonEmpty &&
      files.forall(f => f.contains("cell_bucket=3")),
      s"rows leaked outside the pruned buckets: ${files.mkString(", ")}")
    assert(served.select("cell").distinct().as[Long].collect().toSet ==
      probed.toSet)
    // and the full store genuinely has more buckets than the probe read
    assert(spark.read.parquet(dir).inputFiles
      .exists(f => !f.contains("cell_bucket=3")))
  }

  test("rows are cell-sorted within each written file (the row-group " +
       "min/max skip contract)") {
    import spark.implicits._
    val dir = Scratch.dir("bivf_sort_").resolve("ivf").toString
    synthStore(dir, cells = 40, buckets = 4)
    val aFile = spark.read.parquet(dir).inputFiles.head
    val cells = spark.read.parquet(aFile).select("cell").as[Long].collect()
    assert(cells.length > 1, "expected a multi-row file")
    assert(cells.sameElements(cells.sorted),
      s"file rows not cell-sorted: ${cells.take(20).mkString(",")}")
  }

  test("layout marker contract: differing bucket count refuses; reading " +
       "an unmarked store refuses") {
    import spark.implicits._
    val dir = Scratch.dir("bivf_marker_").resolve("ivf").toString
    synthStore(dir, cells = 10, buckets = 4)
    val err = intercept[IllegalStateException] {
      synthStore(dir, cells = 10, buckets = 8, gen = 0L)
    }
    assert(err.getMessage.contains("numBuckets=4"))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.Sinks.readLayoutMarker(fs, dir) == 4)
    intercept[IllegalStateException] {
      graft.sources.Sinks.readLayoutMarker(fs, dir + "_nowhere")
    }
  }

  test("fold preserves the bucket layout, the cell sort, and the marker") {
    import spark.implicits._
    val dir = Scratch.dir("bivf_fold_").resolve("ivf").toString
    synthStore(dir, cells = 40, buckets = 4, gen = -1L)
    synthStore(dir, cells = 40, buckets = 4, gen = 0L)
    val before = spark.read.parquet(dir).count()
    VectorOps.compactBucketedCells(spark, dir)
    val gens = new java.io.File(dir).listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(gens == Set("gen=-1"), s"fold left $gens")
    val bucketDirs = new java.io.File(s"$dir/gen=-1").listFiles
      .filter(_.isDirectory).map(_.getName).toSet
    assert(bucketDirs.nonEmpty && bucketDirs.forall(_.startsWith("cell_bucket=")))
    assert(spark.read.parquet(dir).count() == before)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(graft.sources.Sinks.readLayoutMarker(fs, dir) == 4,
      "the __layout marker must ride through the fold")
    // the fold's sortWithin re-clusters: every rewritten file cell-sorted
    for (f <- spark.read.parquet(dir).inputFiles.take(3)) {
      val cells = spark.read.parquet(f).select("cell").as[Long].collect()
      assert(cells.sameElements(cells.sorted), s"fold lost the cell sort in $f")
    }
    // delete face: fold + filter in one swap, layout still intact
    VectorOps.deleteFromBucketedCells(spark, dir,
      df => df.where(col("vec_id") % 2 === 0))
    val after = spark.read.parquet(dir)
    assert(after.count() == before / 2)
    assert(after.columns.contains("cell_bucket"))
  }

  test("auto-dispatch (r14 directive 1): the DEFAULT store is bucketed; " +
       "flat is an explicit fixed-nlist opt-in bounded by FlatLayoutMaxCells") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def rows(n: Int) = (0 until n).map(i => (i.toLong, (i % 7).toLong))
      .toDF("vec_id", "cell")
    // default call → bucketed layout with defaultBuckets(nlist), marker
    val dirB = Scratch.dir("bivf_auto_b_").resolve("ivf").toString
    VectorOps.committedCellAppendAuto(rows(70), dirB, -1L, nlist = 7)
    assert(graft.sources.Sinks.layoutMarkerOpt(fs, dirB) ===
      Some(VectorOps.defaultBuckets(7)))
    // a later append at a DIFFERENT computed B still follows the marker
    VectorOps.committedCellAppendAuto(rows(10), dirB, 0L, nlist = 5000)
    assert(graft.sources.Sinks.readLayoutMarker(fs, dirB) ===
      VectorOps.defaultBuckets(7))
    assert(spark.read.parquet(dirB).count() === 80)
    // explicit fixed-nlist opt-in below the bound → flat (no marker,
    // cell=<id> partition dirs)
    val dirF = Scratch.dir("bivf_auto_f_").resolve("ivf").toString
    VectorOps.committedCellAppendAuto(rows(70), dirF, -1L, nlist = 7,
      fixedNlist = true)
    assert(graft.sources.Sinks.layoutMarkerOpt(fs, dirF).isEmpty)
    assert(new java.io.File(s"$dirF/gen=-1").listFiles
      .exists(_.getName.startsWith("cell=")))
    // the opt-in REFUSES above the bound — a user at scale cannot
    // plant the walled layout
    val err = intercept[IllegalArgumentException] {
      VectorOps.committedCellAppendAuto(rows(10),
        Scratch.dir("bivf_auto_x_").resolve("ivf").toString, -1L,
        nlist = 100000, fixedNlist = true)
    }
    assert(err.getMessage.contains("flat"))
    // layout-aware CRUD dispatches on the marker for both layouts
    VectorOps.deleteFromCells(spark, dirB, df => df.where(col("vec_id") % 2 === 0))
    assert(spark.read.parquet(dirB).count() === 40)
    assert(spark.read.parquet(dirB).columns.contains("cell_bucket"))
    VectorOps.compactCells(spark, dirF)
    assert(spark.read.parquet(dirF).count() === 70)
    assert(new java.io.File(dirF).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet === Set("gen=-1"))
  }

  test("probed-cell size dispatch (r14 directive 2): literal In below " +
       "graft.ivf.isinMaxCells, broadcast LEFT SEMI above — same rows, " +
       "bucket partition prune static either way") {
    import spark.implicits._
    val dir = Scratch.dir("bivf_semi_").resolve("ivf").toString
    synthStore(dir, cells = 200, buckets = 8)
    // 12 probed cells: ABOVE parquet's In-pushdown threshold (10 —
    // the pushed filter degrades to a min/max RANGE on the cell-sorted
    // files, ADVICE r13) but below the default semi-join threshold
    val probed = Array(3L, 11L, 19L, 27L, 35L, 43L, 51L, 59L, 67L, 75L,
      83L, 91L)
    val lit12 = graft.operators.VectorOps.prunedCellScan(spark, dir, probed)
    val pLit = lit12.queryExecution.executedPlan.toString
    assert(pLit.contains("PartitionFilters: [") && pLit.contains("cell_bucket"))
    assert(pLit.contains("In(cell") || pLit.contains("isin"),
      s"expected the literal cell filter at 12 probed cells:\n$pLit")
    assert(lit12.select("cell").distinct().as[Long].collect().toSet ===
      probed.toSet, "production-width (>10-cell) probe must stay correct " +
        "through parquet's In->range pushdown fallback")
    // force the big-batch path: threshold below the probe width
    spark.conf.set("graft.ivf.isinMaxCells", "4")
    try {
      val semi = graft.operators.VectorOps.prunedCellScan(spark, dir, probed)
      val pSemi = semi.queryExecution.executedPlan.toString
      assert(pSemi.contains("PartitionFilters: [") && pSemi.contains("cell_bucket"),
        s"the bucket partition prune must stay STATIC on the semi-join path:\n$pSemi")
      assert(pSemi.contains("LeftSemi"),
        s"expected a broadcast left-semi cell filter above the threshold:\n$pSemi")
      assert(!pSemi.contains("In(cell"),
        s"the semi-join path must not also inflate the plan with cell literals:\n$pSemi")
      assert(semi.collect().map(_.toSeq).toSet === lit12.collect().map(_.toSeq).toSet,
        "the two dispatch arms must return identical rows")
    } finally spark.conf.unset("graft.ivf.isinMaxCells")
  }

  test("layout marker records the cell TYPE (r14 directive 8): a store " +
       "scanning at a different type than recorded refuses loudly") {
    import spark.implicits._
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    // the bucketed writer records bigint
    val dirOk = Scratch.dir("bivf_type_ok_").resolve("ivf").toString
    synthStore(dirOk, cells = 10, buckets = 4)
    assert(graft.sources.Sinks.readLayoutCellType(fs, dirOk) === Some("bigint"))
    assert(graft.operators.VectorOps.prunedCellScan(spark, dirOk, Array(3L))
      .count() > 0)
    // a store whose files landed int-typed (the b76ab6a truncation
    // class, planted here by hand) refuses at serve time
    val dirBad = Scratch.dir("bivf_type_bad_").resolve("ivf").toString
    graft.sources.Sinks.ensureLayoutMarker(fs, dirBad, 4, Some("bigint"))
    (0 until 20).map(i => (i.toLong, i % 10, i % 4))
      .toDF("vec_id", "cell", "cell_bucket")
      .write.partitionBy("cell_bucket").parquet(s"$dirBad/gen=-1")
    val err = intercept[IllegalArgumentException] {
      graft.operators.VectorOps.prunedCellScan(spark, dirBad, Array(3L))
    }
    assert(err.getMessage.contains("cell type"))
    // and a WRITER declaring a different type refuses at the marker
    val err2 = intercept[IllegalStateException] {
      graft.sources.Sinks.ensureLayoutMarker(fs, dirBad, 4, Some("int"))
    }
    assert(err2.getMessage.contains("bigint"))
  }

  test("the dist tier's serve path (s25 shape) prunes through the " +
       "bucketed store: static bucket PartitionFilters + pushed cell filter") {
    import spark.implicits._
    // the store exactly as the dist stream gates write it: the auto
    // dispatch at a corpus-scaled nlist
    val dir = Scratch.dir("bivf_dist_").resolve("ivf").toString
    val df = (0 until 600).map(i => (i.toLong, (i % 150).toLong))
      .toDF("vec_id", "cell")
    VectorOps.committedCellAppendAuto(df, dir, -1L, nlist = 150)
    VectorOps.committedCellAppendAuto(df.where(col("vec_id") < 60), dir, 0L,
      nlist = 150)
    // the serve reads through prunedCellScan with the probe frame's
    // collected cells — assert the executed plan from the REAL path
    val served = graft.operators.VectorOps.prunedCellScan(spark, dir,
      Array(7L, 23L))
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("cell_bucket"),
      s"dist serve must keep the static bucket prune:\n$p")
    assert(p.contains("In(cell"), s"dist serve must push the cell filter:\n$p")
    val files = served.select(input_file_name().as("f")).distinct()
      .as[String].collect()
    val b = graft.sources.Sinks.readLayoutMarker(
      org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration), dir)
    val wantBuckets = Set(7L % b, 23L % b).map(x => s"cell_bucket=$x")
    assert(files.nonEmpty && files.forall(f => wantBuckets.exists(f.contains)),
      s"rows leaked outside the probed buckets: ${files.mkString(", ")}")
    assert(served.select("cell").distinct().as[Long].collect().toSet ===
      Set(7L, 23L))
  }

  test("frame-driven serve scan (round-15): bounded driver payload, both " +
       "dispatch arms row-identical to the array form") {
    import spark.implicits._
    val dir = Scratch.dir("bivf_frame_").resolve("ivf").toString
    synthStore(dir, cells = 200, buckets = 8)
    val probed = Array(3L, 11L, 19L, 27L, 35L, 43L, 51L, 59L, 67L, 75L,
      83L, 91L)
    val probeDf = probed.toSeq.toDF("cell")
    val viaArray = graft.operators.VectorOps.prunedCellScan(spark, dir, probed)
      .collect().map(_.toSeq).toSet
    // small probe: the limit(isinMax+1) slice fits → the literal arm
    val small = graft.operators.VectorOps
      .prunedCellScanFromFrame(spark, dir, probeDf)
    assert(small.queryExecution.executedPlan.toString.contains("In(cell") ||
      small.queryExecution.executedPlan.toString.contains("isin"))
    assert(small.collect().map(_.toSeq).toSet === viaArray)
    // forced-big probe: only buckets (≤ B) cross the driver; the cell
    // filter is the broadcast semi-join fed from the FRAME
    spark.conf.set("graft.ivf.isinMaxCells", "4")
    try {
      val big = graft.operators.VectorOps
        .prunedCellScanFromFrame(spark, dir, probeDf)
      val p = big.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters: [") && p.contains("cell_bucket"),
        s"the static bucket prune must survive the frame path:\n$p")
      assert(p.contains("LeftSemi"), s"expected the semi-join arm:\n$p")
      assert(big.collect().map(_.toSeq).toSet === viaArray)
    } finally spark.conf.unset("graft.ivf.isinMaxCells")
  }

  test("the bucketed serve equals the flat serve (layout invisible in " +
       "results): s27 == s14, s26 family == s24") {
    val bucketed = graft.SparkEntry.queries("s27_ivf_bucketed_append")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val flat = graft.SparkEntry.queries("s14_ivf_index_append")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(bucketed === flat)
    assert(bucketed.nonEmpty)
    val bHier = graft.SparkEntry.queries("s26_ivf_bucketed_served")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val dHier = graft.SparkEntry.queries("s24_ivf_hier_dist")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(bHier === dHier)
    assert(bHier.nonEmpty)
    // the streamed faces must agree the same way (s30 == s16: same
    // stream, same frozen codebook, only the store layout differs)
    val bStream = graft.SparkEntry.queries("s30_stream_ivf_bucketed")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val fStream = graft.SparkEntry.queries("s16_stream_ivf_append")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(bStream === fStream)
    assert(bStream.nonEmpty)
  }
}
