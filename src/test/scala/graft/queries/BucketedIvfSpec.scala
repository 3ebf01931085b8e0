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
