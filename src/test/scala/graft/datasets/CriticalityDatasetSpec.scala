package graft.datasets

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CriticalityDatasetSpec extends SparkSpec {

  test("criticality labels: quartiles + non-critical, all docs labeled") {
    val ds = CriticalityDataset.prepare(spark, sfDir)
    val n = graft.sources.Tables.documents(spark, sfDir).count()
    assert(ds.count() == n)
    val labels = ds.groupBy("label").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // all four quartile labels present
    (1 to 4).foreach(i => assert(labels.contains(s"critical-$i"), s"critical-$i"))
    // scores are non-negative, and critical docs can score > 0
    assert(ds.where(col("score") < 0).count() == 0)
    assert(ds.where(col("label") =!= "non-critical" && col("score") > 0).count() > 0)
  }

  test("end-to-end build writes splits and labels") {
    val out = Files.createTempDirectory("criticality_ds").toString
    val report = CriticalityDataset.build(spark, sfDir, out)
    assert(report.labels.exists(_.startsWith("critical-")))
    val train = spark.read.json(s"$out/train")
    assert(train.count() > 0)
    assert(train.columns.contains("label") && train.columns.contains("score"))
  }

  test("build frees every cache it pinned (releasable handle wiring)") {
    // default threshold path: DatasetWriter's own persist plus the
    // (no-op) small-path handle — nothing may survive build
    val before = spark.sparkContext.getPersistentRDDs.size
    CriticalityDataset.build(spark, sfDir,
      Files.createTempDirectory("criticality_rel").toString)
    assert(spark.sparkContext.getPersistentRDDs.size <= before)

    // forced-distributed path: GlobalRank pins the range-partitioned
    // frame MEMORY_AND_DISK during the action; the handle must free it
    val (ds, release) = CriticalityDataset.prepareReleasable(
      spark, sfDir, smallInputRows = 0L)
    try {
      assert(ds.count() > 0) // action materializes the pinned frame
      assert(spark.sparkContext.getPersistentRDDs.size > before,
        "distributed ntile should have pinned its internal frame")
    } finally release()
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "release() must drop the GlobalRank cache")
  }
}
