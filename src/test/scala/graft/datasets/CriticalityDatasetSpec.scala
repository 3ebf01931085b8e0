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
}
