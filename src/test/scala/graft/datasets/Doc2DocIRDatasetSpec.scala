package graft.datasets

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class Doc2DocIRDatasetSpec extends SparkSpec {

  test("features are masked, labels resolved, vocabulary capped") {
    val ds = CriticalityDatasetSpecHelpers.cache(
      Doc2DocIRDataset.prepare(spark, sfDir))
    // every feature text carries the mask, never a raw citation
    assert(ds.where(col("feature_text").contains("<ref-ruling>")).count() == ds.count())
    assert(ds.where(col("feature_text").rlike("BGE \\d")).count() == 0)
    // label vocabulary is bounded
    val nLabels = ds.select("cited_key").distinct().count()
    assert(nLabels <= Doc2DocIRDataset.vocabSize)
    // resolution points at a real doc with the matching key
    val bad = ds.where(col("resolved_ruling_id").isNotNull &&
      col("resolved_ruling_id") % 400 =!= col("cited_key"))
    assert(bad.count() == 0)
  }

  test("build writes splits + labels") {
    val out = Files.createTempDirectory("doc2doc_ds").toString
    val report = Doc2DocIRDataset.build(spark, sfDir, out)
    assert(report.labels.nonEmpty)
    assert(spark.read.json(s"$out/train").count() > 0)
  }
}

object CriticalityDatasetSpecHelpers {
  def cache(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    df.cache(); df.count(); df
  }
}
