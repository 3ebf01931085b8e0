package graft.datasets

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextDatasetsSpec extends SparkSpec {

  test("law-area labels come from the config dimension with fallback") {
    val ds = TextDatasets.lawArea(spark, sfDir)
    val areas = ds.select("law_area").distinct().collect().map(_.getString(0)).toSet
    assert(areas.contains("civil_law") && areas.contains("other"))
    assert(ds.where(col("law_area").isNull).count() == 0)
  }

  test("court-view pairs are non-empty on both sides") {
    val ds = TextDatasets.courtView(spark, sfDir)
    assert(ds.where(length(col("facts")) === 0).count() == 0)
    assert(ds.where(length(col("considerations")) === 0).count() == 0)
  }

  test("citation-extraction sequences align tokens with labels") {
    val ds = TextDatasets.citationExtraction(spark, sfDir)
    val bad = ds.where(size(col("tokens")) =!= size(col("labels")))
    assert(bad.count() == 0)
    val withB = ds.where(array_contains(col("labels"), "B-CITATION"))
    assert(withB.count() == ds.count(), "every doc carries its injected citation")
  }

  test("buildAll writes all four datasets") {
    val out = Files.createTempDirectory("text_ds").toString
    val reports = TextDatasets.buildAll(spark, sfDir, out)
    assert(reports.keySet == Set("law_area", "court_view", "pretraining",
      "citation_extraction"))
    assert(spark.read.json(s"$out/pretraining/train").count() > 0)
    assert(reports("law_area").labels.contains("civil_law"))
  }
}
