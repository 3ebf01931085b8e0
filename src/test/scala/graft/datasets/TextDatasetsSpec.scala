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

  test("regeste split picks the shorter regeste and keeps null quirks") {
    val ds = TextDatasets.regeste(spark, sfDir).cache()
    try {
      val m = pmod(col("doc_id"), lit(6)).cast("int")
      // both keywords present: the chosen regeste stops at the EARLIER
      // one (the reference's shorter-regeste compare), so the other
      // keyword's slice lands inside text, never inside regeste
      val both = ds.where(m === 0 || m === 1)
      assert(both.where(col("regeste").contains("Sachverhalt") ||
        col("regeste").contains("Erwägungen")).count() == 0)
      assert(both.where(m === 0 && !col("text").startsWith("Sachverhalt")).count() == 0)
      assert(both.where(m === 1 && !col("text").startsWith("Erwägungen")).count() == 0)
      // single-keyword fallbacks
      assert(ds.where(m === 2 && !col("text").startsWith("Sachverhalt")).count() == 0)
      assert(ds.where(m === 3 && !col("text").startsWith("Erwägungen")).count() == 0)
      // no "\nRegeste" → header carries the whole full_text, rest null;
      // "\nRegeste" without either boundary keyword → null regeste/text
      assert(ds.where(m.isin(4, 5) &&
        (col("regeste").isNotNull || col("text").isNotNull)).count() == 0)
      // Python .strip('\n'): no edge newlines survive on regeste/text
      assert(ds.where(col("regeste").startsWith("\n") ||
        col("regeste").endsWith("\n") || col("text").startsWith("\n") ||
        col("text").endsWith("\n")).count() == 0)
      assert(ds.where(m =!= 4 && !col("regeste").startsWith("Regeste")).count() == 0)
    } finally ds.unpersist()
  }

  test("buildAll writes all five datasets") {
    val out = Files.createTempDirectory("text_ds").toString
    val reports = TextDatasets.buildAll(spark, sfDir, out)
    assert(reports.keySet == Set("law_area", "court_view", "pretraining",
      "citation_extraction", "regeste"))
    assert(spark.read.json(s"$out/pretraining/train").count() > 0)
    assert(reports("law_area").labels.contains("civil_law"))
  }
}
