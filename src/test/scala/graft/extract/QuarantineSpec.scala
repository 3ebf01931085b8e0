package graft.extract

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QuarantineSpec extends SparkSpec {

  test("safe extraction routes failures to the quarantine side") {
    import spark.implicits._
    val df = Seq(
      (1L, "Die Beschwerde wird abgewiesen."),
      (2L, null: String), // null text → extractor returns empty, no error
      (3L, "Le recours est admis."))
      .toDF("id", "rulings")
      .withColumn("ext", ExtractUdfs.judgmentsSafe(col("rulings")))

    val (ok, bad) = ExtractUdfs.quarantine(df, "ext")
    assert(ok.count() == 3 && bad.count() == 0)
    val outcomes = ok.select(col("id"), col("ext.outcomes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(outcomes(1L) == Seq("dismissal"))
    assert(outcomes(2L) == Seq.empty)
    assert(outcomes(3L) == Seq("approval"))
  }
}
