package graft.datasets

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class JudgmentDatasetSpec extends SparkSpec {

  test("end-to-end dataset build: splits, labels, overview all consistent") {
    val out = Files.createTempDirectory("judgment_ds").toString
    val report = JudgmentDataset.build(spark, sfDir, out)

    assert(report.labels == Seq("approval", "dismissal"))

    // labels.json written and well-formed
    val labelsJson = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "labels.json")))
    assert(labelsJson.contains(""""0": "approval""""))

    // every non-secret split exists and rows carry labels
    val train = spark.read.json(s"$out/train")
    assert(train.count() > 0)
    assert(train.select("label").distinct().collect()
      .map(_.getString(0)).toSet.subsetOf(report.labels.toSet))

    // split counts in the overview equal the written JSONL counts
    val all = Seq("train", "validation", "test", "secret_test").map { sp =>
      val n = try spark.read.json(s"$out/$sp").count() catch { case _: Throwable => 0L }
      sp -> n
    }.toMap
    val fromReport = report.splitCounts.groupBy(_._1._1)
      .map { case (sp, m) => sp -> m.values.sum }
    all.foreach { case (sp, n) =>
      assert(fromReport.getOrElse(sp, 0L) == n, s"split $sp: report vs jsonl")
    }

    // the 1/7 no-outcome rows were dropped
    val total = all.values.sum
    val docs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(total < docs && total >= docs * 5 / 7)

    // date stratification: train years all <= 2015
    assert(train.agg(max("year")).collect().head.getLong(0) <= 2015)
  }
}
