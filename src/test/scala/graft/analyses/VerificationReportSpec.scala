package graft.analyses

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.extract.ExtractUdfs
import graft.sources.Tables

class VerificationReportSpec extends SparkSpec {

  private def sectioned = Tables.documents(spark, sfDir)
    .withColumn("facts", substring(col("text"), 1, 60))
    .withColumn("considerations", substring(col("text"), 61, 60))
    .withColumn("rulings", expr(
      """CASE WHEN doc_id % 3 = 0 THEN 'Die Beschwerde wird abgewiesen.'
              ELSE 'Die Beschwerde wird gutgeheissen.' END"""))
    .withColumn("outcomes", ExtractUdfs.judgments(col("rulings")))

  test("sample is deterministic and bounded per source") {
    val s1 = VerificationReport.sample(sectioned, 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val s2 = VerificationReport.sample(sectioned, 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(s1.sameElements(s2))
    val counts = VerificationReport.sample(sectioned, 3)
      .groupBy("source").count().collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3))
  }

  test("report files render sections and outcomes per source") {
    val out = Files.createTempDirectory("verification").toString
    val files = VerificationReport.write(
      VerificationReport.sample(sectioned, 2), out)
    assert(files.nonEmpty)
    val content = new String(Files.readAllBytes(
      java.nio.file.Paths.get(files.head)))
    assert(content.contains("[RULINGS]"))
    assert(content.contains("[EXTRACTED OUTCOMES]"))
    assert(content.contains("approval") || content.contains("dismissal"))
  }
}
