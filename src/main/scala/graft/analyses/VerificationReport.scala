package graft.analyses

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Human-verification report (§5 / K9): the reference renders 50 random
  * decisions per spider to docx with highlighted sections for manual
  * skimming (`scrc/analyses/coverage_verification.py:25-107`, random
  * pick `:136-142` as one query per doc). Here: ONE deterministic
  * stratified sample pass (md5-of-key order, no 50 round trips), the
  * sample — bounded by construction — collects to the driver, and the
  * rendering is plain text per source.
  */
object VerificationReport {

  /** n docs per source with their extraction outcomes attached */
  def sample(sectioned: DataFrame, perSource: Int = 5): DataFrame = {
    val w = Window.partitionBy("source")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    sectioned
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= perSource)
      .drop("rn")
  }

  /** Render the sampled docs to one annotated text file per source. */
  def write(sampled: DataFrame, outDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    val rows = sampled
      .select("source", "doc_id", "facts", "considerations", "rulings", "outcomes")
      .collect()
    rows.groupBy(_.getString(0)).map { case (source, docs) =>
      val body = docs.sortBy(_.getLong(1)).map { r =>
        s"""=== doc ${r.getLong(1)} ===
           |[FACTS] ${r.getString(2)}
           |[CONSIDERATIONS] ${r.getString(3)}
           |[RULINGS] ${r.getString(4)}
           |[EXTRACTED OUTCOMES] ${Option(r.getSeq[String](5)).map(_.mkString(", ")).getOrElse("-")}
           |""".stripMargin
      }.mkString("\n")
      val path = Paths.get(outDir, s"verification_$source.txt")
      Files.write(path, body.getBytes(StandardCharsets.UTF_8))
      path.toString
    }.toSeq.sorted
  }
}
