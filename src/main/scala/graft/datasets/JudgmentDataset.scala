package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.ExtractUdfs
import graft.sources.Tables

/** End-to-end judgment-prediction dataset creator — the reference's
  * minimum full slice (`scrc/dataset_creation/judgment_dataset_creator
  * .py:37-56` + the shared `dataset_creator.py` machinery, SURVEY §3.2):
  * wide table → binary label → drop unlabeled → date-stratified splits
  * → JSONL + labels.json + per-split overview.
  *
  * One declarative DataFrame pipeline replaces the reference's
  * per-court process pool + pandas chunks: Spark partitions the scan,
  * the split writes are three filtered passes over the same cached
  * plan, and every output is idempotent-overwrite (K3 semantics).
  */
object JudgmentDataset {


  case class Report(labels: Seq[String], splitCounts: Map[(String, String), Long])

  /** Assemble the labeled wide table (no writes). */
  def prepare(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("year", (col("doc_id") % 25 + 2000).cast("int"))
      .withColumn("rulings", expr(
        """CASE WHEN doc_id % 7 = 0 THEN 'Das Verfahren wird fortgesetzt.'
                WHEN doc_id % 3 = 0 THEN 'Die Beschwerde wird abgewiesen.'
                WHEN doc_id % 3 = 1 THEN 'Die Beschwerde wird gutgeheissen.'
                ELSE 'Die Beschwerde wird teilweise gutgeheissen.' END"""))
      .withColumn("label",
        ExtractUdfs.binaryJudgment(ExtractUdfs.judgments(col("rulings"))))
      .where(col("label").isNotNull) // drop unextractable rows (P8)
      .withColumn("split", DatasetWriter.dateSplit("year"))
      .select("doc_id", "year", "lang", "source", "text", "rulings", "label", "split")

  /** Build + write the dataset; returns the overview report. */
  def build(spark: SparkSession, sfDir: String, outDir: String): Report =
    DatasetWriter.write(prepare(spark, sfDir), outDir, Some("label"))
}
