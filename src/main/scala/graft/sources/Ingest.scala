package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest layer — the reference's landing-directory scan re-expressed
  * as Spark sources (SURVEY §2.1).
  *
  *  - S2: one record per *.json metadata file with sibling .html/.pdf
  *    payloads (`scrc/preprocessors/text_to_database.py:119-157`) →
  *    `binaryFile` scans joined by path stem. Binary payloads stay
  *    distributed; at 100 TB the scan parallelizes per file and the
  *    stem join is a plain shuffle equi-join on a short key.
  *  - S7: line-oriented side inputs (`bge_references_found.txt`) →
  *    `spark.read.text` + split projections.
  *  - S3: PDF payloads decode through `pdfTextUdf` — the native
  *    minimal extractor (sources.PdfText: FlateDecode + Tj/TJ
  *    operators, JDK-only). Tika is the drop-in upgrade for
  *    encrypted/CID-font files in the same UDF slot.
  *  - S4 (DOM HTML): pluggable per-row decoder on the payload bytes;
  *    functions.TextFunctions.htmlToText covers the well-formed path
  *    (no jsoup in this container).
  */
object Ingest {

  /** S3: pdf_raw bytes → text (null = undecodable → quarantine), the
    * reference's `text_to_database.py:256-287` semantics minus the
    * 300 s subprocess timeout Tika needed (this decoder is in-process
    * and bounded by the scan).
    */
  val pdfTextUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { bytes: Array[Byte] => PdfText.extract(bytes) }

  private def stem(pathCol: org.apache.spark.sql.Column) =
    regexp_extract(pathCol, "([^/]+)\\.[a-z]+$", 1)

  /** S2: scan a landing dir of {stem}.json / {stem}.html / {stem}.pdf
    * triples into one row per stem with nullable payloads.
    */
  def fileTriples(spark: SparkSession, dir: String): DataFrame = {
    def scan(glob: String, out: String) =
      spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
        .select(stem(col("path")).as("stem"), col("content").as(out))
    scan("*.json", "meta_raw")
      .join(scan("*.html", "html_raw"), Seq("stem"), "left")
      .join(scan("*.pdf", "pdf_raw"), Seq("stem"), "left")
  }

  /** S7: line-wise reference list (`<file_number> <target>` per line). */
  def referenceList(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .where(length(trim(col("value"))) > 0)
      .select(
        split(col("value"), "\\s+").getItem(0).as("file_number"),
        split(col("value"), "\\s+").getItem(1).as("target"))
}
