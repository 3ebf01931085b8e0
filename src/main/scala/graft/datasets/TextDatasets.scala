package graft.datasets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.extract.ExtractUdfs
import graft.sources.Tables

/** The remaining dataset creators (SURVEY §3.2 lists 8; judgment,
  * criticality and doc2doc have their own modules) — each is its
  * labeling logic over the shared corpus + DatasetWriter:
  *
  *  - law_area (`law_area_dataset_creator.py`): chamber→area config join
  *  - court_view (`court_view_generation` creator): facts → considerations
  *    text-to-text pairs
  *  - pretraining: cleaned text only, quality-filtered
  *  - regeste (`regeste_dataset_creator.py`): header/regeste/text triples
  *  - citation_extraction (`citation_extraction_dataset_creator.py`):
  *    token/BIO-label sequences
  */
object TextDatasets {

  private def base(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .withColumn("year", (col("doc_id") % 25 + 2000).cast("int"))
      .withColumn("split", DatasetWriter.dateSplit("year"))

  /** law-area labels from a broadcast chamber→area config dimension */
  def lawArea(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val areas = Seq(("src0", "civil_law"), ("src1", "public_law"),
      ("src2", "penal_law"), ("src3", "social_law"))
      .toDF("source", "law_area")
    base(spark, sfDir)
      .join(broadcast(areas), Seq("source"), "left")
      .withColumn("law_area", coalesce(col("law_area"), lit("other")))
      .select("doc_id", "year", "lang", "text", "law_area", "split")
  }

  /** court-view: facts → considerations generation pairs */
  def courtView(spark: SparkSession, sfDir: String): DataFrame =
    base(spark, sfDir)
      .withColumn("facts", substring(col("text"), 1, 120))
      .withColumn("considerations", substring(col("text"), 121, 10000))
      .where(length(col("considerations")) > 0)
      .select("doc_id", "year", "lang", "facts", "considerations", "split")

  /** pretraining: quality-filtered cleaned text */
  def pretraining(spark: SparkSession, sfDir: String): DataFrame =
    base(spark, sfDir)
      .where(col("n_chars") >= 100) // the reference's min-length ingest gate
      .select(col("doc_id"), col("lang"),
        trim(regexp_replace(col("text"), "\\s+", " ")).as("text"), col("split"))

  /** regeste creator (`regeste_dataset_creator.py:27-76`): split
    * full_text into header / regeste / text on "\nRegeste", then
    * disambiguate the regeste→text boundary between "\nSachverhalt"
    * and "\nErwägungen" by the SHORTER regeste (both candidates are
    * prefixes of the same remainder, so the earlier keyword wins —
    * the reference's length compare reduces to a position compare);
    * a missing keyword falls back to the other split, both missing
    * (or no "\nRegeste" at all) yields null regeste/text with the
    * header preserved; regeste and text are stripped of edge
    * newlines (Python `.strip('\n')`), the header is not. Pure
    * column expressions — shuffle-free per-row work at any scale.
    *
    * The synthesized full_text cycles through all six reference
    * branches: facts-first, considerations-first (exercising the
    * shorter-regeste compare both ways), facts-only,
    * considerations-only, no-Regeste, and Regeste-without-either.
    */
  def regeste(spark: SparkSession, sfDir: String): DataFrame = {
    val kwR = "\nRegeste"
    val kwF = "\nSachverhalt"
    val kwE = "\nErwägungen"
    val m = pmod(col("doc_id"), lit(6)).cast("int")
    val hdr = substring(col("text"), 1, 40)
    val reg = substring(col("text"), 41, 60)
    val b1 = substring(col("text"), 101, 120)
    val b2 = substring(col("text"), 221, 120)
    val bLong = substring(col("text"), 101, 200)
    val fullText =
      when(m === 0, concat(hdr, lit(kwR + " "), reg, lit(kwF + " "), b1, lit(kwE + " "), b2))
        .when(m === 1, concat(hdr, lit(kwR + " "), reg, lit(kwE + " "), b1, lit(kwF + " "), b2))
        .when(m === 2, concat(hdr, lit(kwR + " "), reg, lit(kwF + " "), bLong))
        .when(m === 3, concat(hdr, lit(kwR + " "), reg, lit(kwE + " "), bLong))
        .when(m === 4, hdr)
        .otherwise(concat(hdr, lit(kwR + " "), reg, lit(" "), bLong))
    base(spark, sfDir)
      .withColumn("full_text", fullText)
      .withColumn("p_r", instr(col("full_text"), kwR))
      .withColumn("header",
        when(col("p_r") > 0, col("full_text").substr(lit(1), col("p_r") - 1))
          .otherwise(col("full_text")))
      .withColumn("rest", when(col("p_r") > 0,
        col("full_text").substr(col("p_r") + kwR.length, length(col("full_text")))))
      .withColumn("p_f", coalesce(instr(col("rest"), kwF), lit(0)))
      .withColumn("p_e", coalesce(instr(col("rest"), kwE), lit(0)))
      .withColumn("p_c",
        when(col("p_f") > 0 && col("p_e") > 0, least(col("p_f"), col("p_e")))
          .when(col("p_f") > 0, col("p_f"))
          .when(col("p_e") > 0, col("p_e")))
      .select(col("doc_id"), col("year"), col("lang"), col("header"),
        when(col("p_c").isNotNull,
          trim(concat(lit(kwR), col("rest").substr(lit(1), col("p_c") - 1)), "\n"))
          .as("regeste"),
        when(col("p_c").isNotNull,
          trim(col("rest").substr(col("p_c"), length(col("rest"))), "\n"))
          .as("text"),
        col("split"))
  }

  /** citation-extraction: token/BIO sequences for the injected citations */
  def citationExtraction(spark: SparkSession, sfDir: String): DataFrame =
    base(spark, sfDir)
      .withColumn("body", concat(col("text"),
        lit(" Vgl. BGE "), (col("doc_id") % 50 + 100).cast("string"),
        lit(" II "), (col("doc_id") % 400 + 1).cast("string"), lit(".")))
      .withColumn("bio", ExtractUdfs.nerBioLabels(col("body")))
      .select(col("doc_id"), col("year"),
        expr("transform(bio, x -> x._1)").as("tokens"),
        expr("transform(bio, x -> x._2)").as("labels"),
        col("split"))

  def buildAll(spark: SparkSession, sfDir: String, outRoot: String)
      : Map[String, JudgmentDataset.Report] = Map(
    "law_area" -> DatasetWriter.write(lawArea(spark, sfDir),
      s"$outRoot/law_area", Some("law_area")),
    "court_view" -> DatasetWriter.write(courtView(spark, sfDir),
      s"$outRoot/court_view", None),
    "pretraining" -> DatasetWriter.write(pretraining(spark, sfDir),
      s"$outRoot/pretraining", None),
    "citation_extraction" -> DatasetWriter.write(citationExtraction(spark, sfDir),
      s"$outRoot/citation_extraction", None),
    "regeste" -> DatasetWriter.write(regeste(spark, sfDir),
      s"$outRoot/regeste", None))
}
