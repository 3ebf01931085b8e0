package graft.model

import java.sql.Date
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.functions.TextFunctions
import Catalog._

/** Deterministic in-memory mini corpus following FIXTURES.md §1 content
  * rules: ≥2 languages, 3 courts across 2 cantons incl. CH_BGer,
  * decisions spanning 2000–2023 (all four date splits non-empty), some
  * decisions with multiple file numbers, multiple judgments, zero
  * citations, NULL dates, and empty sections. decision_id is the
  * deterministic uuid5(file_name) like the reference.
  */
object MiniCorpus {

  val nDecisions = 40

  def languages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Language(1, "de"), Language(2, "fr"), Language(3, "it")).toDF()
  }

  def cantons(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Canton(1, "CH"), Canton(2, "ZH")).toDF()
  }

  def spiders(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Spider(1, "CH_BGer"), Spider(2, "ZH_VG")).toDF()
  }

  def courts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Court(1, 1, "CH_BGer"), Court(2, 2, "ZH_VG"), Court(3, 2, "ZH_OG")).toDF()
  }

  def chambers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Chamber(1, 1, 1, "CH_BGer_001"), Chamber(2, 2, 2, "ZH_VG_001"),
      Chamber(3, 3, 2, "ZH_OG_001")).toDF()
  }

  def fileName(i: Int): String = s"ruling_$i.html"
  def decisionId(i: Int): String = TextFunctions.decisionId(fileName(i))

  def decisions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).map { i =>
      Decision(decisionId(i),
        language_id = i % 3 + 1,
        chamber_id = i % 3 + 1,
        file_id = i,
        // every year 2000..2023 hit; two NULL dates (i=38, 39)
        date = if (i >= 38) null else Date.valueOf(f"${2000 + i % 24}%d-0${i % 9 + 1}%d-15"),
        topic = if (i % 5 == 0) null else s"topic_${i % 4}")
    }.toDF()
  }

  def sections(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).flatMap { i =>
      val id = decisionId(i)
      val base = Seq(
        Section(i * 10 + 1, id, SectionType.Facts, s"Sachverhalt des Falls $i"),
        Section(i * 10 + 2, id, SectionType.Considerations, s"Erwägungen zum Fall $i"))
      // rulings section empty for every 7th decision (coverage gaps)
      val rulings =
        if (i % 7 == 0) Seq(Section(i * 10 + 3, id, SectionType.Rulings, ""))
        else Seq(Section(i * 10 + 3, id, SectionType.Rulings,
          if (i % 3 == 0) "Die Beschwerde wird abgewiesen."
          else "Die Beschwerde wird gutgeheissen."))
      base ++ rulings
    }.toDF()
  }

  def judgmentMaps(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).flatMap { i =>
      val id = decisionId(i)
      if (i % 7 == 0) Nil // no judgment extracted
      else if (i % 11 == 0) // multi-judgment decision
        Seq(JudgmentMap(Judgment.PartialApproval, id),
          JudgmentMap(Judgment.PartialDismissal, id))
      else if (i % 3 == 0) Seq(JudgmentMap(Judgment.Dismissal, id))
      else Seq(JudgmentMap(Judgment.Approval, id))
    }.toDF()
  }

  def citations(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).flatMap { i =>
      val id = decisionId(i)
      if (i % 4 == 0) Nil // zero-citation decisions
      else Seq(
        Citation(i * 10 + 1, CitationType.Ruling, id, null, s"BGE ${100 + i} II ${i + 1}"),
        Citation(i * 10 + 2, CitationType.Law, id, null, "Art. 95 BGG"))
    }.toDF()
  }

  def parties(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).flatMap { i =>
      val id = decisionId(i)
      if (i % 8 == 0) Nil // party extraction failed → no rows
      else Seq(
        Party(i * 10 + 1, id, s"Partei A$i", i % 2 == 0,
          if (i % 2 == 0) "m" else "f", 1),
        Party(i * 10 + 2, id, s"Gegenpartei B$i", i % 3 != 0,
          if (i % 3 == 0) null else "f", 2))
    }.toDF()
  }

  def judicialPeople(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).flatMap { i =>
      val id = decisionId(i)
      Seq(
        JudicialPerson(i * 10 + 1, id, s"Richter R$i", true, "m",
          is_president = true, judicial_person_type_id = 1),
        JudicialPerson(i * 10 + 2, id, s"Richterin S$i", true, "f",
          is_president = false, judicial_person_type_id = 1),
        JudicialPerson(i * 10 + 3, id, s"Schreiber T$i", true,
          if (i % 2 == 0) "m" else "f",
          is_president = false, judicial_person_type_id = 2))
    }.toDF()
  }

  def fileNumbers(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (0 until nDecisions).flatMap { i =>
      val id = decisionId(i)
      val first = FileNumber(i * 10 + 1, id, f"${i % 9 + 1}C_${i}%d/${2000 + i % 24}")
      if (i % 6 == 0) Seq(first, FileNumber(i * 10 + 2, id, f"${i % 9 + 1}C_${i + 500}%d/${2000 + i % 24}"))
      else Seq(first)
    }.toDF()
  }
}
