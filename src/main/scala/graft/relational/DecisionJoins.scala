package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Catalog, MiniCorpus}
import graft.operators.MapJoin

/** The reference's wide-table assembly (`scrc/utils/sql_select_utils
  * .py:240-323` `map_join` chains + `dataset_creator.py:493-547`
  * `get_df`): denormalize `decision` against its dimensions and attach
  * every child table as ONE pre-aggregated column per decision.
  *
  * Shape invariant: the output has exactly one row per decision no
  * matter how many sections/citations/judgments exist (the reference
  * asserts `len(file_df) == len(df)` at runtime, `dataset_creator
  * .py:652` — here the shape is by construction: every child is
  * aggregated to one row per key BEFORE joining).
  *
  * Scale: dimensions broadcast; each child aggregation is one shuffle
  * with map-side partial agg; the final joins are one-row-per-key on
  * both sides. Catalyst will not invent aggregate-before-join — this
  * module IS that rewrite (SURVEY §4: "we keep this shape explicitly").
  */
object DecisionJoins {

  /** child rows → sorted array<struct> per decision (J2/A2) */
  private def agg(child: DataFrame, outCol: String, cols: Column*): DataFrame =
    MapJoin.collectJoinSide(child, "decision_id", outCol, cols: _*)

  case class Inputs(decisions: DataFrame, languages: DataFrame,
                    chambers: DataFrame, courts: DataFrame, cantons: DataFrame,
                    sections: DataFrame, judgments: DataFrame,
                    citations: DataFrame, fileNumbers: DataFrame,
                    parties: DataFrame, judicialPeople: DataFrame)

  def miniCorpus(spark: SparkSession): Inputs = Inputs(
    MiniCorpus.decisions(spark), MiniCorpus.languages(spark),
    MiniCorpus.chambers(spark), MiniCorpus.courts(spark),
    MiniCorpus.cantons(spark), MiniCorpus.sections(spark),
    MiniCorpus.judgmentMaps(spark), MiniCorpus.citations(spark),
    MiniCorpus.fileNumbers(spark), MiniCorpus.parties(spark),
    MiniCorpus.judicialPeople(spark))

  /** The wide decision frame: J1 dimension chain + J2 aggregate-joins +
    * derived year/court/canton columns.
    */
  def wide(in: Inputs): DataFrame = {
    val dims = in.decisions
      .join(broadcast(in.languages), Seq("language_id"), "left")
      .join(broadcast(in.chambers), Seq("chamber_id"), "left")
      .join(broadcast(in.courts), Seq("court_id"), "left")
      .join(broadcast(in.cantons), Seq("canton_id"), "left")
      .withColumn("year", year(col("date")))

    val judgmentNames = in.judgments.withColumn("judgment",
      element_at(typedlit(Catalog.Judgment.names), col("judgment_id")))

    dims
      .join(agg(in.sections, "sections",
        col("section_type_id"), col("section_text")), Seq("decision_id"), "left")
      .join(agg(judgmentNames.select(col("decision_id"), col("judgment")),
        "judgments", col("judgment")), Seq("decision_id"), "left")
      .join(agg(in.citations, "citations",
        col("citation_type_id"), col("text")), Seq("decision_id"), "left")
      .join(agg(in.fileNumbers, "file_numbers", col("text")), Seq("decision_id"), "left")
      // the reference's 'party' and 'judicial_person' map-joins
      // (sql_select_utils.py:312-321): person fields as one sorted
      // array<struct> per decision, same J2 shape as the others
      .join(agg(in.parties, "parties", col("party_type_id"), col("name"),
        col("is_natural_person"), col("gender")), Seq("decision_id"), "left")
      .join(agg(in.judicialPeople, "judicial_people",
        col("judicial_person_type_id"), col("name"), col("is_president"),
        col("gender")), Seq("decision_id"), "left")
  }

  /** The reference's `run_nlp_pipe` token persistence
    * (`abstract_preprocessor.py:256-298`): per-SECTION token counts in
    * both calibration currencies — the word-rule count standing in for
    * the spaCy doc length (deterministic analog, same substitution as
    * the lemma tier) and the model-tokenizer `len(input_ids)` count
    * (`num_tokens_bert`). The reference's de/it models are
    * WordPiece-family BERTs but its fr model is camembert-base-ccnet
    * (`abstract_preprocessor.py:304-310`) — a SentencePiece/BPE
    * tokenizer — so when a language column is supplied, fr rows count
    * through the BPE tier (subwords + the 2 `<s>`/`</s>` specials) and
    * de/it through WordPiece (+ [CLS]/[SEP]). Without a language
    * column every row uses the WordPiece tier (exact only for the
    * de/it model family). Pure per-row maps; ids derive from
    * section_id so re-runs are idempotent.
    */
  def numTokens(sections: DataFrame, languageCol: Option[String] = None): DataFrame = {
    val spacyLike = udf { t: String =>
      if (t == null) 0
      else graft.functions.TextFunctions.unicodeWordTokens(t).size }
    val bert = udf { (t: String, lang: String) =>
      if (t == null) 2
      else if (lang == "fr")
        graft.functions.Bpe.tokenize(t, graft.functions.Bpe.bundled).size + 2
      else graft.functions.WordPiece.countWithSpecials(
        t, graft.functions.WordPiece.bundled) }
    val lang = languageCol.map(col).getOrElse(lit(null).cast("string"))
    sections.select(
      col("section_id").as("num_tokens_id"),
      col("section_id"),
      spacyLike(col("section_text")).as("num_tokens_spacy"),
      bert(col("section_text"), lang).as("num_tokens_bert"))
  }

  /** J6 self-join analog: facts + rulings text of the same decision as
    * two columns via conditional aggregation (one pass, no self-join).
    */
  def sectionPivot(sections: DataFrame): DataFrame =
    sections.groupBy("decision_id").agg(
      max(when(col("section_type_id") === Catalog.SectionType.Facts,
        col("section_text"))).as("facts"),
      max(when(col("section_type_id") === Catalog.SectionType.Rulings,
        col("section_text"))).as("rulings"))
}
