package graft.model

import java.sql.Date

/** Typed catalog for the reference's relational schema (SURVEY §1.2,
  * `database_creation/drop_and_create_tables.sql:14-161`) — the
  * snowflake around the `decision` fact table. Case classes give
  * compile-time field checks and Encoders; Parquet is the storage.
  *
  * Enum dimensions (`scrc/enums/`) become small companion constants;
  * their contents ship as dimension Datasets for joins.
  */
object Catalog {

  case class Language(language_id: Int, iso_code: String)
  case class Canton(canton_id: Int, short_code: String)
  case class Spider(spider_id: Int, name: String)
  case class Court(court_id: Int, canton_id: Int, court_string: String)
  case class Chamber(chamber_id: Int, court_id: Int, spider_id: Int,
                     chamber_string: String)
  case class FileRec(file_id: Int, file_name: String, html_url: String,
                     pdf_url: String, html_raw: String, pdf_raw: String)
  case class Decision(decision_id: String, language_id: Int, chamber_id: Int,
                      file_id: Int, date: Date, topic: String)
  case class Section(section_id: Int, decision_id: String,
                     section_type_id: Int, section_text: String)
  case class NumTokens(num_tokens_id: Int, section_id: Int,
                       num_tokens_spacy: Int, num_tokens_bert: Int)
  case class JudgmentMap(judgment_id: Int, decision_id: String)
  case class Citation(citation_id: Int, citation_type_id: Int,
                      decision_id: String, url: String, text: String)
  case class FileNumber(file_number_id: Int, decision_id: String, text: String)
  /** get_df 'party' attachment (sql_select_utils.py:312-315): person
    * fields inlined like the reference's json_build_object fill
    */
  case class Party(party_id: Int, decision_id: String, name: String,
                   is_natural_person: Boolean, gender: String, party_type_id: Int)
  /** get_df 'judicial_person' attachment (sql_select_utils.py:317-321) */
  case class JudicialPerson(person_id: Int, decision_id: String, name: String,
                            is_natural_person: Boolean, gender: String,
                            is_president: Boolean, judicial_person_type_id: Int)
  case class LowerCourt(lower_court_id: Int, court_id: Int, canton_id: Int,
                        chamber_id: Int, date: Date, file_number: String,
                        decision_id: String)

  /** Section kinds (scrc/enums/section.py): FULL_TEXT=1 … FOOTER=7 */
  object SectionType {
    val FullText = 1; val Header = 2; val Facts = 3
    val Considerations = 4; val Rulings = 5; val Footer = 7
  }

  /** Judgment outcomes (scrc/enums/judgment.py) */
  object Judgment {
    val Approval = 1; val PartialApproval = 2; val Dismissal = 3
    val PartialDismissal = 4; val Inadmissible = 5; val WriteOff = 6
    val Unification = 7
    val names: Map[Int, String] = Map(
      Approval -> "approval", PartialApproval -> "partial_approval",
      Dismissal -> "dismissal", PartialDismissal -> "partial_dismissal",
      Inadmissible -> "inadmissible", WriteOff -> "write_off",
      Unification -> "unification")
  }

  object CitationType { val Ruling = 1; val Law = 2; val Commentary = 3 }
}
