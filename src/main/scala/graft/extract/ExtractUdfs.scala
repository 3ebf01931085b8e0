package graft.extract

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** result-or-error struct for the §2.9 error channel */
case class SafeOutcomes(outcomes: Seq[String], error: String)

/** one structured-HTML ruling citation (F19) */
case class HtmlCite(url: String, text: String)

/** Thin UDF layer over the pure Extractors logic (§2.9 dispatch shape:
  * one UDF per task, the row's spider column selects the marker table
  * from broadcast config; generator-style outputs come back as
  * array<struct> and are exploded — no custom Generator needed).
  */
object ExtractUdfs {

  /** spider-dispatched section splitting: (spider, paragraphs) →
    * map<section, array<paragraph>>
    */
  val splitSections: UserDefinedFunction =
    udf { (spider: String, paragraphs: Seq[String]) =>
      Extractors.splitSections(spider, paragraphs)
    }

  /** (spider, language, paragraphs) → map<section, array<paragraph>>
    * against the PORTED reference marker corpus (F9). The UDF body
    * references `MarkerConfigLoader.bundled` by name rather than
    * capturing it, so each executor JVM resolves the corpus from its
    * own classpath once — nothing ships with the closure.
    */
  val splitSectionsLang: UserDefinedFunction =
    udf { (spider: String, lang: String, paragraphs: Seq[String]) =>
      Extractors.splitSections(spider, lang, paragraphs, MarkerConfigLoader.bundled)
    }

  /** F3 HTML path: (spider, raw html) → cleaned text via the ported
    * DOM-surgery registry + get_text + clean_text
    */
  val cleanHtml: UserDefinedFunction =
    udf { (spider: String, html: String) => HtmlCleaners.cleanHtml(spider, html) }

  /** F2 PDF path: (spider, raw text) → cleaned text via the ported
    * per-spider regex rules (no namespace templates in the UDF shape;
    * callers with file-number context use HtmlCleaners.cleanPdf
    * directly)
    */
  val cleanPdf: UserDefinedFunction =
    udf { (spider: String, text: String) => HtmlCleaners.cleanPdf(spider, text) }

  /** rulings text → sorted outcome labels (merged-language table) */
  val judgments: UserDefinedFunction =
    udf { rulings: String => Extractors.extractJudgments(rulings) }

  /** (rulings, language) → sorted outcome labels via that language's
    * ported marker table (F11/F14 numbered-ruling search included)
    */
  val judgmentsLang: UserDefinedFunction =
    udf { (rulings: String, lang: String) =>
      Extractors.extractJudgments(rulings, lang)
    }

  /** outcome labels → binary label (null when empty/contradictory) */
  val binaryJudgment: UserDefinedFunction =
    udf { outcomes: Seq[String] => Extractors.toBinaryJudgment(outcomes).orNull }

  /** text → array<struct<volume,book,page>> of BGE/ATF/DTF citations.
    * Non-deterministic marker = eval-once barrier: the array feeds an
    * explode, and project-collapse would otherwise re-run the regex
    * scan per generated row.
    */
  val rulingCitations: UserDefinedFunction =
    udf { text: String => Extractors.parseRulingCitations(text) }
      .asNondeterministic()

  /** F16 + §2.9: spider-dispatched judgment extraction with the error
    * channel — spider variants (UR_Gerichte) raise on their strict
    * validation and the failure becomes a quarantine row, not a crash.
    */
  val judgmentsSpiderSafe: UserDefinedFunction =
    udf { (spider: String, rulings: String, lang: String) =>
      try SafeOutcomes(Extractors.extractJudgmentsFor(spider, rulings, lang), null)
      catch { case e: Throwable =>
        SafeOutcomes(null, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }

  /** §2.9 error channel: extraction failures become data, not log lines
    * (the reference logs + skips rows, `abstract_extractor.py:177-183`).
    * Returns struct<outcomes, error>; route `error IS NOT NULL` rows to
    * a quarantine sink so idempotent re-runs stay debuggable.
    */
  val judgmentsSafe: UserDefinedFunction =
    udf { rulings: String =>
      try SafeOutcomes(Extractors.extractJudgments(rulings), null)
      catch { case e: Throwable =>
        SafeOutcomes(null, s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }

  /** F29: token-level BIO labels for ruling-citation spans — spans come
    * from the citation regex match positions, alignment from
    * TextFunctions.bioLabels. Returns array<struct<token, label>>.
    */
  val nerBioLabels: UserDefinedFunction =
    udf { text: String =>
      if (text == null) Seq.empty[(String, String)]
      else {
        val spans = Extractors.rulingCitation.findAllMatchIn(text)
          .map(m => (m.start, m.end, "CITATION")).toSeq
        graft.functions.TextFunctions.bioLabels(text, spans)
      }
    }.asNondeterministic()

  /** F19: structured-HTML citation extraction (CH_BGer markup) —
    * returns struct<laws: array<string>, rulings: array<struct<url,
    * text>>>
    */
  val htmlCitations: UserDefinedFunction =
    udf { html: String =>
      val (laws, rulings) = Extractors.chBGerHtmlCitations(html)
      (laws, rulings.map { case (u, t) => HtmlCite(u, t) })
    }

  /** F39: full lower-court extraction (CH_BGer staged category regexes
    * + court_chambers short-code resolution); null when the reference's
    * exception-to-None paths abort.
    */
  val lowerCourt: UserDefinedFunction =
    udf { header: String => LowerCourtExtractors.chBGer(header).orNull }

  /** F36: full name → extracted first name (reference preprocess_names) */
  val firstName: UserDefinedFunction =
    udf { name: String => PeopleExtractors.firstNameOf(name).orNull }

  /** F36: full name → gender from the bundled offline table (null =
    * unknown, the reference's 'u' bucket)
    */
  val genderOfName: UserDefinedFunction =
    udf { name: String => PeopleExtractors.genderForName(name).orNull }

  /** header → court composition (F37): president/judges/clerks struct */
  val composition: UserDefinedFunction =
    udf { header: String => PeopleExtractors.parseComposition(header) }

  /** (spider, header) → court composition (F37 spider variants):
    * per-spider header slicing + role vocabulary, shared engine;
    * spiders without a config fall back to the whole-header parse
    */
  val compositionSpider: UserDefinedFunction =
    udf { (spider: String, header: String) =>
      PeopleExtractors.parseCompositionFor(spider, header) }

  /** (spider, language, header) → procedural participation (F38 spider
    * variants): per-spider regex configs dispatched like composition;
    * null = unconfigured spider / unsupported language / malformed
    * header (the reference's raise-and-skip paths → quarantine)
    */
  val participationSpider: UserDefinedFunction =
    udf { (spider: String, lang: String, header: String) =>
      ParticipationExtractors.parseParticipationFor(spider, lang, header).orNull }

  /** Split a frame carrying a `<col>.error` field into (clean rows,
    * quarantine rows) — delegates to the unified channel
    * ([[graft.sources.Quarantine]]); kept as the extractor-tier alias.
    */
  def quarantine(df: org.apache.spark.sql.DataFrame, structCol: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
    graft.sources.Quarantine.split(df, structCol)
}
