package graft.extract

import scala.util.matching.Regex

/** Pure extraction logic — the reference's per-spider regex/extraction
  * families re-expressed as data-driven Scala functions (zero Spark
  * deps; the UDF wrapper lives in ExtractUdfs).
  *
  * Reference points (all under /root/reference/scrc/preprocessors/
  * extractors/spider_specific/):
  *  - section splitting: `section_splitting_functions.py:1034-1088`
  *    (`associate_sections` — ordered fold over paragraphs; a paragraph
  *    matching the NEXT section's marker advances the current section)
  *    and `:716-760` (`prepare_section_markers` — per-language marker
  *    lists OR-joined into one regex per section)
  *  - judgment outcomes: `judgment_extracting_functions.py:66-121`
  *    (marker dicts) and `:218-305` (numbered-ruling search, earliest
  *    match wins) and `scrc/utils/sql_select_utils.py:361-410`
  *    (`convert_to_binary_judgments` suppression rules)
  *  - ruling citations: `scrc/data_classes/ruling_citation.py:5-61`
  *    (BGE year/volume/page parse)
  *
  * The ~60 per-spider marker tables in the reference are config DATA,
  * not code (SURVEY §7.5 hard part 2) — here they are `Map`s keyed by
  * (spider, section); production would load them from JSON config and
  * broadcast.
  */
object Extractors {

  // ---------------------------------------------------------------- sections

  /** Section kinds, in document order (mirrors scrc/enums/section.py). */
  val sectionOrder: Seq[String] =
    Seq("header", "facts", "considerations", "rulings", "footer")

  /** Marker config: spider → section → regex. The fold only ever looks
    * for the NEXT section's marker, so a marker hit mid-document cannot
    * jump backwards.
    */
  type MarkerConfig = Map[String, Map[String, Regex]]

  val defaultMarkers: MarkerConfig = Map(
    "default" -> Map(
      "facts" -> "(?i)^(sachverhalt|faits|fatti|facts)\\b".r,
      "considerations" -> "(?i)^(erw[äa]gungen|consid[ée]rants?|considerando|considerations)\\b".r,
      "rulings" -> "(?i)^(demnach erkennt|par ces motifs|per questi motivi|rulings)\\b".r,
      "footer" -> "(?i)^(rechtsmittelbelehrung|voies? de droit|footer)\\b".r))

  /** Ordered fold over paragraphs: start in the first section; a
    * paragraph matching the next section's marker advances. Returns
    * section → paragraphs (marker paragraph included in its section).
    */
  def associateSections(paragraphs: Seq[String],
                        markers: Map[String, Regex]): Map[String, Seq[String]] = {
    val out = scala.collection.mutable.Map.empty[String, Vector[String]]
    var idx = 0 // current position in sectionOrder
    for (p <- paragraphs) {
      // check all LATER sections in order; nearest-next wins
      val jump = (idx + 1 until sectionOrder.length).find { j =>
        markers.get(sectionOrder(j)).exists(_.findFirstIn(p).isDefined)
      }
      jump.foreach(idx = _)
      val sec = sectionOrder(idx)
      out(sec) = out.getOrElse(sec, Vector.empty) :+ p
    }
    out.toMap
  }

  /** Spider-dispatched section splitting (the §2.9 dynamic dispatch —
    * unknown spiders fall back to the default logic, like XX_SPIDER).
    */
  def splitSections(spider: String, paragraphs: Seq[String],
                    config: MarkerConfig = defaultMarkers): Map[String, Seq[String]] =
    associateSections(paragraphs,
      config.getOrElse(spider, config("default")))

  // ---------------------------------------------------------------- judgments

  /** Outcome markers (judgment_extracting_functions.py:66-121 compressed
    * to the structural cases; per-language variants are config data).
    */
  val judgmentMarkers: Map[String, Seq[String]] = Map(
    "approval" -> Seq("gutgeheissen", "admis", "accolto", "approved"),
    "partial_approval" -> Seq("teilweise gutgeheissen", "partiellement admis", "partially approved"),
    "dismissal" -> Seq("abgewiesen", "rejeté", "respinto", "dismissed"),
    "partial_dismissal" -> Seq("teilweise abgewiesen", "partially dismissed"),
    "inadmissible" -> Seq("nicht eingetreten", "irrecevable", "inadmissible"),
    "write_off" -> Seq("abgeschrieben", "radiée", "written off"),
    "unification" -> Seq("vereinigt", "jointes", "unified"))

  /** Earliest-match-wins outcome scan; longer (partial_*) markers beat
    * their substrings at the same position.
    */
  def extractJudgments(rulings: String): Seq[String] = {
    if (rulings == null) return Seq.empty
    val lower = rulings.toLowerCase
    val hits = for {
      (outcome, words) <- judgmentMarkers.toSeq
      w <- words
      pos = lower.indexOf(w)
      if pos >= 0
    } yield (outcome, pos, w.length)
    // at equal position, the longer marker (partial_) wins; drop the
    // shadowed plain outcome found at the same spot
    val best = hits.groupBy(_._2).values.map(_.maxBy(_._3)._1).toSeq
    val shadowed = best.collect {
      case o if o.startsWith("partial_") => o.stripPrefix("partial_")
    }.toSet
    best.filterNot(shadowed).distinct.sorted
  }

  /** convert_to_binary_judgments (sql_select_utils.py:361-410): strip
    * partial_, drop procedural outcomes, resolve multi-label to None.
    */
  def toBinaryJudgment(outcomes: Seq[String]): Option[String] = {
    val mapped = outcomes.map(_.stripPrefix("partial_"))
      .filterNot(Set("write_off", "unification", "inadmissible"))
      .distinct
    mapped match {
      case Seq(one) => Some(one)
      case _ => None // empty or contradictory
    }
  }

  // ---------------------------------------------------------------- citations

  /** BGE ruling citation: "BGE 123 II 456" → (year-ish volume book page).
    * ATF/DTF are the fr/it prefixes (ruling_citation.py:5-61).
    */
  val rulingCitation: Regex = "(?:BGE|ATF|DTF) (\\d{1,3}) ([IVX]+) (\\d{1,3})".r

  case class RulingCite(volume: Int, book: Int, page: Int)

  def parseRulingCitations(text: String): Seq[RulingCite] =
    if (text == null) Seq.empty
    else rulingCitation.findAllMatchIn(text).map { m =>
      RulingCite(m.group(1).toInt,
        graft.functions.TextFunctions.romanToInt(m.group(2)), m.group(3).toInt)
    }.toSeq

  // ------------------------------------------------------------- law citations

  /** Parsed law citation (F21, `scrc/data_classes/law_citation.py:10-72`):
    * article may be non-numeric ("7a"); sr_number resolved via the
    * abbreviation table (case-insensitive), unresolvable → None.
    */
  case class LawCite(article: String, abbreviation: String, srNumber: String)

  /** Law-abbreviation table (production: loaded from the legislation
    * corpus and broadcast; `doc2doc_ir_dataset_creator.py:232-249`).
    */
  val defaultLawAbbrs: Map[String, String] = Map(
    "bgg" -> "173.110", "zgb" -> "210", "or" -> "220", "stgb" -> "311.0",
    "co" -> "220", "cc" -> "210", "bv" -> "101", "atsg" -> "830.1")

  /** Parse "Art. 95 BGG" / "art. 42 CO" / "§ 29 VRG"-style citations:
    * language style from the leading keyword, `§` normalized to the
    * article word, a missing dot after "Art" inserted, abbreviation
    * resolved against the table. Returns None for anything that does
    * not parse or resolve (F22 convertibility filter).
    */
  def parseLawCitation(citation: String,
                       lawAbbrs: Map[String, String] = defaultLawAbbrs): Option[LawCite] = {
    if (citation == null) return None
    val articleWord =
      if (citation.startsWith("Art") || citation.contains("Abs") ||
        citation.contains("Ziff") || citation.contains("§")) "Art."
      else "art."
    var s = citation.trim.replace("§", articleWord)
    // insert the dot after a bare "Art"/"art"
    if (s.toLowerCase.startsWith(articleWord.substring(0, 3).toLowerCase) &&
      s.length > 3 && s.charAt(3) != '.')
      s = s.substring(0, 3) + "." + s.substring(3)
    if (!s.toLowerCase.startsWith(articleWord.toLowerCase)) return None
    var parts = s.split(" ").toSeq.filter(_.nonEmpty)
    // "Art.95 BGG" → ["Art.", "95", "BGG"]
    if (parts.length == 2 && parts.head.length > articleWord.length)
      parts = Seq(articleWord, parts.head.substring(articleWord.length), parts(1))
    if (parts.length < 3) return None
    val article = parts(1)
    val abbreviation = parts.last
    lawAbbrs.get(abbreviation.toLowerCase)
      .map(sr => LawCite(article, abbreviation, sr))
  }

  // --------------------------------------------------------- BGer file numbers

  /** BGer docket patterns (F23, `bge_reference_extracting_functions
    * .py:36-40`): "5A_123/2019", "5A.123/2019", "5A 123/2019" and the
    * old-register "B 45/06" form.
    */
  val bgerReference: Regex =
    "(\\d\\D?_\\d{1,4}/\\d{4}|\\d\\D?\\.\\d{1,4}/\\d{4}|\\d\\D?\\s\\d{1,4}/\\d{4}|[BIPK]\\s\\d{1,3}/\\d{2}\\D)".r

  /** Normalize found references to the canonical joined form
    * (`convert_found_to_reference`, `:14-26`): old-register trailing
    * non-digit dropped, spaces/dots → underscores, commas removed,
    * multiple references joined with "-".
    */
  def normalizeBgeReferences(refs: Seq[String]): String =
    refs.map { r =>
      val trimmedTail =
        if ("[BIPK]\\s\\d{1,3}/\\d{2}\\D".r.matches(r)) r.dropRight(1) else r
      trimmedTail.trim.replace(" ", "_").replace(".", "_").replace(",", "")
    }.mkString("-")

  /** Find + normalize all BGer references in a header (F23). */
  def extractBgerReferences(header: String): Option[String] = {
    if (header == null) return None
    val found = bgerReference.findAllIn(header).toSeq
    if (found.isEmpty) None else Some(normalizeBgeReferences(found))
  }
}
