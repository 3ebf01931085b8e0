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

  /** Section kinds, in document order (mirrors scrc/enums/section.py:
    * HEADER < TOPIC < FACTS < CONSIDERATIONS < RULINGS < FOOTER).
    */
  val sectionOrder: Seq[String] =
    Seq("header", "topic", "facts", "considerations", "rulings", "footer")

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
      // NFC-normalize for MATCHING only (update_section does the same;
      // the emitted paragraph stays as-is)
      val np = java.text.Normalizer.normalize(p, java.text.Normalizer.Form.NFC)
      // check all LATER sections in order; nearest-next wins
      val jump = (idx + 1 until sectionOrder.length).find { j =>
        markers.get(sectionOrder(j)).exists(_.findFirstIn(np).isDefined)
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

  /** Language-aware spider dispatch over a config with `spider/lang`
    * keys (the ported per-spider marker corpus). Resolution mirrors the
    * reference:
    *  - `spider/lang` present → those markers;
    *  - spider implemented but NOT for this language → EMPTY markers,
    *    every paragraph lands in header (`valid_namespace`,
    *    section_splitting_functions.py:716-730 logs and continues with
    *    an empty table rather than guessing);
    *  - spider unknown → plain `spider` key, then the default table.
    */
  def splitSections(spider: String, lang: String, paragraphs: Seq[String],
                    config: MarkerConfig): Map[String, Seq[String]] = {
    val markers = config.get(s"$spider/$lang").orElse {
      if (config.keysIterator.exists(_.startsWith(spider + "/")))
        Some(Map.empty[String, Regex])
      else config.get(spider).orElse(config.get("default"))
        // spider entirely unknown to the ported corpus → the generic
        // default table (so pipelines over unregistered sources still
        // split structurally shaped documents)
        .orElse(defaultMarkers.get("default"))
    }.getOrElse(Map.empty)
    associateSections(paragraphs, markers)
  }

  // ---------------------------------------------------------------- judgments

  /** Outcome iteration order (mirrors the Judgment enum,
    * scrc/enums/judgment.py).
    */
  val judgmentOrder: Seq[String] = Seq(
    "approval", "partial_approval", "dismissal", "partial_dismissal",
    "inadmissible", "write_off", "unification")

  /** Per-language outcome marker tables, ported 1:1 from
    * judgment_extracting_functions.py:66-121 by
    * tools/port_judgment_markers.py (lists OR-joined like
    * prepare_judgment_markers, `:336-342`). Bundled as classpath DATA.
    */
  lazy val judgmentMarkersByLang: Map[String, Map[String, Regex]] = {
    val in = getClass.getResourceAsStream("/graft/judgment_markers.json")
    require(in != null, "bundled judgment markers /graft/judgment_markers.json missing")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    MarkerConfigLoader.parse(text)
  }

  /** Cross-language union table for callers with no language metadata
    * (each outcome's three per-language alternations joined).
    */
  lazy val judgmentMarkersMerged: Map[String, Regex] =
    judgmentOrder.map { o =>
      o -> judgmentMarkersByLang.values.flatMap(_.get(o)).map(_.regex)
        .mkString("|").r
    }.toMap

  /** `search_rulings` (judgment_extracting_functions.py:318-327):
    * clause between "<start>." and "<end>." (or end of string). Like
    * Python's re defaults, `.` does not cross newlines and `$` is
    * end-of-input.
    */
  // clause patterns depend only on (start, end) — a handful of values
  // (1..n arabic + roman) recompiled per ROW otherwise; cached per JVM
  private val clauseRegexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Regex]()

  private def searchRuling(text: String, start: String, end: String): Option[String] = {
    val re = clauseRegexCache.computeIfAbsent((start, end),
      { case (a, b) => s"$a\\.(.+?)(?:$b\\.|$$)".r })
    re.findFirstMatchIn(text).map(_.group(1))
  }

  /** `get_nth_ruling` (`:298-316`): arabic clause boundaries first,
    * roman-numeral retry.
    */
  private def nthRuling(text: String, n: Int): Option[String] =
    searchRuling(text, n.toString, (n + 1).toString).orElse(
      searchRuling(text, graft.functions.TextFunctions.intToRoman(n),
        graft.functions.TextFunctions.intToRoman(n + 1)))

  /** `get_judgments` + `verify_judgments` (`:219-255`, F11/F14):
    *  - numbered rulings ("1. … 2." or "I. … II.") are searched clause
    *    by clause from clause 1, collecting ALL outcomes matching the
    *    first clause that matches any — an outcome named in a later
    *    clause cannot leak in (`numbered_rulings`, `:265-275`);
    *  - unnumbered rulings keep only the outcome(s) at the earliest
    *    match position in the whole text (`getFirstInstance`,
    *    `:295-307`);
    *  - then partial_approval shadows approval and partial_dismissal
    *    shadows dismissal (`verify_judgments`).
    * Text is NFC-normalized for matching (`iterate_Judgments`).
    * Returns the outcomes sorted for deterministic output (the
    * reference returns a set).
    */
  private def extract(rulings: String, markers: Map[String, Regex]): Seq[String] = {
    if (rulings == null) return Seq.empty
    val text = java.text.Normalizer.normalize(rulings, java.text.Normalizer.Form.NFC)
    val numbered = searchRuling(text, "1", "2").isDefined ||
      searchRuling(text, "I", "II").isDefined
    val found: Set[String] =
      if (numbered) {
        var n = 1
        var out = Set.empty[String]
        var clause = nthRuling(text, n)
        while (out.isEmpty && clause.isDefined) {
          out = judgmentOrder.filter(o =>
            markers.get(o).exists(_.findFirstIn(clause.get).isDefined)).toSet
          n += 1
          if (out.isEmpty) clause = nthRuling(text, n)
        }
        out
      } else {
        val positions = judgmentOrder.flatMap(o =>
          markers.get(o).flatMap(_.findFirstMatchIn(text)).map(m => o -> m.start))
        if (positions.isEmpty) Set.empty
        else {
          val first = positions.map(_._2).min
          positions.collect { case (o, p) if p == first => o }.toSet
        }
      }
    val shadowed =
      (if (found("partial_approval")) Set("approval") else Set.empty[String]) ++
        (if (found("partial_dismissal")) Set("dismissal") else Set.empty[String])
    (found -- shadowed).toSeq.sorted
  }

  /** Language-specific extraction (the reference path — every decision
    * carries its language in the namespace).
    */
  def extractJudgments(rulings: String, lang: String): Seq[String] =
    extract(rulings, judgmentMarkersByLang.getOrElse(lang, Map.empty))

  /** Language-agnostic convenience: scan the merged de/fr/it tables. */
  def extractJudgments(rulings: String): Seq[String] =
    extract(rulings, judgmentMarkersMerged)

  // ------------------------------------------------ spider variants (F16)

  /** UR_Gerichte's own marker table (judgment_extracting_functions
    * .py:160-174 — regexes, DE only; ported verbatim incl. the
    * trailing space on the write-off marker).
    */
  val urJudgmentMarkers: Seq[(String, Seq[Regex])] = Seq(
    "approval" -> Seq("Gutheissung der Beschwerde".r,
      "Bejahung der Beschwerdelegimitation".r),
    "partial_approval" -> Seq("Teilweise Gutheissung der Beschwerde".r),
    "dismissal" -> Seq("Abweisung der Beschwerde".r,
      "Der Anzeige wird keine Folge gegeben".r,
      "Verneinung der Beschwerdelegimitation".r,
      "Abweisung der Verwaltungsgerichtsbeschwerde".r,
      "Abweisung der [Vv]erwaltungsrechtlichen Klage".r,
      "Abweisung des Gesuches um Wiederherstellung der Frist".r,
      "In concreto Abweisung der Berufung der Dienstbarkeitsbelasteten".r),
    "write_off" -> Seq("Abschreibung der Beschwerde vom Geschäftsprotokoll ".r))

  /** UR_Gerichte variant (`:151-218`): EVERY regex match anywhere in
    * the text appends its outcome (a list, not a set — two hits of the
    * same marker count twice), then STRICT validation: exactly one
    * total hit or the row errors (the reference raises; callers route
    * through the §2.9 quarantine channel). DE only, like the
    * reference. Note the faithful consequence: a partial approval also
    * hits the approval regex (substring) and therefore errors.
    */
  def extractJudgmentsUr(rulings: String, lang: String): Seq[String] = {
    if (lang != "de")
      throw new IllegalArgumentException(
        "UR_Gerichte judgment extraction is only implemented for de")
    if (rulings == null)
      throw new IllegalArgumentException("no rulings text")
    val hits = for {
      (outcome, regs) <- urJudgmentMarkers
      re <- regs
      _ <- re.findAllMatchIn(rulings)
    } yield outcome
    if (hits.isEmpty)
      throw new IllegalArgumentException(s"no main ruling found in: $rulings")
    if (hits.length > 1)
      throw new IllegalArgumentException(s"several rulings found in: $rulings")
    hits
  }

  /** Spider dispatch for judgment extraction: spiders with their own
    * logic override the global tables (the reference's
    * `getattr(module, spider)` dispatch).
    */
  def extractJudgmentsFor(spider: String, rulings: String, lang: String): Seq[String] =
    spider match {
      case "UR_Gerichte" => extractJudgmentsUr(rulings, lang)
      case _ => extractJudgments(rulings, lang)
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

  /** The full citation regex bank (F18), ported from the reference's
    * `citation_extraction/citation_regexes.json` by
    * tools/port_citation_regexes.py: ruling (BGE + BGer docket) and law
    * citation patterns per language, each shipped with its example.
    * Category keys: "ruling/BGE/de", "ruling/Bger/fr", "law/it", ...
    */
  lazy val citationRegexBank: Map[String, Seq[(Regex, String)]] = {
    val in = getClass.getResourceAsStream("/graft/citation_regexes.json")
    require(in != null, "bundled citation regex bank missing from classpath")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    MarkerConfigLoader.parseNested(text).map { case (cat, rules) =>
      cat -> rules.asInstanceOf[Map[String, Any]].toSeq.sortBy(_._1.toInt)
        .map { case (_, r) =>
          val m = r.asInstanceOf[Map[String, Any]]
          (m("regex").asInstanceOf[String].r, m("example").asInstanceOf[String])
        }
    }
  }

  /** All citation spans in `text` for the bank categories matching
    * `prefix` ("ruling", "law", "ruling/BGE", ... — empty = all).
    * Overlapping hits from different patterns of the same family are
    * deduped leftmost-longest, the conventional span-extraction rule.
    * Returns (start, end, category) sorted by position.
    */
  def findCitationSpans(text: String, prefix: String = ""): Seq[(Int, Int, String)] = {
    if (text == null) return Seq.empty
    val hits = for {
      (cat, rules) <- citationRegexBank.toSeq
      if prefix.isEmpty || cat == prefix || cat.startsWith(prefix + "/")
      (re, _) <- rules
      m <- re.findAllMatchIn(text)
    } yield (m.start, m.end, cat)
    // leftmost-longest: earlier start wins; at equal start keep the
    // longest match; drop spans inside an already-kept span
    val sorted = hits.sortBy(h => (h._1, -h._2))
    val out = Seq.newBuilder[(Int, Int, String)]
    var lastEnd = -1
    for (h <- sorted) {
      if (h._1 >= lastEnd) { out += h; lastEnd = h._2 }
    }
    out.result()
  }

  /** F19, the real shape: CH_BGer decisions carry their citations as
    * STRUCTURED markup (`citation_extracting_functions.py:55-76`) —
    * `<span class="artref">` for law citations, `<a class="bgeref_id">`
    * for BGE rulings (href + text). DOM extraction, not regex; an
    * element contributes only when it has exactly one string child
    * (bs4 `element.string` semantics). Returns (laws, (url, text)
    * rulings).
    */
  def chBGerHtmlCitations(html: String): (Seq[String], Seq[(String, String)]) = {
    if (html == null) return (Seq.empty, Seq.empty)
    val dom = graft.functions.HtmlDom.parse(html)
    val laws = graft.functions.HtmlDom.findAll(dom, "span", "artref")
      .flatMap(graft.functions.HtmlDom.soloString)
      .filter(_.nonEmpty)
    val rulings = graft.functions.HtmlDom.findAll(dom, "a", "bgeref_id")
      .flatMap(a => graft.functions.HtmlDom.soloString(a)
        .filter(_.nonEmpty)
        .map(t => (a.attrs.getOrElse("href", ""), t)))
    (laws, rulings)
  }

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
