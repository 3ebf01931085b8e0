package graft.extract

import scala.util.matching.Regex

/** Court-composition, procedural-participation and lower-court parsers
  * (SURVEY F37/F38/F39) — the reference implements these as ~1500 LoC
  * of per-spider functions (`spider_specific/
  * court_composition_extracting_functions.py`,
  * `procedural_participation_extracting_functions.py`,
  * `lower_court_extracting_functions.py`); the structural logic below
  * is role-keyword-driven and language-configurable, with per-spider
  * variations left to config (same dispatch shape as Extractors).
  */
object PeopleExtractors {

  case class Person(name: String, gender: Option[String])
  case class CourtComposition(president: Option[Person],
                              judges: Seq[Person], clerks: Seq[Person])
  /** counsel with the reference's fields: legal_type "natural person"/
    * "legal entity", gender None = unknown, honorific titles kept
    */
  case class LegalCounsel(name: String, legalType: String,
                          gender: Option[String], titles: Seq[String])
  case class PartySide(name: String, counsel: Seq[LegalCounsel])
  case class Participation(plaintiffs: Seq[PartySide], defendants: Seq[PartySide])
  case class LowerCourt(court: String, date: Option[String])

  /** Sanity cap from the reference (`court_composition_extracting_
    * functions.py:100-103`): more than 5 judges means the parse ran
    * away — return empty instead of garbage.
    */
  val MaxJudges = 5

  // judge role: any compound ending in richter(in) (Bundes-, Ober-,
  // Steuer-, Bau-, Ersatz-, Kassations-, Sozialversicherungs-, …),
  // vice-president roles (judges, NOT president), plus fr/it forms
  private val judgeRole: Regex =
    "(?i)([a-zäöü]*richter(in)?|(abteilungs)?vizepräsident(in)?|juge|giudice)".r
  // judge role that also marks the NEXT person as president
  private val presidingRole: Regex = "(?i)abteilungspräsident(in)?".r
  private val clerkRole: Regex =
    "(?i)(gerichtsschreiber(in)?|gerichtssekretär(in)?|sekretär(in)?|greffi[èe]re?|cancellier[ea])".r
  // apposition after a name: marks the LAST person as president
  private val presidentApposition: Regex =
    "(?i)(vorsitz(ende[rn]?)?|pr[äa]sident(in)?|pr[ée]sidente?|presidente)".r
  // gender modifiers following a role word (fr)
  private val femaleModifier: Regex = "(?i)(fédérale|federale)".r
  private val maleModifier: Regex = "(?i)(fédéral|federale?)".r

  private val skipTokens: Set[String] = Set(
    "besetzung", "composition", "composizione", "mitwirkend", "mitwirkende",
    "lic.", "iur.", "dr.", "mlaw", "m.a.", "hsg", "mag.", "oec.", "publ.",
    "et", "ra", "prof.", "die", "der", "das", "le", "la", "m.", "mme")

  // once a role context exists, these tokens end the composition block
  private val stopTokens: Set[String] = Set(
    "urteil", "entscheid", "zirkulationsbeschluss", "beschluss", "in", "vom",
    "betreffend")

  private def femaleRole(tok: String): Boolean = {
    val t = tok.toLowerCase
    t.endsWith("in") || t.endsWith("ère") || t.endsWith("iera")
  }

  // ------------------------------------------------------ gender lookup (F36)

  /** Offline first-name → gender table (the reference backs its
    * `person.gender` enrichment with a genderize.io-filled local file,
    * `name_to_gender.py:24-77`; here the data ships as a bundled
    * resource and is broadcast for the enrichment join).
    */
  lazy val nameGender: Map[String, String] = {
    val in = getClass.getResourceAsStream("/graft/name_gender.json")
    require(in != null, "bundled name-gender table missing from classpath")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    MarkerConfigLoader.parseNested(text)("names")
      .asInstanceOf[Map[String, Any]].map { case (k, v) => k -> v.asInstanceOf[String] }
  }

  /** `preprocess_names` (name_to_gender.py:64-69): strip dots, take
    * the first token unless it is an initial or a title (Dr/dott) —
    * then take the second.
    */
  def firstNameOf(name: String): Option[String] = {
    if (name == null) return None
    val parts = name.trim.replace(".", "").split("\\s+").filter(_.nonEmpty)
    if (parts.isEmpty) None
    else if (parts.length == 1 ||
      (parts(0).length > 1 && parts(0) != "dott" && parts(0) != "Dr"))
      Some(parts(0))
    else Some(parts(1))
  }

  /** Lookup gender for a full name (case-insensitive on the extracted
    * first name); None = not in the table (the reference's 'u' bucket).
    */
  def genderForName(name: String): Option[String] =
    firstNameOf(name).flatMap(f => nameGender.get(f.toLowerCase))

  /** Per-spider composition variant (F37 spider functions,
    * `court_composition_extracting_functions.py:252-519`): each spider
    * contributes a header SLICE (start marker → end marker) plus any
    * role vocabulary beyond the shared `-richter`/`-präsident`/clerk
    * compounds; the parse engine itself is shared. `assumeJudge` mirrors
    * the reference's `current_role = CourtRole.JUDGE` initial state —
    * needed because the start markers (`Mitwirkende|Einzelrichter`)
    * CONSUME the first role word, so a leading bare name is a judge.
    */
  final case class CompositionSpider(start: Regex, end: Regex,
                                     unknownGenderJudges: Option[Regex] = None)

  /** The reference's six explicitly-parameterized spiders
    * (`court_composition_extracting_functions.py:252,304,345,388,435,480`).
    * End markers here truncate at the match START — the reference keeps
    * the marker then drops it again via `rsplit(' ', n)[0]`, which is
    * the same region.
    */
  val compositionSpiders: Map[String, CompositionSpider] = Map(
    "ZG_Verwaltungsgericht" -> CompositionSpider(
      "Mitwirkende|Einzelrichter".r, "Urteil|Zwischenentscheid".r),
    "ZH_Baurekurs" -> CompositionSpider(
      "Mitwirkende".r, "in Sachen".r),
    "ZH_Obergericht" -> CompositionSpider(
      "Mitwirkend".r,
      "Zirkulationsbeschluss vom|Beschluss vom|Urteil vom|Verfügung vom|Beschluss und|in Sachen".r),
    "ZH_Sozialversicherungsgericht" -> CompositionSpider(
      "Mitwirkende|Einzelrichter|Kammer".r, "Urteil vom|in Sachen".r),
    "ZH_Steuerrekurs" -> CompositionSpider(
      "Mitwirkend".r, "[Ii]n Sachen".r,
      // roles with no grammatical gender (`:457-459`)
      unknownGenderJudges = Some("(?i)(ersatz)?mitglied(er)?".r)),
    "ZH_Verwaltungsgericht" -> CompositionSpider(
      "Mitwirkend".r, "[Ii]n Sachen".r))

  // spaced-capitals document-kind words regularized before slicing
  // (`:274-277`) so the end markers can match them
  private def regularizeSpaced(h: String): String = h
    .replace("U R T E I L", "Urteil").replace("U R TE I L", "Urteil")
    .replace("URTEIL", "Urteil")
    .replace("Z W I S C H E N E N T S C H E I D", "Zwischenentscheid")

  /** Spider-dispatched composition parse: slice the header region per
    * the spider's markers, then run the shared engine; spiders without
    * a config use the generic whole-header parse (XX_SPIDER shape).
    */
  def parseCompositionFor(spider: String, header: String): CourtComposition =
    compositionSpiders.get(if (spider == null) "" else spider) match {
      case None => parseComposition(header)
      case Some(c) =>
        if (header == null) return CourtComposition(None, Nil, Nil)
        val h = regularizeSpaced(header)
        val afterStart = c.start.findFirstMatchIn(h)
          .map(m => h.substring(m.end)).getOrElse(h)
        val sliced = c.end.findFirstMatchIn(afterStart)
          .map(m => afterStart.substring(0, m.start)).getOrElse(afterStart)
        parseComposition(sliced, c.unknownGenderJudges, assumeJudge = true)
    }

  /** Parse a composition header (any of the reference's layouts: role
    * keyword per name, plural role + name list, combined judge+clerk
    * lines, title noise) into president/judges/clerks. Token-stream
    * state machine: role keywords set the active role + gender context,
    * separators flush the accumulated name, president appositions mark
    * the preceding person, stop words end the block.
    */
  def parseComposition(header: String): CourtComposition =
    parseComposition(header, None, assumeJudge = false)

  def parseComposition(header: String, unknownGenderJudges: Option[Regex],
                       assumeJudge: Boolean): CourtComposition = {
    if (header == null) return CourtComposition(None, Nil, Nil)
    var judges = Vector.empty[Person]
    var clerks = Vector.empty[Person]
    var president: Option[Person] = None
    // sliced spider headers start in judge context (the start marker
    // consumed the first role word) — `find_composition`'s initial
    // `current_role = CourtRole.JUDGE`
    var role: String = if (assumeJudge) "judge" else "" // "", "judge", "clerk"
    var gender: Option[String] = None
    var presidentNext = false
    var buf = Vector.empty[String]
    var last: Option[Person] = None
    var stopped = false

    def flush(): Unit = {
      if (buf.nonEmpty && role.nonEmpty) {
        val p = Person(buf.mkString(" "), gender)
        if (role == "judge") judges :+= p else clerks :+= p
        last = Some(p)
        if (presidentNext) { president = Some(p); presidentNext = false }
      }
      buf = Vector.empty
    }

    val rawTokens = header.split("\\s+").filter(_.nonEmpty)
    for (raw <- rawTokens if !stopped) {
      val hadComma = raw.endsWith(",") || raw.endsWith(";")
      // strip parens and trailing separators; keep short initials' dots
      var tok = raw.replaceAll("[()\\[\\]]", "").replaceAll("[,;:]+$", "")
      if (tok.length > 3 && tok.endsWith(".")) tok = tok.dropRight(1)
      val low = tok.toLowerCase

      if (tok.isEmpty) ()
      else if (skipTokens.contains(low) || skipTokens.contains(low + ".")) ()
      else if (role.nonEmpty && stopTokens.contains(low)) { flush(); stopped = true }
      // a bare capital letter mid-stream ("U R T E I L") ends the block
      else if (role.nonEmpty && tok.matches("[A-ZÄÖÜ]")) { flush(); stopped = true }
      else if (presidingRole.matches(tok)) {
        flush(); role = "judge"; gender = Some(if (femaleRole(tok)) "f" else "m")
        presidentNext = true
      }
      else if (judgeRole.matches(tok) && low != "richter:" ) {
        flush(); role = "judge"
        // fr/it 'juge'/'giudice' carry no grammatical gender — leave
        // unknown for the offline-table enrichment (F36) instead of
        // guessing; a following modifier (fédérale) still refines it
        gender = if (low == "juge" || low == "giudice") None
        else Some(if (femaleRole(tok)) "f" else "m")
      }
      else if (clerkRole.matches(tok)) {
        flush(); role = "clerk"; gender = Some(if (femaleRole(tok)) "f" else "m")
      }
      // spider-specific roles with no grammatical gender (Mitglied,
      // Ersatzmitglied — ZH_Steuerrekurs `:457-459`): judge, gender
      // left for the offline-table enrichment
      else if (unknownGenderJudges.exists(_.matches(tok))) {
        flush(); role = "judge"; gender = None
      }
      else if (role.nonEmpty && buf.isEmpty && femaleModifier.matches(tok)) gender = Some("f")
      else if (role.nonEmpty && buf.isEmpty && maleModifier.matches(tok)) gender = Some("m")
      else if (presidentApposition.matches(tok) && (buf.nonEmpty || last.isDefined)) {
        flush()
        if (president.isEmpty) president = last
      }
      // leading form "Präsident Niklaus" (find_composition case 1,
      // `court_composition_extracting_functions.py:664-681`): no person
      // parsed yet, so the NEXT flushed person is the president
      else if (presidentApposition.matches(tok) && role.nonEmpty) {
        // gender only from the gendered -präsident forms; bare Vorsitz
        // keeps the running gender (`:674-678`)
        if (tok.toLowerCase.contains("präsid") || tok.toLowerCase.contains("présid"))
          gender = Some(if (femaleRole(tok)) "f" else "m")
        presidentNext = true
      }
      else if (low == "und" || low == "sowie" || low == "e") flush()
      else if (role.nonEmpty) {
        buf :+= tok
        if (hadComma) flush()
      }
      // tokens before any role context are header noise — ignored
    }
    flush()
    if (judges.length > MaxJudges) CourtComposition(None, Nil, Nil)
    else CourtComposition(president, judges, clerks)
  }

  private def cleanName(s: String): String = {
    val t = s.replaceAll("[,;]\\s*$", "").replaceAll("\\s+", " ").trim
    // strip a trailing period only when it ends a full word, never an
    // initial ("C. D." stays, "Henseler." loses the dot)
    val lastTok = t.split(" ").lastOption.getOrElse("")
    if (lastTok.endsWith(".") && lastTok.length > 3) t.dropRight(1) else t
  }

  private val counselTrigger: Regex =
    "(?i)vertreten durch|représenté(?:e)? par|patrocinat[oa] da".r

  // lawyer role word → gender ("" = unknown); presence ⇒ natural person
  private val lawyerRoles: Map[String, String] = Map(
    "rechtsanwalt" -> "m", "rechtsanwältin" -> "f",
    "advokat" -> "m", "advokatin" -> "f",
    "fürsprecher" -> "m", "fürsprecherin" -> "f",
    "avocat" -> "m", "avocate" -> "f", "ra" -> "")

  private val counselTitles = Set("dr.", "prof.")
  private val counselSkip = Set("lic.", "iur.", "mag.", "et", "oec.", "publ.",
    "mlaw", "m.a.", "hsg", "das", "die", "der", "den", "kant.")

  /** One counsel from the text directly after a "vertreten durch" up to
    * the next comma: lawyer role words ⇒ natural person with gender
    * (the bare "RA" abbreviation leaves gender unknown), otherwise a
    * legal entity; titles (Dr., Prof.) collected, qualifier noise
    * stripped.
    */
  private def parseCounsel(segment: String): Option[LegalCounsel] = {
    var legalType = "legal entity"
    var gender: Option[String] = None
    var titles = Vector.empty[String]
    var name = Vector.empty[String]
    for (raw <- segment.split("\\s+").filter(_.nonEmpty)) {
      val tok = raw.replaceAll("[\\[\\]()]", "")
      val low = tok.toLowerCase
      if (tok.isEmpty || low == "...") ()
      else if (lawyerRoles.contains(low)) {
        legalType = "natural person"
        gender = Some(lawyerRoles(low)).filter(_.nonEmpty)
      }
      else if (counselTitles.contains(low)) titles :+= tok
      else if (counselSkip.contains(low)) ()
      else name :+= tok
    }
    if (name.isEmpty) None
    else Some(LegalCounsel(cleanName(name.mkString(" ")), legalType, gender, titles))
  }

  /** Parse the party block: "<side> gegen <side>"; each side may carry
    * any number of "vertreten durch <counsel>" attachments (the
    * reference emits them per party; here all of a side's counsel
    * attach to that side).
    */
  def parseParticipation(block: String): Participation = {
    if (block == null) return Participation(Nil, Nil)
    val sides = block.split("(?i)\\bgegen\\b|\\bcontre\\b|\\bcontro\\b", 2)
    def parseSide(s: String): Seq[PartySide] = {
      val partyName = s.split("[,;]").map(_.trim)
        .filterNot(seg => seg.isEmpty || seg.equalsIgnoreCase("in sachen"))
        .headOption.getOrElse("")
      val counsel = counselTrigger.split(s).drop(1).toSeq
        .flatMap(after => parseCounsel(after.split("[,;]")(0)))
      if (partyName.isEmpty && counsel.isEmpty) Nil
      else Seq(PartySide(cleanName(partyName), counsel))
    }
    Participation(
      parseSide(sides(0)),
      if (sides.length > 1) parseSide(sides(1)) else Nil)
  }

  private val lowerCourtRe: Regex =
    "(?i)(?:urteil|entscheid|beschluss|verfügung|arrêt|jugement|sentenza)\\s+(?:des|der|du|de la|della|del)\\s+(.+?)\\s+vom\\s+(\\d{1,2}\\.\\s*\\p{L}+\\s*\\d{4})".r

  /** Parse "… gegen das Urteil des Obergerichts … vom 12. März 2019". */
  def parseLowerCourt(text: String): Option[LowerCourt] =
    if (text == null) None
    else lowerCourtRe.findFirstMatchIn(text)
      .map(m => LowerCourt(cleanName(m.group(1)), Some(m.group(2).trim)))
}
