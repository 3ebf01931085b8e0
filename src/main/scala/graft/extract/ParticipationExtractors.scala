package graft.extract

import java.util.regex.Pattern

import scala.util.matching.Regex

/** Spider-dispatched procedural-participation extraction (SURVEY F38).
  *
  * The reference parameterizes seven spiders with their own regex
  * configs (`spider_specific/procedural_participation_extracting_
  * functions.py`): CH_BGer ships a trilingual config of its own
  * (`:33-205`), and six ZG/ZH spiders share the `get_regex()` config
  * (`:321-352`) plus the module-level engine (`:356-569`). This file
  * ports both configs as DATA (`participationSpiders`, mirroring
  * `PeopleExtractors.compositionSpiders`) over one shared engine.
  *
  * Behavioral differences between the two reference variants are
  * config flags, traced from the source:
  *   - the shared engine extracts academic titles (`search_titles`,
  *     `:376-402`, the `Title` enum in declaration order) and strips
  *     lawyer names; CH_BGer's inner `search_lawyers` (`:102-120`)
  *     does neither — names keep their leading whitespace;
  *   - the shared engine refuses redacted representations
  *     (`vertreten durch [..`, `:460-461`); CH_BGer has no guard;
  *   - the shared engine treats a lawyer with no findable name as a
  *     hard error (`None.strip()` raises, `:435-437`) — here that
  *     quarantines the document (None), matching the reference's
  *     log-and-skip row handling; CH_BGer appends the nameless
  *     counsel (`:116`);
  *   - the shared config knows the genderless `RA` abbreviation
  *     (`Gender.UNKNOWN`, `:340`) — gender stays None.
  *
  * A malformed header (fewer than two party sides after the split,
  * `:192-193`/`:556-557`) raises in the reference and the extractor
  * skips the row — modeled as None (the §2.9 quarantine channel).
  * Python `\w`/`\b` are unicode-aware, so ported classes carry `(?U)`.
  * Counsel dedup follows the reference's `LegalCounsel.__eq__`
  * ((legal_type, name, gender) — titles excluded) but keeps first-seen
  * order where Python's `list(set(..))` is arbitrary.
  */
object ParticipationExtractors {
  import PeopleExtractors.LegalCounsel

  /** party with the reference's ProceedingsParty fields; gender None
    * covers both Python None and Gender.UNKNOWN
    */
  case class ProceedingsParty(name: String, gender: Option[String],
                              legalType: String, counsel: Seq[LegalCounsel])
  case class SpiderParticipation(plaintiffs: Seq[ProceedingsParty],
                                 defendants: Seq[ProceedingsParty])

  /** one spider's regex parameterization (the arguments the reference
    * threads through `get_procedural_participation`)
    */
  final case class ParticipationSpider(
    informationStart: Regex,
    startFallbacks: Seq[Regex],
    endMarkers: Map[String, Seq[Regex]],
    secondPartySplit: Pattern,
    representationStart: Regex,
    partyGender: Seq[(String, Regex)],
    lawyerGender: Seq[(Option[String], Regex)],
    lawyerName: Map[String, Regex],
    entityNameBounded: Regex,
    entityNameBare: Regex,
    extractTitles: Boolean,
    redactionGuard: Boolean,
    namelessLawyerFatal: Boolean)

  /** CH_BGer trilingual config (`procedural_participation_extracting_
    * functions.py:43-93`)
    */
  private val chBGer = ParticipationSpider(
    informationStart = ("Parteien|Verfahrensbeteiligte|[Ii]n Sachen|Parties|" +
      "Participants à la procédure|formée? par|[Dd]ans la cause|Parti|" +
      "Partecipanti al procedimento|Visto il ricorso.*?da").r,
    startFallbacks = Seq("Gerichtsschreiber.*?\\.".r,
      "[Gg]reffi[eè]re?.*?\\S{2,}?\\.".r),
    endMarkers = Map(
      // the reference's lookbehind forms cut right AFTER the word
      // (`(?<=Beschwerdegegnerin).+?` — match start is the position
      // past it); plain forms cut AT the word
      "de" -> Seq("(?<=Beschwerdegegnerin).".r, "(?<=Beschwerdegegner).".r,
        "Gegenstand".r, "A\\.\\- ".r, "gegen das Urteil".r),
      "fr" -> Seq("Objet".r, "Vu".r),
      "it" -> Seq("Oggetto".r)),
    secondPartySplit = Pattern.compile(
      "gegen|contre|(?<=,) et|" +
        "contro(?! l[ao] (?:decisione|sentenza|risoluzione|scritto))|" +
        "contro l.*?che (?:l[oai] )?oppone (?:(?:il|l[oai]) ricorrente)?"),
    representationStart = ("vertreten durch|représentée? par|p\\.a\\.|" +
      "patrocinat[oia]|rappresentat[oia]|presso").r,
    partyGender = Seq(
      "m" -> "Beschwerdeführer(?!in)|Beschwerdegegner(?!in)|recourant(?!e)|intimés?(?!e)|ricorrente".r,
      "f" -> "Beschwerdeführerin|Beschwerdegegnerin|recourantes?|intimées?".r),
    lawyerGender = Seq(
      Some("m") -> "Rechtsanwalt|Fürsprecher(?!in)|Advokat(?!in)|avocats?(?!e)|dall'avv\\.|l'avv\\.".r,
      Some("f") -> "Rechtsanwältin|Fürsprecherin|Advokatin|avocates?".r),
    lawyerName = Map(
      "de" -> "(?U)((Dr\\.\\s)|(Prof\\.\\s))*[\\w\\séäöü\\.]*?(?=(,)|(.$)|. Gegen| und)".r,
      "fr" -> ("(?U)(?<=Me\\s)[\\w\\séèäöü\\.\\-]*?(?=,| et)|" +
        "(?<=Mes\\s)[\\w\\séèäöü\\.\\-]*?(?=,| et)|" +
        "(?<=Maître\\s)[\\w\\séèäöü\\.\\-]*?(?=,| et)").r,
      "it" -> "(lic\\.?\\s?|iur\\.?\\s?|dott\\.\\s?)*[A-Z].*?(?=,)".r),
    entityNameBounded = "(?U)[A-Z][\\w\\s\\.\\-\\']*(?=,)".r,
    entityNameBare = "(?U)[A-Z][\\w\\s\\.\\-\\']*".r,
    extractTitles = false,
    redactionGuard = false,
    namelessLawyerFatal = false)

  /** the six ZG/ZH spiders' shared config (`get_regex`, `:321-352`) */
  private val shared = ParticipationSpider(
    informationStart = "Parteien|Verfahrensbeteiligte|[Ii]n Sachen".r,
    startFallbacks = Seq("Gerichtsschreiber.*?\\.".r),
    endMarkers = Map(
      "de" -> Seq("betreffend".r, "Sachverhalt".r, "Gegenstand".r,
        "gegen das Urteil".r)),
    secondPartySplit = Pattern.compile("gegen"),
    representationStart = "vertreten durch".r,
    partyGender = Seq(
      "m" -> ("Beschwerdeführer(?!in)|Beschwerdegegner(?!in)|Antragsteller(?!in)|" +
        "Antragsgegner(?!in)|Rekurrent(?!in)|Rekursgegner(?!in)").r,
      "f" -> ("Beschwerdeführerin|Beschwerdegegnerin|Antragstellerin|" +
        "Antragsgegnerin|Rekurrentin|Rekursgegnerin").r),
    lawyerGender = Seq(
      Some("m") -> "Rechtsanwalt|Fürsprecher(?!in)|Advokat(?!in)".r,
      Some("f") -> "Rechtsanwältin|Fürsprecherin|Advokatin".r,
      None -> "RA".r),
    lawyerName = Map(
      "de" -> "(?U)((Dr\\.\\s)|(Prof\\.\\s))*[A-Za-zÀ-ž0-9\\s\\.\\-\\_\\']*?(?=(,)|($)| Gegen| und)".r),
    entityNameBounded = "(?U)[A-Z][A-Za-zÀ-ž0-9\\s\\.\\-\\_\\'\\&]*(?=\\b)".r,
    entityNameBare = "(?U)[A-Z][A-Za-zÀ-ž0-9\\s\\.\\-\\_\\'\\&]*".r,
    extractTitles = true,
    redactionGuard = true,
    namelessLawyerFatal = true)

  /** spider → config, the `compositionSpiders` dispatch shape; spiders
    * not in the map have no reference participation function → None
    */
  val participationSpiders: Map[String, ParticipationSpider] = Map(
    "CH_BGer" -> chBGer,
    "ZG_Verwaltungsgericht" -> shared,
    "ZH_Baurekurs" -> shared,
    "ZH_Obergericht" -> shared,
    "ZH_Sozialversicherungsgericht" -> shared,
    "ZH_Steuerrekurs" -> shared,
    "ZH_Verwaltungsgericht" -> shared)

  /** `Title` enum values in declaration order (`enums/title.py`) plus
    * the alternative spellings `search_titles` adds (`:397-399`); each
    * value doubles as the removal regex exactly like the reference
    * (`re.sub(title, ...)` — '.' is a wildcard there too)
    */
  private val titleValues: Seq[(String, String)] = Seq(
    "Prof." -> "Prof.", "Dr." -> "Dr.", "lic." -> "lic.", "iur." -> "iur.",
    "phil." -> "phil.", "mag." -> "mag.", "oec." -> "oec.", "publ." -> "publ.",
    "rer." -> "rer.", "pol." -> "pol.", "dipl." -> "dipl.", "eidg." -> "eidg.",
    "a.o." -> "a.o.", "MLaw" -> "MLaw", "BLaw" -> "BLaw", "M.A." -> "M.A.",
    "B.A." -> "B.A.", "HSG" -> "HSG", "LL.M." -> "LL.M.",
    "jur." -> "iur.", "LLM" -> "LL.M.", "LL. M." -> "LL.M.")

  // (containment needle, removal pattern, canonical value) hoisted —
  // compiling 22 Patterns per counsel call was per-row hot-path waste
  private val titleMatchers: Seq[(String, Pattern, String)] =
    titleValues.map { case (pat, value) =>
      (pat.toLowerCase,
        Pattern.compile(pat, Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE),
        value)
    }

  /** `search_titles` (`:376-402`): literal containment check, regex
    * removal (case-insensitive), ' et ' joined titles pre-collapsed
    */
  def searchTitles(text0: String): (Seq[String], String) = {
    var text = text0.replace(" et ", " ")
    var lower = text.toLowerCase // refreshed only when a removal fires
    var titles = Vector.empty[String]
    for ((needle, matcher, value) <- titleMatchers)
      if (lower.contains(needle)) {
        titles :+= value
        text = matcher.matcher(text).replaceAll("")
        lower = text.toLowerCase
      }
    (titles, text)
  }

  /** signal for the shared engine's hard-error paths (the reference
    * raises and the extractor skips the row)
    */
  private final class MalformedHeader extends RuntimeException

  /** `search_lawyers` (`:102-120` CH_BGer / `:405-441` shared): one
    * counsel per gender category whose role regex hits; name from the
    * text after the role word unless it is immediately followed by a
    * comma, else from before it.
    */
  private def searchLawyers(text: String, cfg: ParticipationSpider,
                            lang: String): Seq[LegalCounsel] =
    cfg.lawyerName.get(lang) match {
      case None => Nil
      case Some(nameRe) => cfg.lawyerGender.flatMap { case (gender, roleRe) =>
        roleRe.findFirstMatchIn(text).map { pos =>
          val g = if (lang == "it") None else gender
          val after = text.substring(pos.end)
          val commaAfterRole = pos.end < text.length && text.charAt(pos.end) == ','
          val forward = nameRe.findFirstMatchIn(after)
            .filter(m => !commaAfterRole && (!cfg.extractTitles || m.end > m.start))
          forward match {
            case Some(m) =>
              if (cfg.extractTitles) {
                val (titles, name) = searchTitles(m.matched)
                LegalCounsel(name.trim, "natural person", g, titles)
              } else LegalCounsel(m.matched, "natural person", g, Nil)
            case None =>
              nameRe.findFirstMatchIn(text.substring(0, pos.start)) match {
                case Some(m) =>
                  if (cfg.extractTitles) {
                    val (titles, name) = searchTitles(m.matched)
                    LegalCounsel(name.trim, "natural person", g, titles)
                  } else LegalCounsel(m.matched, "natural person", g, Nil)
                case None =>
                  // shared engine: None.strip() raises (`:435-437`)
                  if (cfg.namelessLawyerFatal) throw new MalformedHeader
                  LegalCounsel(null, "natural person", g, Nil)
              }
          }
        }
      }
    }

  private val redactedRep = "vertreten durch \\[[\\s]*\\.\\.".r

  /** `add_representation` (`:122-158` CH_BGer / `:444-497` shared):
    * segments between representation-start matches; lawyers first,
    * entity-name fallback second, 'Me '-prefixed names are natural
    * persons; dedup on (legal_type, name, gender) like the reference's
    * `LegalCounsel.__hash__`.
    */
  private def addRepresentation(text: String, cfg: ParticipationSpider,
                                lang: String): Seq[LegalCounsel] = {
    val starts = cfg.representationStart.findAllMatchIn(text).toVector
    if (starts.isEmpty) return Nil
    if (cfg.redactionGuard && redactedRep.findFirstIn(text).isDefined) return Nil
    val reps = starts.indices.flatMap { i =>
      val from = starts(i).end
      val to = if (i + 1 < starts.length) starts(i + 1).start else text.length
      val seg = text.substring(from, to)
      val lawyers = searchLawyers(seg, cfg, lang)
      if (lawyers.nonEmpty) lawyers
      else cfg.entityNameBounded.findFirstIn(seg) match {
        // faithful reference quirk (`:144`/`:479`): the check is the
        // bare prefix "Me" with NO trailing space, so entity names
        // like "Metzger Treuhand AG" also lose their first two chars —
        // intentionally preserved, do not "fix". The check belongs to
        // the bounded branch ONLY (`:141-150`/`:476-487`); a bare-only
        // match (`:151-156`/`:488-493`) is always a legal entity with
        // its full name, even when it starts with "Me".
        case Some(name) if name.startsWith("Me") =>
          Seq(LegalCounsel(name.substring(2), "natural person", None, Nil))
        case Some(name) =>
          Seq(LegalCounsel(if (cfg.extractTitles) name.trim else name,
            "legal entity", None, Nil))
        case None => cfg.entityNameBare.findFirstIn(seg) match {
          case Some(name) =>
            Seq(LegalCounsel(if (cfg.extractTitles) name.trim else name,
              "legal entity", None, Nil))
          case None => Nil
        }
      }
    }
    reps.distinctBy(c => (c.legalType, c.name, c.gender))
  }

  private val partyNameRe = "[A-Z1-9].*?(?=(,)|(.$)| Beschwerde)".r
  private val partyListHead = Pattern.compile("[1-9IVX]+\\.(?!_)")
  private val partyListSplit = Pattern.compile("[1-9IVX]+\\. ")
  private val naturalName = Pattern.compile("([A-Z]\\.)?[A-Z]\\._$")

  /** `get_party` (`:160-189` CH_BGer / `:501-539` shared): first name
    * token decides — a numbered list recurses per person (genders
    * dropped), `X._`-shaped names are natural persons gendered by the
    * party-role regexes, anything else is a legal entity.
    */
  private def getParty(text: String, cfg: ParticipationSpider,
                       lang: String): Seq[ProceedingsParty] =
    partyNameRe.findFirstIn(text).map(_.trim) match {
      case None => Nil
      case Some(name) if partyListHead.matcher(name).lookingAt() =>
        partyListSplit.split(text, -1).drop(1).toSeq
          .flatMap(p => getParty(p, cfg, lang))
          .map(_.copy(gender = None))
      case Some(name) if naturalName.matcher(name).matches() =>
        cfg.partyGender.collectFirst {
          case (g, rx) if rx.findFirstIn(text).isDefined => g
        } match {
          case Some(g) => Seq(ProceedingsParty(name,
            if (lang == "it") None else Some(g), "natural person", Nil))
          case None => Seq(ProceedingsParty(name, None, "natural person", Nil))
        }
      case Some(name) => Seq(ProceedingsParty(name, None, "legal entity", Nil))
    }

  /** Full spider-dispatched parse: slice the header between the
    * information-start and the language's end marker, split on the
    * second-party regex, then parties + representations per side
    * (CH_BGer `:78-205`; shared `get_participation_from_header` +
    * `get_procedural_participation`). None = no config for the spider,
    * unsupported language (the reference's KeyError), malformed header
    * (fewer than two sides — the reference's ValueError), or a shared-
    * config nameless lawyer — all quarantine paths.
    */
  def parseParticipationFor(spider: String, lang: String,
                            header0: String): Option[SpiderParticipation] = {
    if (header0 == null || lang == null) return None
    val cfgOpt = participationSpiders.get(if (spider == null) "" else spider)
    if (cfgOpt.isEmpty) return None
    val cfg = cfgOpt.get
    try {
      var header = header0
      (cfg.informationStart +: cfg.startFallbacks).iterator
        .map(_.findFirstMatchIn(header))
        .collectFirst { case Some(m) => m }
        .foreach(m => header = header.substring(m.end))
      cfg.endMarkers.get(lang) match {
        case None => return None
        case Some(alts) =>
          alts.iterator.map(_.findFirstMatchIn(header))
            .collectFirst { case Some(m) => m }
            .foreach(m => header = header.substring(0, m.start))
      }
      // -1 keeps trailing empty parts, matching Python re.split
      val parts = cfg.secondPartySplit.split(header, -1)
      if (parts.length < 2) return None
      val pRep = addRepresentation(parts(0), cfg, lang)
      val dRep = addRepresentation(parts(1), cfg, lang)
      Some(SpiderParticipation(
        getParty(parts(0), cfg, lang).map(_.copy(counsel = pRep)),
        getParty(parts(1), cfg, lang).map(_.copy(counsel = dRep))))
    } catch { case _: MalformedHeader => None }
  }
}
