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
  case class PartySide(name: String, counsel: Seq[Person])
  case class Participation(plaintiffs: Seq[PartySide], defendants: Seq[PartySide])
  case class LowerCourt(court: String, date: Option[String])

  // role keyword → (role, gender); female forms listed first so the
  // longer suffix wins the alternation
  private val judgeRe: Regex =
    "(?:Bundesrichterin|Bundesrichter|Oberrichterin|Oberrichter|Kantonsrichterin|Kantonsrichter|Richterin|Richter|Juge f[ée]d[ée]rale|Juge f[ée]d[ée]ral|Giudice federale|Giudice)\\s+(.+)".r
  private val clerkRe: Regex =
    "(?:Gerichtsschreiberin|Gerichtsschreiber|Greffi[èe]re|Greffier|Cancelliera|Cancelliere)\\s*:?\\s*(.+)".r
  private val presidentStandalone: Regex =
    "(?i)pr[äa]sident(?:in)?|pr[ée]sident(?:e)?|presidente".r

  private def gender(segment: String): Option[String] = {
    val femaleMarkers = Seq("richterin", "schreiberin", "greffière", "greffiere",
      "juge fédérale", "juge federale", "cancelliera", "präsidentin", "présidente")
    val maleMarkers = Seq("richter", "schreiber", "greffier", "juge", "giudice",
      "cancelliere", "präsident", "président")
    val low = segment.toLowerCase
    if (femaleMarkers.exists(low.contains)) Some("f")
    else if (maleMarkers.exists(low.contains)) Some("m")
    else None
  }

  /** Sanity cap from the reference (`court_composition_extracting_
    * functions.py:100-103`): more than 5 judges means the parse ran
    * away — return empty instead of garbage.
    */
  val MaxJudges = 5

  /** Parse a "Besetzung:"/"Composition:" header into the composition.
    * Segments are comma/semicolon-separated; a standalone
    * "Präsident(in)" segment marks the PRECEDING judge as president; a
    * role word inline ("… , Präsident der II. Kammer") does the same.
    */
  def parseComposition(header: String): CourtComposition = {
    if (header == null) return CourtComposition(None, Nil, Nil)
    // multi-line headers: the composition block is the line led by the
    // keyword (fall back to the whole text for bare fixtures)
    val line = header.split("\n")
      .find(l => "(?i)^(besetzung|composition|composizione)".r.findFirstIn(l.trim).isDefined)
      .getOrElse(header)
    val body = line.trim.replaceFirst("(?i)^(besetzung|composition|composizione)\\s*:?\\s*", "")
    var judges = Vector.empty[Person]
    var clerks = Vector.empty[Person]
    var president: Option[Person] = None
    for (raw <- body.split("[,;]").map(_.trim).filter(_.nonEmpty)) {
      raw match {
        case clerkRe(name) =>
          clerks :+= Person(cleanName(name), gender(raw))
        case judgeRe(name) =>
          val p = Person(cleanName(name), gender(raw))
          judges :+= p
          if (presidentStandalone.findFirstIn(raw).isDefined) president = Some(p)
        case seg if presidentStandalone.findFirstIn(seg).isDefined =>
          if (president.isEmpty) president = judges.lastOption
        case _ => // apposition/noise segment
      }
    }
    if (judges.length > MaxJudges) CourtComposition(None, Nil, Nil)
    else CourtComposition(president, judges, clerks)
  }

  private def cleanName(s: String): String =
    s.replaceAll("(?i)[,;.]\\s*$", "").replaceAll("\\s+", " ").trim

  private val counselRe: Regex =
    "(?i)vertreten durch|représenté(?:e)? par|patrocinat[oa] da".r
  private val counselRole: Regex =
    "(Rechtsanwältin|Rechtsanwalt|Advokatin|Advokat|Avocate|Avocat|Fürsprecher(?:in)?)\\s+(.+)".r

  /** Parse the party block: "<side> gegen <side>"; each side is
    * "NAME, role[, vertreten durch counsel]".
    */
  def parseParticipation(block: String): Participation = {
    if (block == null) return Participation(Nil, Nil)
    val sides = block.split("(?i)\\bgegen\\b|\\bcontre\\b|\\bcontro\\b")
    def parseSide(s: String): Seq[PartySide] = {
      val counselSplit = counselRe.split(s)
      val partyName = counselSplit(0).split("[,;]").map(_.trim).filter(_.nonEmpty)
        .headOption.getOrElse("")
      val counsel =
        if (counselSplit.length < 2) Nil
        else counselSplit(1).split("[,;]").map(_.trim).filter(_.nonEmpty).toSeq
          .flatMap {
            case counselRole(role, name) =>
              Some(Person(cleanName(name),
                if (role.toLowerCase.endsWith("in") || role.toLowerCase.endsWith("e"))
                  Some("f") else Some("m")))
            case _ => None
          }
      if (partyName.isEmpty) Nil else Seq(PartySide(cleanName(partyName), counsel))
    }
    Participation(
      if (sides.length > 0) parseSide(sides(0)) else Nil,
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
