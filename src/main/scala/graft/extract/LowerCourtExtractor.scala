package graft.extract

import java.util.regex.Pattern

import graft.functions.TextFunctions

/** The court/chamber hierarchy lookup (F39 data side) — the reference
  * resolves extracted lower-court text against
  * `legal_info/court_chambers.json` (canton → gerichte → kammern with
  * de/fr/it display names); here the condensed table ships as a bundled
  * resource (`tools/port_court_chambers.py`) and is loaded once per JVM
  * (broadcast-friendly: the parsed structure is a few hundred entries).
  *
  * Declaration order is load-bearing: the reference iterates dict
  * insertion order and returns the FIRST name match
  * (`lower_court_extracting_functions.py:78-114`), which MiniJson's
  * SeqMap preserves.
  */
object CourtChambers {

  final case class Chamber(short: String, de: String, fr: String, it: String)
  final case class Court(short: String, de: String, fr: String, it: String,
                         chambers: Seq[Chamber])
  final case class Canton(short: String, de: String, fr: String, it: String,
                          courts: Seq[Court])

  lazy val bundled: Seq[Canton] = {
    val in = getClass.getResourceAsStream("/graft/court_chambers.json")
    require(in != null, "bundled court-chambers table missing from classpath")
    val text = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    def str(m: Map[String, Any], k: String): String =
      m.getOrElse(k, "").asInstanceOf[String]
    MarkerConfigLoader.parseNested(text).toSeq.map { case (cantonShort, cv) =>
      val cm = cv.asInstanceOf[Map[String, Any]]
      val courts = cm.getOrElse("courts", Map.empty[String, Any])
        .asInstanceOf[Map[String, Any]].toSeq.map { case (courtShort, ctv) =>
          val ctm = ctv.asInstanceOf[Map[String, Any]]
          val chambers = ctm.getOrElse("chambers", Map.empty[String, Any])
            .asInstanceOf[Map[String, Any]].toSeq.map { case (chShort, chv) =>
              val chm = chv.asInstanceOf[Map[String, Any]]
              Chamber(chShort, str(chm, "de"), str(chm, "fr"), str(chm, "it"))
            }
          Court(courtShort, str(ctm, "de"), str(ctm, "fr"), str(ctm, "it"), chambers)
        }
      Canton(cantonShort, str(cm, "de"), str(cm, "fr"), str(cm, "it"), courts)
    }
  }

  /** Canton display name (any language, exact) → short code
    * (reference `prepareCantonForQuery`).
    */
  def cantonShort(name: String): Option[String] =
    bundled.find(c => c.de == name || c.fr == name || c.it == name).map(_.short)

  /** Court display name (any language, exact) within a canton → short
    * code (reference `prepareCourtForQuery`). The canton short must be
    * valid — callers guarantee it, as in the reference.
    */
  def courtShort(courtString: String, canton: String): Option[String] =
    bundled.find(_.short == canton).flatMap(_.courts.find(ct =>
      ct.de == courtString || ct.fr == courtString || ct.it == courtString)
      .map(_.short))

  /** Chamber text → short code (reference `prepareChamberForQuery`),
    * with its two quirks kept: an unknown court returns the chamber
    * STRING unchanged (not None), and matching is substring
    * containment — full text first, then with the leading numeral
    * stripped (`re.sub(r'[IV0-9]*.\s', '', chamber)`, a GLOBAL sub
    * whose `.` is any-char, faithfully).
    */
  def chamberShort(chamberString: String, court: String, canton: String): Option[String] =
    bundled.find(_.short == canton).flatMap { ce =>
      ce.courts.find(_.short == court) match {
        case None => Some(chamberString)
        case Some(ct) =>
          val stripped = chamberString.replaceAll("[IV0-9]*.\\s", "")
          ct.chambers.collectFirst {
            case ch if ch.de.contains(chamberString) || ch.fr.contains(chamberString) ||
              ch.it.contains(chamberString) => ch.short
            case ch if ch.de.contains(stripped) || ch.fr.contains(stripped) ||
              ch.it.contains(stripped) => ch.short
          }
      }
    }
}

/** F39, the real shape: the reference's CH_BGer lower-court extractor
  * (`lower_court_extracting_functions.py:20-219`) — staged regex
  * categories (court string / canton / date / chamber string / file
  * number) scanned over the header tail, then resolved to short codes
  * against [[CourtChambers]]. Ported faithfully, including:
  *
  *  - last-occurrence-wins per category, except `high_prio` named
  *    groups which short-circuit at their first match;
  *  - the canton-spelling header normalizations (incl. the `Waadt` →
  *    `Waadtland` rewrite that can never match the stored name — a
  *    reference quirk kept as-is);
  *  - exception-to-None semantics: a federal court string that does
  *    not resolve, or a date whose month survives no translation,
  *    aborts the WHOLE extraction (`try/except: return None` around
  *    `re.match(None)` / `str.strftime`);
  *  - a result with at least one extracted key returns even when
  *    nothing resolved (Python dict truthiness on `{canton: None}`).
  */
object LowerCourtExtractors {

  /** All extracted + resolved fields; the reference's downstream sink
    * consumes court/canton/chamber shorts + date + fileNumber
    * (`lower_court_extractor.py:60-84`).
    */
  final case class LowerCourtInfo(
      courtString: Option[String], canton: Option[String], court: Option[String],
      chamberString: Option[String], chamber: Option[String],
      date: Option[String], fileNumber: Option[String])

  // (?U): Python3 \w is unicode-aware; Java needs UNICODE_CHARACTER_CLASS
  // for the same semantics (canton/court words carry umlauts/accents).
  private val startRe = Pattern.compile(
    "Vorinstanz|Beschwerden?\\sgegen|gegen\\sden\\s(Entscheid|Beschluss)|gegen\\sdas\\sUrteil|" +
      "Gegenstand|Instance précédente|recours|révision de|ricorso|ricorrente|rettifica")
  private val startFallbackRe = Pattern.compile(", gegen|Beschwerdeführer")

  // Java group names reject '_': the reference's high_prio → highprio.
  private val courtStringRe = Pattern.compile(
    "(?U)(\\w*gericht(?=s?[^\\w]))" +
      "|(?<highprio>Tribunal .*?(?=[,\\.]| du| de la République et canton))" +
      "|(?<![Rr]e)[Cc]our .*?(?=[,\\.]| du| de la République et canton)" +
      "|Tribunale .*?(?=[,\\.]| del Cantone)")

  private val cantonRe = Pattern.compile(
    "(?U)((?<=des\\s(?:Kantons\\s))|((?<=des\\s(?:Kantonsgerichts\\s))))(Appenzell Innerrhoden|Appenzell Rhodes-Intérieures|Appenzello Interno)" +
      "|((?<=des\\s(?:Kantons\\s))|((?<=des\\s(?:Kantonsgerichts\\s))))(Appenzell Ausserrhoden|Appenzell Rhodes-Extérieures|Appenzello Esterno)" +
      "|((?<=des\\s(?:Kantons\\s))|((?<=des\\s(?:Kantonsgerichts\\s))))Basel-Land" +
      "|((?<=des\\s(?:Kantons\\s))|((?<=des\\s(?:Kantonsgerichts\\s))))(St(\\.)?\\s?Gallen|San Gallo)" +
      "|((?<=des\\s(?:Kantons\\s))|((?<=des\\s(?:Kantonsgerichts\\svon\\s))))[\\wäöü-]*" +
      "|((?<=des\\s(?:Kantons\\s))|((?<=des\\s(?:Kantonsgerichts\\s))))[\\wäöü-]*" +
      "|(?<=canton d[eu] )Bâle-(Ville|Campagne)" +
      "|(?<=canton d[eu] )[\\wéè]*" +
      "|(?<=de l'Etat de )[\\wéè]*" +
      "|((?<=del Cantone )|(?<=del Cantone di )|(?<=del Cantone dei ))(San Gallo)" +
      "|((?<=del Cantone )|(?<=del Cantone di )|(?<=del Cantone dei ))(Appenzello (Interno|Esterno))" +
      "|((?<=del Cantone )|(?<=del Cantone di )|(?<=del Cantone dei ))(Basilea (Città|Campagna))" +
      "|(?<=del Cantone dei )[\\wéè]*" +
      "|(?<=del Cantone di )[\\wéè]*" +
      "|(?<=del Cantone del )[\\wéè]*" +
      "|(?<=del Cantone )[\\wéè]*")

  private val dateRe = Pattern.compile(
    "(?U)(?<DATE>(?<DAY>\\d?\\d|1(re|er)|2e|3e|premier|première|deuxième|troisième|1°)\\.?\\s(?<MONTH>\\w{2,12})\\s(?<YEAR>\\d{4}))")

  private val chamberRe = Pattern.compile(
    "(?U)[IVX\\d]+.\\s\\w*ammer" +
      "|\\w*ammer" +
      "|[IVX\\d]+.\\s\\w*our" +
      "|(?<highprio>[Cc]hambre.*?(?=[,\\.]| du| de la [Cc]our))" +
      "|(?<![Rr]e)[Cc]our.*?(?=[,\\.]| du| de la [Cc]our)" +
      "|[Cc]orte.*?(?=[,\\.]| del Tribunale| del Cantone)" +
      "|[Cc]amera.*?(?=[,\\.]| del Tribunale| del Cantone)" +
      "|Abteilung\\s[\\dIVX]+" +
      "|[IVX\\d]+.\\s(\\w+\\s)?Abteilung")

  private val fileNumberRe = Pattern.compile(
    "(?U)(?<ID>[A-Z0-9]{2,6})[\\.\\s\\-]?(?<YEAR>\\d{2,4})[\\.\\s\\-]?(?<NUMBER>[\\dA-Z\\-]{2,8})(?=\\))" +
      "|[A-Z0-9]{1,4}([\\.\\-_/\\s])\\d{1,8}[\\./\\-]?(\\d{4}|[A-Z/]+(\\d+)?)" +
      "|[A-Z0-9]{1,3}(\\s|\\.)?((([\\d]{3,6})|/)\\s??){2,6}(-[A-Z])?")

  /** Per-category search: iterate all matches; a non-null `highprio`
    * group wins immediately, else the LAST match wins (the reference's
    * `for regex_result in re.finditer(...)` + break-on-high_prio loop).
    */
  private def lastMatch(p: Pattern, hasHighPrio: Boolean, text: String): Option[String] = {
    val m = p.matcher(text)
    var result: Option[String] = None
    var done = false
    while (!done && m.find()) {
      if (hasHighPrio && m.group("highprio") != null) {
        result = Some(m.group("highprio")); done = true
      } else result = Some(m.group())
    }
    result
  }

  // reference translation_dict, order preserved (Python applies each
  // entry's exact AND lowercased form; later entries see earlier
  // rewrites).
  private val dateTranslations: Seq[(String, String)] = Seq(
    "Januar" -> "Jan", "Februar" -> "Feb", "März" -> "Mar", "Mai" -> "May",
    "Juni" -> "June", "Juli" -> "July", "Oktober" -> "Oct", "Dezember" -> "Dec",
    "Janvier" -> "Jan", "Février" -> "Feb", "Mars" -> "Mar", "Avril" -> "April",
    "Juin" -> "june", "Juillet" -> "July", "Août" -> "Aug", "Septembre" -> "Sept",
    "Octobre" -> "Oct", "Novembre" -> "Nov", "Décembre" -> "Dec",
    "Gennaio" -> "Jan", "Febbraio" -> "Feb", "Marzo" -> "Mar", "Aprile" -> "Apr",
    "Maggio" -> "May", "Giugno" -> "June", "Luglio" -> "July", "Agosto" -> "Aug",
    "Settembre" -> "Sept", "Ottobre" -> "Oct", "Dicembre" -> "Dec",
    "1er" -> "01", "1re" -> "01", "2e" -> "02", "3e" -> "03",
    "premier" -> "01", "première" -> "01", "deuxième" -> "02",
    "troisième" -> "03", "1°" -> "01")

  private val monthPrefixes = Seq(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  private val isoDateShape = "^\\s*(\\d{1,2})\\.?\\s+(\\S+)\\.?\\s+(\\d{4})\\s*$".r

  /** Reference `prepareDateForQuery`: translate month/ordinal tokens,
    * then parse day-first → ISO. None = the reference's
    * AttributeError-on-unparsed-string path (which aborts the whole
    * extraction).
    */
  private[extract] def prepareDate(raw: String): Option[String] = {
    var d = raw
    for ((k, v) <- dateTranslations) d = d.replace(k, v).replace(k.toLowerCase, v)
    d match {
      case isoDateShape(day, monWord, year) =>
        val lw = monWord.toLowerCase.stripSuffix(".")
        monthPrefixes.collectFirst { case (p, n) if lw.startsWith(p) => n }.flatMap { mo =>
          try Some(java.time.LocalDate.of(year.toInt, mo, day.toInt).toString)
          catch { case _: java.time.DateTimeException => None }
        }
      case _ => None
    }
  }

  /** CH_BGer lower-court extraction over a header section. */
  def chBGer(header: String): Option[LowerCourtInfo] = {
    if (header == null) return None
    val h = TextFunctions.cleanText(header)
      .replace("Appenzell I.Rh.", "Appenzell Innerrhoden")
      .replace("Appenzell A.Rh.", "Appenzell Ausserrhoden")
      .replace("Appenzell I. Rh.", "Appenzell Innerrhoden")
      .replace("Appenzell A. Rh.", "Appenzell Ausserrhoden")
      .replace("Waadt", "Waadtland")
      .replace("Basilea-Città", "Basilea Città")
      .replace("St. Gallen", "St.Gallen")
    val sm = startRe.matcher(h)
    val body =
      if (sm.find()) h.substring(sm.start)
      else {
        val fm = startFallbackRe.matcher(h)
        if (fm.find()) h.substring(fm.start) else h
      }

    val courtString = lastMatch(courtStringRe, hasHighPrio = true, body)
    val cantonText = lastMatch(cantonRe, hasHighPrio = false, body)
    val dateText = lastMatch(dateRe, hasHighPrio = false, body)
    val chamberString = lastMatch(chamberRe, hasHighPrio = true, body)
    val fileNumber = lastMatch(fileNumberRe, hasHighPrio = false, body)

    // --- reference get_lower_court_by_date_and_court, incl. its
    // exception-to-None edges
    var canton: Option[String] = None
    var cantonKeyPresent = cantonText.isDefined
    var court: Option[String] = None
    var courtKeyPresent = false
    if (cantonText.isDefined) {
      canton = CourtChambers.cantonShort(cantonText.get)
      if (courtString.isDefined && canton.isDefined) {
        court = CourtChambers.courtShort(courtString.get, canton.get)
        courtKeyPresent = true
      }
    } else if (courtString.isDefined) {
      court = CourtChambers.courtShort(courtString.get, "CH")
      courtKeyPresent = true
      // reference: re.match(r'CH_', None) raises → whole extraction None
      if (court.isEmpty) return None
      if (court.get.startsWith("CH_")) { canton = Some("CH"); cantonKeyPresent = true }
    }
    var chamber: Option[String] = None
    if (cantonKeyPresent && chamberString.isDefined && courtKeyPresent &&
        canton.isDefined && court.isDefined) {
      chamber = CourtChambers.chamberShort(chamberString.get, court.get, canton.get)
    }
    val date = dateText match {
      case Some(t) =>
        prepareDate(t) match {
          case ok @ Some(_) => ok
          case None => return None // reference: str.strftime raises → None
        }
      case None => None
    }
    // Python `return lower_court or None`: an empty dict (no category
    // matched, no keys set) is falsy.
    val anyKey = courtString.isDefined || cantonKeyPresent || courtKeyPresent ||
      chamberString.isDefined || dateText.isDefined || fileNumber.isDefined
    if (!anyKey) None
    else Some(LowerCourtInfo(courtString, canton, court, chamberString, chamber,
      date, fileNumber))
  }
}
