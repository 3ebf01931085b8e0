package graft.extract

import org.scalatest.funsuite.AnyFunSuite

import LowerCourtExtractors.{chBGer, prepareDate, LowerCourtInfo}

/** F39 full lower-court extraction: reference CH_BGer semantics
  * (`lower_court_extracting_functions.py:20-219`) — staged category
  * regexes + short-code resolution, with the reference's quirks kept.
  */
class LowerCourtSpec extends AnyFunSuite {

  test("DE canton path: court, canton, chamber, date, file number all resolve") {
    val header = "A. ist X. Beschwerde gegen das Urteil des Obergerichts des " +
      "Kantons Zürich, II. Zivilkammer, vom 12. März 2019 (LB180001)."
    val got = chBGer(header)
    assert(got.contains(LowerCourtInfo(
      courtString = Some("Obergericht"),
      canton = Some("ZH"),
      court = Some("ZH_OG"),
      chamberString = Some("II. Zivilkammer"),
      // "II. Zivilkammer" is not a substring of any stored name, but the
      // numeral-stripped "Zivilkammer" is inside "Zivilkammern"
      chamber = Some("ZH_OG_001"),
      date = Some("2019-03-12"),
      fileNumber = Some("LB180001"))))
  }

  test("FR high-prio path: Tribunal/Chambre stop at the lookahead, ordinal day") {
    // the start slice lands on the lowercase "recours" (case-sensitive,
    // like the reference) — keep it ahead of the court mention
    val header = "X. forme un recours contre l'arrêt du Tribunal cantonal du " +
      "canton de Vaud, Chambre des recours civile, du 1er mars 2019."
    val got = chBGer(header)
    assert(got.contains(LowerCourtInfo(
      courtString = Some("Tribunal cantonal"),
      canton = Some("VD"),
      court = Some("VD_TC"),
      chamberString = Some("Chambre des recours civile"),
      chamber = Some("VD_TC_010"),
      date = Some("2019-03-01"),
      fileNumber = None)))
  }

  test("federal path: no canton text, CH court resolves, canton becomes CH") {
    val header = "Gegenstand Haftentlassung, Beschwerde gegen das Urteil " +
      "des Bundesverwaltungsgerichts vom 5. Oktober 2020."
    val got = chBGer(header)
    assert(got.contains(LowerCourtInfo(
      courtString = Some("Bundesverwaltungsgericht"),
      canton = Some("CH"),
      court = Some("CH_BVGE"),
      chamberString = None,
      chamber = None,
      date = Some("2020-10-05"),
      fileNumber = None)))
  }

  test("faithful quirk: unresolvable federal court string aborts the extraction") {
    // reference: re.match(r'CH_', None) raises TypeError → except → None
    val header = "Gegenstand Beschwerde gegen das Urteil des Spezialgerichts " +
      "vom 3. Januar 2021."
    assert(chBGer(header).isEmpty)
  }

  test("faithful quirk: unparseable date aborts even when the court resolved") {
    // month word that survives no translation → pd.to_datetime returns the
    // string → .strftime raises → None
    val header = "Beschwerde gegen das Urteil des Obergerichts des Kantons " +
      "Zürich vom 12. Brumaire 2019."
    assert(chBGer(header).isEmpty)
  }

  test("unresolvable canton keeps the extraction (canton key present, value null)") {
    val header = "Beschwerde gegen das Urteil des Obergerichts des Kantons " +
      "Atlantis vom 12. März 2019."
    val got = chBGer(header)
    assert(got.isDefined)
    assert(got.get.canton.isEmpty)
    assert(got.get.court.isEmpty) // canton unresolved blocks the court lookup
    assert(got.get.courtString.contains("Obergericht"))
    assert(got.get.date.contains("2019-03-12"))
  }

  test("no category matches → None (Python empty-dict falsiness)") {
    assert(chBGer("In Sachen niemand.").isEmpty)
    assert(chBGer(null).isEmpty)
  }

  test("prepareDate: all three languages and the ordinal forms") {
    assert(prepareDate("12. März 2019").contains("2019-03-12"))
    assert(prepareDate("1er juillet 2020").contains("2020-07-01"))
    assert(prepareDate("31 dicembre 2018").contains("2018-12-31"))
    assert(prepareDate("premier avril 2021").contains("2021-04-01"))
    assert(prepareDate("1° maggio 2017").contains("2017-05-01"))
    assert(prepareDate("32. März 2019").isEmpty) // invalid day
    assert(prepareDate("12. Brumaire 2019").isEmpty) // untranslatable month
  }

  test("last-occurrence wins within a category") {
    // two courts in the header: the LATER one is taken (reference keeps
    // the final finditer result)
    val header = "Beschwerde gegen den Entscheid des Bezirksgerichts und das " +
      "Urteil des Obergerichts des Kantons Zürich vom 2. Mai 2019."
    val got = chBGer(header)
    assert(got.get.courtString.contains("Obergericht"))
  }
}
