package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden tests in the reference's style (`scrc/utils/test_utils.py`:
  * hard-coded fixtures → expected structured extraction).
  */
class ExtractorsSpec extends AnyFunSuite {
  import Extractors._

  private val doc = Seq(
    "Urteil vom 12. August 2020",
    "Besetzung: Richter A, Richterin B",
    "Sachverhalt",
    "A. Der Beschwerdeführer reichte Klage ein.",
    "B. Die Vorinstanz wies die Klage ab.",
    "Erwägungen",
    "1. Die Beschwerde ist zulässig.",
    "2. Die Rügen sind unbegründet.",
    "Demnach erkennt das Bundesgericht:",
    "1. Die Beschwerde wird abgewiesen.",
    "Rechtsmittelbelehrung",
    "Gegen diesen Entscheid kann Beschwerde geführt werden.")

  test("associateSections assigns paragraphs in document order") {
    val secs = splitSections("CH_BGer", doc)
    assert(secs("header") == doc.slice(0, 2))
    assert(secs("facts") == doc.slice(2, 5))
    assert(secs("considerations") == doc.slice(5, 8))
    assert(secs("rulings") == doc.slice(8, 10))
    assert(secs("footer") == doc.slice(10, 12))
  }

  test("a missing section never captures later paragraphs") {
    val noFacts = doc.patch(2, Nil, 3) // drop the facts block
    val secs = splitSections("default", noFacts)
    assert(!secs.contains("facts"))
    assert(secs("considerations").head == "Erwägungen")
  }

  test("markers never jump backwards") {
    // a 'Sachverhalt' paragraph appearing inside considerations stays there
    val tricky = doc.take(8) ++ Seq("Sachverhalt nochmals erwähnt") ++ doc.drop(8)
    val secs = splitSections("default", tricky)
    assert(secs("considerations").contains("Sachverhalt nochmals erwähnt"))
  }

  test("french markers drive the same fold") {
    val fr = Seq("Arrêt du 3 mars", "Faits", "A. ...", "Considérants",
      "1. ...", "Par ces motifs", "Le recours est rejeté.")
    val secs = splitSections("default", fr)
    assert(secs("facts") == Seq("Faits", "A. ..."))
    assert(secs("rulings") == Seq("Par ces motifs", "Le recours est rejeté."))
  }

  test("judgment extraction: plain outcomes") {
    assert(extractJudgments("Die Beschwerde wird abgewiesen.") == Seq("dismissal"))
    assert(extractJudgments("Le recours est admis.") == Seq("approval"))
    assert(extractJudgments("kein Ergebnis") == Seq.empty)
    assert(extractJudgments(null) == Seq.empty)
    // language-specific table: the DE word is invisible to the FR table
    assert(extractJudgments("Die Beschwerde wird abgewiesen.", "fr") == Seq.empty)
    assert(extractJudgments("Le recours est rejeté.", "fr") == Seq("dismissal"))
    assert(extractJudgments("Il ricorso è respinto.", "it") == Seq("dismissal"))
  }

  test("judgment extraction: partial_ suppresses the full outcome") {
    assert(extractJudgments("Die Beschwerde wird teilweise gutgeheissen.") ==
      Seq("partial_approval"))
    // unnumbered rulings keep only the EARLIEST outcome (reference
    // getFirstInstance): the later dismissal mention is dropped
    assert(extractJudgments(
      "In teilweiser Gutheissung wird das Urteil geändert, im Übrigen abgewiesen.") ==
      Seq("partial_approval"))
  }

  test("judgment extraction: numbered rulings search clause by clause") {
    // outcome sits in clause 1 -> clause 2's approval wording is ignored
    assert(extractJudgments(
      "1. Das Gesuch wird abgeschrieben. 2. Die Beschwerde wird abgewiesen.", "de") ==
      Seq("write_off"))
    // clause 1 names the outcome; clause 2 repeats another one
    assert(extractJudgments(
      "1. Die Beschwerde wird gutgeheissen. 2. Der Entscheid wird bestätigt.", "de") ==
      Seq("approval"))
    // clause 1 has no outcome (costs) -> search advances to clause 2
    assert(extractJudgments(
      "1. Die Kosten trägt der Staat. 2. Die Beschwerde wird abgewiesen.", "de") ==
      Seq("dismissal"))
    // roman numerals: arabic probe fails, roman retry finds clause I
    assert(extractJudgments(
      "I. In teilweiser Gutheissung wird das Urteil geändert. II. Im Übrigen wird die Beschwerde abgewiesen.",
      "de") == Seq("partial_approval"))
    // clause-local partial+plain+inadmissible all match clause 1; verify
    // discards the shadowed dismissal, keeps the rest
    assert(extractJudgments(
      "1. Die Beschwerde wird abgewiesen, soweit darauf einzutreten ist. 2. Keine Kosten.",
      "de") == Seq("inadmissible", "partial_dismissal"))
  }

  test("UR_Gerichte spider variant: own markers, strict single-outcome validation") {
    import Extractors.{extractJudgmentsFor, extractJudgmentsUr}
    assert(extractJudgmentsUr("In concreto Gutheissung der Beschwerde.", "de") ==
      Seq("approval"))
    assert(extractJudgmentsUr("Abweisung der verwaltungsrechtlichen Klage.", "de") ==
      Seq("dismissal"))
    // zero outcomes -> error (the reference raises)
    intercept[IllegalArgumentException](
      extractJudgmentsUr("Die Kosten trägt der Staat.", "de"))
    // the partial marker ALSO hits the plain approval regex -> 2 hits
    // -> error (faithful to the reference's list-not-set counting)
    intercept[IllegalArgumentException](
      extractJudgmentsUr("Teilweise Gutheissung der Beschwerde.", "de"))
    // DE only, like the reference
    intercept[IllegalArgumentException](
      extractJudgmentsUr("Gutheissung der Beschwerde.", "fr"))
    // dispatch: unknown spiders use the global tables
    assert(extractJudgmentsFor("CH_BGer", "Die Beschwerde wird abgewiesen.", "de") ==
      Seq("dismissal"))
    assert(extractJudgmentsFor("UR_Gerichte",
      "Bejahung der Beschwerdelegimitation.", "de") == Seq("approval"))
  }

  test("binary judgment: strip partial, drop procedural, null on conflict") {
    assert(toBinaryJudgment(Seq("approval")) == Some("approval"))
    assert(toBinaryJudgment(Seq("partial_dismissal")) == Some("dismissal"))
    assert(toBinaryJudgment(Seq("approval", "write_off")) == Some("approval"))
    assert(toBinaryJudgment(Seq("approval", "dismissal")) == None)
    assert(toBinaryJudgment(Seq("inadmissible")) == None)
    assert(toBinaryJudgment(Seq.empty) == None)
  }

  test("law citation parse: dot insertion, § normalization, abbreviation lookup") {
    assert(parseLawCitation("Art. 95 BGG") ==
      Some(LawCite("95", "BGG", "173.110")))
    assert(parseLawCitation("Art 95 BGG") ==       // missing dot inserted
      Some(LawCite("95", "BGG", "173.110")))
    assert(parseLawCitation("Art.95 BGG") ==       // glued article split
      Some(LawCite("95", "BGG", "173.110")))
    assert(parseLawCitation("§ 29 ZGB") ==         // § → Art.
      Some(LawCite("29", "ZGB", "210")))
    assert(parseLawCitation("art. 42 CO") ==       // french style
      Some(LawCite("42", "CO", "220")))
    assert(parseLawCitation("Art. 7a OR") ==       // non-numeric article
      Some(LawCite("7a", "OR", "220")))
    assert(parseLawCitation("Art. 1 XYZ") == None) // unknown abbreviation (F22)
    assert(parseLawCitation("random text") == None)
    assert(parseLawCitation(null) == None)
  }

  test("BGer reference extraction and normalization") {
    assert(extractBgerReferences("Urteil 5A_123/2019 vom 1. Januar") ==
      Some("5A_123/2019"))
    assert(extractBgerReferences("Verfahren 5A.123/2019 und 1C 45/2018 vereinigt") ==
      Some("5A_123/2019-1C_45/2018"))
    assert(extractBgerReferences("alte Register: B 45/06 betreffend") ==
      Some("B_45/06"))
    assert(extractBgerReferences("kein Aktenzeichen") == None)
    assert(extractBgerReferences(null) == None)
  }

  test("ruling citation parse: BGE/ATF/DTF with roman book numbers") {
    assert(parseRulingCitations("vgl. BGE 123 II 456 und ATF 99 IV 1") ==
      Seq(RulingCite(123, 2, 456), RulingCite(99, 4, 1)))
    assert(parseRulingCitations("DTF 140 III 16 E. 1.3") ==
      Seq(RulingCite(140, 3, 16)))
    assert(parseRulingCitations("kein Zitat") == Seq.empty)
    assert(parseRulingCitations(null) == Seq.empty)
  }
}
