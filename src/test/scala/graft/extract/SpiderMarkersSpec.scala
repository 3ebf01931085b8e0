package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden-style coverage of the PORTED per-spider marker corpus (F9):
  * real spiders from section_splitting_functions.py drive the section
  * fold on synthetic decisions built from their own marker phrases.
  */
class SpiderMarkersSpec extends AnyFunSuite {

  val cfg = MarkerConfigLoader.bundled

  test("bundled corpus loads all reference spiders") {
    val spiders = cfg.keySet.filter(_.contains("/")).map(_.split("/")(0))
    assert(spiders.size >= 45, s"expected >= 45 ported spiders, got ${spiders.size}")
    for (s <- Seq("CH_BGer", "GE_Gerichte", "TI_Gerichte", "ZH_Obergericht",
      "BE_Verwaltungsgericht", "UR_Gerichte", "VD_Omni", "CH_BGE"))
      assert(spiders.contains(s), s"missing spider $s")
  }

  test("CH_BGer de: header/topic/facts/considerations/rulings") {
    val doc = Seq(
      "Urteil des Bundesgerichts",
      "Gegenstand",
      "Sachverhalt:",
      "Am 1. Januar 2020 erhob X Beschwerde",
      "Erwägungen:",
      "Die Beschwerde ist form- und fristgerecht",
      "Demnach erkennt das Bundesgericht",
      "Die Beschwerde wird abgewiesen.")
    val secs = Extractors.splitSections("CH_BGer", "de", doc, cfg)
    assert(secs("header") == doc.slice(0, 1))
    assert(secs("topic") == doc.slice(1, 2))
    assert(secs("facts") == doc.slice(2, 4))
    assert(secs("considerations") == doc.slice(4, 6))
    assert(secs("rulings") == doc.slice(6, 8))
  }

  test("GE_Gerichte fr: facts/considerations/rulings/footer") {
    val doc = Seq(
      "Arrêt de la Chambre",
      "EN FAIT",
      "Le 1er janvier 2020, X a saisi la cour",
      "EN DROIT",
      "La cause est recevable",
      "PAR CES MOTIFS",
      "rejette le recours",
      "Voie de recours")
    val secs = Extractors.splitSections("GE_Gerichte", "fr", doc, cfg)
    assert(secs("header") == doc.slice(0, 1))
    assert(secs("facts") == doc.slice(1, 3))
    assert(secs("considerations") == doc.slice(3, 5))
    assert(secs("rulings") == doc.slice(5, 7))
    assert(secs("footer") == doc.slice(7, 8))
  }

  test("TI_Gerichte it: facts/considerations/rulings/footer") {
    val doc = Seq(
      "Sentenza del Tribunale",
      "in fatto:",
      "Il 1. gennaio 2020 X ha inoltrato ricorso",
      "in diritto:",
      "Il ricorso è ammissibile",
      "Per questi motivi",
      "il ricorso è respinto.",
      "Per il Tribunale cantonale amministrativo")
    val secs = Extractors.splitSections("TI_Gerichte", "it", doc, cfg)
    assert(secs("header") == doc.slice(0, 1))
    assert(secs("facts") == doc.slice(1, 3))
    assert(secs("considerations") == doc.slice(3, 5))
    assert(secs("rulings") == doc.slice(5, 7))
    assert(secs("footer") == doc.slice(7, 8))
  }

  test("ZH_Obergericht de: regex markers with anchors hold") {
    // markers ported verbatim; probe one spider with ^-anchored patterns
    val markers = cfg("ZH_Obergericht/de")
    assert(markers.nonEmpty)
    val secs = Extractors.splitSections("ZH_Obergericht", "de",
      Seq("Beschluss des Obergerichts", "Erwägungen:", "Es wird erkannt:"), cfg)
    assert(secs("header") == Seq("Beschluss des Obergerichts"))
  }

  test("spider implemented but not for this language -> all header (valid_namespace)") {
    val secs = Extractors.splitSections("TI_Gerichte", "de",
      Seq("Sachverhalt", "Erwägungen", "Demnach erkennt"), cfg)
    assert(secs("header").size == 3 && secs.size == 1)
  }

  test("unknown spider falls back to the default table") {
    val secs = Extractors.splitSections("NO_SUCH_SPIDER", "de",
      Seq("Kopf", "Sachverhalt", "x"), cfg)
    assert(secs("facts") == Seq("Sachverhalt", "x"))
  }
}
