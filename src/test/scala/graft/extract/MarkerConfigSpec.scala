package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class MarkerConfigSpec extends AnyFunSuite {

  val json = """{
    "AG_Gerichte": {
      "facts": "(?i)^(sachverhalt|ausgangslage)",
      "considerations": "(?i)^(erw[äa]gungen|aus den erw[äa]gungen)",
      "rulings": "(?i)^(demnach erkennt|das gericht erkennt)",
      "footer": "(?i)^rechtsmittelbelehrung"
    },
    "GE_Gerichte": {
      "facts": "(?i)^en fait",
      "considerations": "(?i)^en droit",
      "rulings": "(?i)^par ces motifs",
      "footer": "(?i)^voies de recours"
    }
  }"""

  test("parses spiders, sections and compiles regexes") {
    val cfg = MarkerConfigLoader.parse(json)
    assert(cfg.keySet == Set("AG_Gerichte", "GE_Gerichte"))
    assert(cfg("AG_Gerichte")("facts").findFirstIn("Ausgangslage des Falls").isDefined)
    assert(cfg("GE_Gerichte")("rulings").findFirstIn("PAR CES MOTIFS").isDefined)
  }

  test("loaded config drives the section fold; default stays as fallback") {
    val cfg = MarkerConfigLoader.withDefaults(MarkerConfigLoader.parse(json))
    val doc = Seq("Arrêt du 1er mars", "En fait", "A. ...", "En droit",
      "1. ...", "Par ces motifs", "rejette le recours")
    val secs = Extractors.splitSections("GE_Gerichte", doc, cfg)
    assert(secs("facts") == Seq("En fait", "A. ..."))
    assert(secs("rulings") == Seq("Par ces motifs", "rejette le recours"))
    // unknown spider falls back to the built-in default markers
    val fallback = Extractors.splitSections("XX_SPIDER",
      Seq("Kopf", "Sachverhalt", "x"), cfg)
    assert(fallback("facts") == Seq("Sachverhalt", "x"))
  }

  test("malformed config fails loudly") {
    intercept[IllegalArgumentException](MarkerConfigLoader.parse("""{"a": 5}"""))
    intercept[IllegalArgumentException](MarkerConfigLoader.parse("""{"""))
  }
}
