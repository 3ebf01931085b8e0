package graft.extract

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Hostile-input hardening for the spider participation engine: real
  * scraped headers contain arbitrary junk, and the ported regex bank
  * must total-function over it — return Some/None, never throw, and
  * never emit empty party structures that would NPE downstream.
  */
object ParticipationProps extends Properties("ParticipationExtractors") {

  private val junkChar = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', ',', '.', '\n', '(', ')', '[', ']', '_', '-', '/'),
    1 -> Gen.oneOf('ä', 'ö', 'ü', 'é', 'è', '§', '\t'))

  private val junk: Gen[String] =
    Gen.listOfN(200, junkChar).map(_.mkString)

  // junk salted with the engine's own trigger words, maximizing the
  // regex paths a random string actually reaches
  private val salted: Gen[String] = for {
    a <- junk; b <- junk; c <- junk
    t1 <- Gen.oneOf("in Sachen", "Verfahrensbeteiligte", "gegen",
      "vertreten durch", "Rechtsanwalt", "RA", "Beschwerdeführerin",
      "1. ", "A._", "betreffend", "Gegenstand", "Me ")
    t2 <- Gen.oneOf("gegen", "contre", "contro", "Dr. ", "lic. iur. ",
      "Beschwerdegegnerin", "Objet", "Oggetto", "[...]", "2. ")
  } yield s"$a $t1 $b $t2 $c"

  private val spiders = Gen.oneOf(
    "CH_BGer", "ZG_Verwaltungsgericht", "ZH_Baurekurs", "ZH_Obergericht",
    "ZH_Sozialversicherungsgericht", "ZH_Steuerrekurs",
    "ZH_Verwaltungsgericht", "XX_Unknown")

  private val langs = Gen.oneOf("de", "fr", "it", "rm", null: String)

  property("never throws, and parties always carry a legal type") =
    forAll(spiders, langs, salted) { (spider, lang, header) =>
      ParticipationExtractors.parseParticipationFor(spider, lang, header) match {
        case None => true
        case Some(p) =>
          (p.plaintiffs ++ p.defendants).forall(pp =>
            (pp.legalType == "natural person" || pp.legalType == "legal entity") &&
              pp.counsel.forall(c =>
                c.legalType == "natural person" || c.legalType == "legal entity"))
      }
    }

  property("null/empty input is a clean None") = {
    ParticipationExtractors.parseParticipationFor("CH_BGer", "de", null).isEmpty &&
    ParticipationExtractors.parseParticipationFor("CH_BGer", null, "x").isEmpty &&
    ParticipationExtractors.parseParticipationFor(null, "de", "x").isEmpty &&
    ParticipationExtractors.parseParticipationFor("CH_BGer", "de", "").isEmpty
  }
}
