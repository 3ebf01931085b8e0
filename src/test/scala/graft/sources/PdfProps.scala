package graft.sources

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property invariants for the PDF writer/extractor pair: any printable
  * Latin-1 line round-trips through synthesize → extract, plain or
  * Flate-compressed, with parens/backslashes escaped correctly.
  */
object PdfProps extends Properties("PdfText") {

  // printable Latin-1 without control chars; spaces collapse on extract
  private val line: Gen[String] = Gen.nonEmptyListOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('(', ')', '\\', '.', ',', '§', 'ä', 'ö', 'ü', 'é', ' ')))
    .map(_.mkString.replaceAll("\\s+", " ").trim)
    .suchThat(_.nonEmpty)

  property("plain stream round-trips") = forAll(line) { t =>
    PdfText.extract(PdfText.synthesize(t, flate = false)) == t
  }

  property("FlateDecode stream round-trips") = forAll(line) { t =>
    PdfText.extract(PdfText.synthesize(t, flate = true)) == t
  }
}
