package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The ported citation regex bank (F18) is self-documenting: every
  * rule ships with its example. The spec holds the bank to that
  * contract and exercises the span extractor.
  */
class CitationBankSpec extends AnyFunSuite {

  test("bank loads all 9 categories") {
    assert(Extractors.citationRegexBank.keySet == Set(
      "ruling/BGE/de", "ruling/BGE/fr", "ruling/BGE/it",
      "ruling/Bger/de", "ruling/Bger/fr", "ruling/Bger/it",
      "law/de", "law/fr", "law/it"))
  }

  test("every regex matches its own example (two known data quirks)") {
    // Ported verbatim, quirks included: law/de[4]'s "example" field in
    // the reference data is a prose comment, and law/it[1]'s example
    // doesn't match its own pattern ('cpv.\.' needs "cpv" + any char +
    // '.') — Python re.search returns None on it too. Everything else
    // must self-match.
    val misses = for {
      (cat, rules) <- Extractors.citationRegexBank.toSeq.sortBy(_._1)
      ((re, example), i) <- rules.zipWithIndex
      if re.findFirstIn(example).isEmpty
    } yield s"$cat[$i]"
    assert(misses == Seq("law/de[4]", "law/it[1]"),
      s"unexpected example misses: $misses")
  }

  test("span extraction: leftmost-longest across the family") {
    val text = "Gestützt auf BGE 133 II 249 E. 1.1 und Art. 95 Abs. 1 BGG wird erkannt."
    val ruling = Extractors.findCitationSpans(text, "ruling/BGE")
    assert(ruling.nonEmpty)
    // the "BGE x y z E. n" variant must win over the bare "BGE x y z"
    val (s, e, _) = ruling.head
    assert(text.substring(s, e).startsWith("BGE 133 II 249 E."))
    val law = Extractors.findCitationSpans(text, "law")
    assert(law.exists { case (a, b, _) => text.substring(a, b).contains("Art. 95") })
  }

  test("language separation: ATF only in fr category") {
    val fr = "cf. ATF 140 III 86 consid. 2"
    assert(Extractors.findCitationSpans(fr, "ruling/BGE/fr").nonEmpty)
    assert(Extractors.findCitationSpans(fr, "ruling/BGE/de").isEmpty)
  }
}
