package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F33 BreakIterator tier: legal-register segmentation including the
  * abbreviation-number shapes court text is full of.
  */
class SentencesIcuSpec extends AnyFunSuite {
  import TextFunctions.sentencesIcu

  test("abbreviation + number never breaks (ATerm x Numeric)") {
    val t = "Die Beschwerde wird abgewiesen. Gemäss Art. 5 Abs. 2 gilt dies nicht? " +
      "Der Fall ist klar! Siehe BGE 133 III 421 E. 5.1 S. 426. Ende."
    assert(sentencesIcu(t, "de") == Seq(
      "Die Beschwerde wird abgewiesen.",
      "Gemäss Art. 5 Abs. 2 gilt dies nicht?",
      "Der Fall ist klar!",
      "Siehe BGE 133 III 421 E. 5.1 S. 426.",
      "Ende."))
  }

  test("french and italian locales segment") {
    assert(sentencesIcu("Le recours est rejeté. Les frais suivent.", "fr") ==
      Seq("Le recours est rejeté.", "Les frais suivent."))
    assert(sentencesIcu("Il ricorso è respinto. Le spese seguono.", "it") ==
      Seq("Il ricorso è respinto.", "Le spese seguono."))
  }

  test("null, empty, and single-sentence inputs") {
    assert(sentencesIcu(null, "de") == Seq.empty)
    assert(sentencesIcu("", "de") == Seq.empty)
    assert(sentencesIcu("Nur ein Satz ohne Ende", "de") ==
      Seq("Nur ein Satz ohne Ende"))
  }
}
