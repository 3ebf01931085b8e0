package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F35: character-trigram language ID on the corpus's own register —
  * court boilerplate in all four languages, morphology the seed lists
  * never saw verbatim, and the unk fallbacks.
  */
class LangIdSpec extends AnyFunSuite {

  test("court boilerplate classifies per language") {
    assert(LangId.detect(
      "Die Beschwerde wird abgewiesen, soweit darauf einzutreten ist.") == "de")
    assert(LangId.detect(
      "Le recours est rejeté dans la mesure où il est recevable.") == "fr")
    assert(LangId.detect(
      "Il ricorso è respinto nella misura in cui è ammissibile.") == "it")
    assert(LangId.detect(
      "The appeal is dismissed insofar as it is admissible.") == "en")
  }

  test("generalizes to unseen morphology via trigrams") {
    // none of these words appear in the seed lists — compound German,
    // inflected French/Italian
    assert(LangId.detect(
      "Gerichtsschreiberin Verwaltungsgerichtsbeschwerde einzutreten" +
        " Rechtsverweigerung Streitgegenstand") == "de")
    assert(LangId.detect(
      "considérations juridiques précédentes concernant l'autorité" +
        " intimée et la requérante") == "fr")
  }

  test("long documents clip but still classify") {
    val long = ("Das Bundesgericht zieht in Erwägung, dass die " +
      "Beschwerde gegen den angefochtenen Entscheid rechtzeitig " +
      "eingereicht wurde. ") * 200
    assert(LangId.detect(long) == "de")
  }

  test("gibberish, digits, empty and null fall back to unk") {
    assert(LangId.detect("qzx wvk jqp zzz xxx") == "unk")
    assert(LangId.detect("12345 67890 !!!") == "unk")
    assert(LangId.detect("") == "unk")
    assert(LangId.detect(null) == "unk")
  }

  test("deterministic: same input, same output, stable across calls") {
    val t = "Le tribunal fédéral considère que le recours est admis."
    assert(LangId.detect(t) == LangId.detect(t))
    assert(LangId.scores(t) == LangId.scores(t))
  }
}
