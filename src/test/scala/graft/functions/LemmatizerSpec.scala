package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import Lemmatizer._

/** The deterministic lemma/POS tier feeding the A3 counters. */
class LemmatizerSpec extends AnyFunSuite {

  test("closed-class lexicon: articles, auxiliaries, conjunctions") {
    assert(tag("Die") == Tagged("Die", "der", "DET"))
    assert(tag("das") == Tagged("das", "der", "DET"))
    assert(tag("eine") == Tagged("eine", "ein", "DET"))
    assert(tag("ist") == Tagged("ist", "sein", "AUX"))
    assert(tag("wurden") == Tagged("wurden", "werden", "AUX"))
    assert(tag("und") == Tagged("und", "und", "CCONJ"))
    assert(tag("mit") == Tagged("mit", "mit", "ADP"))
    assert(tag("nicht") == Tagged("nicht", "nicht", "PART"))
  }

  test("noun suffix rules, first match wins") {
    assert(tag("Gerichte").lemma == "Gericht")
    assert(tag("Beschwerden").lemma == "Beschwerde") // en→e, NOT en-drop
    assert(tag("Parteien").lemma == "Partei")        // eien→ei before en→e
    assert(tag("Verfügungen").lemma == "Verfügung")  // ungen→ung
    assert(tag("Möglichkeiten").lemma == "Möglichkeit")
    assert(tag("Erkenntnisse").lemma == "Erkenntnis")
    assert(tag("Verfügung").lemma == "Verfügung")    // no rule fires
    assert(tag("Gerichte").pos == "NOUN")
    // min-stem guard: short nouns stay whole
    assert(tag("Ehe").lemma == "Ehe")
  }

  test("verbs: infinitives kept, finite 3sg mapped back") {
    assert(tag("prüfen") == Tagged("prüfen", "prüfen", "VERB"))
    assert(tag("prüft").lemma == "prüfen")
    assert(tag("entscheidet").lemma == "entscheiden")
    assert(tag("entscheidet").pos == "VERB")
  }

  test("shape classes: numbers, punctuation, fallback") {
    assert(tag("2020").pos == "NUM")
    assert(tag(".").pos == "PUNCT")
    assert(tag("rasch").pos == "ADJ")
  }

  test("french and italian tiers: lexicon, plural rules, infinitives") {
    assert(tag("les", "fr") == Tagged("les", "le", "DET"))
    assert(tag("sont", "fr").lemma == "être")
    assert(tag("tribunaux", "fr").lemma == "tribunal")
    assert(tag("décisions", "fr").lemma == "décision")
    assert(tag("rejeter", "fr").pos == "VERB")
    assert(tag("Lausanne", "fr").pos == "PROPN")

    assert(tag("gli", "it") == Tagged("gli", "il", "DET"))
    assert(tag("sono", "it").lemma == "essere")
    assert(tag("decisioni", "it").lemma == "decisione")
    assert(tag("ricorsi", "it").lemma == "ricorso")
    assert(tag("respingere", "it").pos == "VERB")
  }

  test("tagText tokenizes and counter produces the A3 map shape") {
    val c = counter("Die Gerichte prüfen die Beschwerden der Parteien")
    assert(c("der\tDET") == 3L)
    assert(c("Gericht\tNOUN") == 1L)
    assert(c("prüfen\tVERB") == 1L)
    assert(c("Beschwerde\tNOUN") == 1L)
    assert(c("Partei\tNOUN") == 1L)
    assert(c.values.sum == 7L)
    assert(counter(null).isEmpty)
    assert(counter("").isEmpty)
  }
}
