package graft.functions

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property invariants for the trigram language scorer. */
object LangIdProps extends Properties("LangId") {

  private val samples = Gen.oneOf(
    "Das Gericht weist die Beschwerde ab und auferlegt die Kosten.",
    "Le tribunal rejette le recours et met les frais à la charge.",
    "Il tribunale respinge il ricorso e pone le spese a carico.",
    "The court dismisses the appeal and orders costs to be paid.")

  property("classification is stable under self-concatenation") =
    forAll(samples, Gen.choose(1, 5)) { (t, n) =>
      LangId.detect(Seq.fill(n)(t).mkString(" ")) == LangId.detect(t)
    }

  property("classification is case-insensitive") = forAll(samples) { t =>
    LangId.detect(t.toUpperCase) == LangId.detect(t.toLowerCase)
  }

  property("digits and punctuation never flip the language") =
    forAll(samples, Gen.choose(0, 9)) { (t, d) =>
      LangId.detect(s"$t $d.$d (Nr. $d)") == LangId.detect(t)
    }
}
