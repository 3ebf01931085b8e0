package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden fixtures in the reference's test style (`scrc/utils/
  * test_utils.py:37-360`: hard-coded headers → expected names, roles,
  * genders, president flags, counsel legal types).
  */
class PeopleExtractorsSpec extends AnyFunSuite {
  import PeopleExtractors._

  test("composition: judges, president flag, clerk, genders (de)") {
    val header = "Besetzung: Bundesrichter Meier, Präsident, " +
      "Bundesrichterin Huber, Bundesrichter Keller, Gerichtsschreiber Schmid"
    val c = parseComposition(header)
    assert(c.judges == Seq(
      Person("Meier", Some("m")),
      Person("Huber", Some("f")),
      Person("Keller", Some("m"))))
    assert(c.president == Some(Person("Meier", Some("m"))))
    assert(c.clerks == Seq(Person("Schmid", Some("m"))))
  }

  test("composition: inline president, female clerk") {
    val c = parseComposition(
      "Besetzung: Oberrichterin Arnold Präsidentin, Oberrichter Frei, " +
        "Gerichtsschreiberin Meyer")
    assert(c.president.map(_.name) == Some("Arnold Präsidentin") ||
      c.president.map(_.name) == Some("Arnold"))
    assert(c.judges.length == 2)
    assert(c.clerks == Seq(Person("Meyer", Some("f"))))
  }

  test("composition: french juges and greffier") {
    val c = parseComposition(
      "Composition: Juge fédéral Denys, Juge fédérale Jacquemoud-Rossari, " +
        "Greffier : Dyens")
    assert(c.judges.map(_.name) == Seq("Denys", "Jacquemoud-Rossari"))
    assert(c.judges.map(_.gender) == Seq(Some("m"), Some("f")))
    assert(c.clerks == Seq(Person("Dyens", Some("m"))))
  }

  test("composition: runaway parse returns empty (sanity cap)") {
    val many = "Besetzung: " + (1 to 7).map(i => s"Richter R$i").mkString(", ")
    val c = parseComposition(many)
    assert(c.judges.isEmpty && c.president.isEmpty)
  }

  test("composition: null and noise are safe") {
    assert(parseComposition(null) == CourtComposition(None, Nil, Nil))
    val c = parseComposition("Besetzung: in Erwägung, dass keine Namen folgen")
    assert(c.judges.isEmpty)
  }

  test("participation: plaintiff with counsel vs defendant") {
    val p = parseParticipation(
      "A.________, Beschwerdeführer, vertreten durch Rechtsanwalt Dr. B. Brunner, " +
        "gegen C.________, Beschwerdegegnerin")
    assert(p.plaintiffs.map(_.name) == Seq("A.________"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("B. Brunner", "natural person", Some("m"), Seq("Dr."))))
    assert(p.defendants.map(_.name) == Seq("C.________"))
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("participation: female counsel and french contre") {
    val p = parseParticipation(
      "X.________, représentée par Avocate Marie Curie, contre Y.________")
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("Marie Curie", "natural person", Some("f"), Nil)))
    assert(p.defendants.map(_.name) == Seq("Y.________"))
  }

  test("lower court: court name + decision date") {
    val lc = parseLowerCourt(
      "gegen das Urteil des Obergerichts des Kantons Zürich vom 12. März 2019")
    assert(lc == Some(LowerCourt("Obergerichts des Kantons Zürich", Some("12. März 2019"))))
    assert(parseLowerCourt("kein Verweis") == None)
    assert(parseLowerCourt(null) == None)
  }
}
