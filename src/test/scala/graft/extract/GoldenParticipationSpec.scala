package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The reference's procedural-participation golden vectors
  * (`/root/reference/scrc/utils/test_utils.py:247-360`): headers joined
  * with ", " (the reference's setup), expected counsel
  * name/legal_type/gender/titles. Gender 'unknown' → None.
  */
class GoldenParticipationSpec extends AnyFunSuite {
  import PeopleExtractors._

  private def join(lines: String*): String = lines.mkString(", ")

  test("ZG_Verwaltungsgericht 1 (:284-287): entity counsel, bare defendant") {
    val p = parseParticipation(join("in Sachen",
      "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
      "Ausgleichskasse Zug, Baarerstrasse 11, Postfach, 6302 Zug Beschwerdegegnerin",
      "betreffend", "Ergänzungsleistungen (hypothetisches Erwerbseinkommen)"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("B._ AG", "legal entity", None, Nil)))
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZG_Verwaltungsgericht 2 (:289-292): entity counsel on both sides") {
    val p = parseParticipation(join("in Sachen",
      "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
      "Amt für Wirtschaft und Arbeit (AWA), vertreten durch Arbeitslosenkasse des Kantons Zug, Rechtsdienst, Industriestrasse 24, 6301 Zug Beschwerdegegner"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("B._ AG", "legal entity", None, Nil)))
    assert(p.defendants.head.counsel.map(c => (c.name, c.legalType)) ==
      Seq(("Arbeitslosenkasse des Kantons Zug", "legal entity")))
  }

  test("ZH_Steuerrekurs 1 (:294-297): kant. qualifier stripped") {
    val p = parseParticipation(join("In Sachen", "1. A, 2. B,",
      "Beschwerdeführer/ Rekurrenten, vertreten durch C AG,", "gegen",
      "1. Schw eizer ische E idgenossenschaf t , Beschwerdegegnerin, 2. Staat Zür ich , Rekursgegner, vertreten durch das kant. Steueramt, Division Konsum, Bändliweg 21, Postfach, 8090 Zürich,"))
    assert(p.plaintiffs.head.counsel.map(c => (c.name, c.legalType)) ==
      Seq(("C AG", "legal entity")))
    assert(p.defendants.head.counsel.map(c => (c.name, c.legalType)) ==
      Seq(("Steueramt", "legal entity")))
  }

  test("ZH_Steuerrekurs 2 (:299-302)") {
    val p = parseParticipation(join("In Sachen", "A Gm bH, vormals B GmbH,",
      "als Rechtsnachfolgerin der C GmbH Immobiliengesellschaft,",
      "Rekurrentin, vertreten durch Ernst & Young AG, Maagplatz 1, Postfach, 8010 Zürich,",
      "gegen", "Gem einde D , Rekursgegnerin, vertreten durch die Kommission für Grundsteuern,"))
    assert(p.plaintiffs.head.counsel.map(c => (c.name, c.legalType)) ==
      Seq(("Ernst & Young AG", "legal entity")))
    assert(p.defendants.head.counsel.map(c => (c.name, c.legalType)) ==
      Seq(("Kommission für Grundsteuern", "legal entity")))
  }

  test("ZH_Baurekurs 1 (:304-305): masked [...] counsel yields none") {
    val p = parseParticipation(join("in Sachen Rekurrentin", "V. L. [...]",
      "vertreten durch [...]", "gegen Rekursgegnerschaft",
      "1. Baubehörde X 2. M. I. und K. I.-L. [...]", "Nr. 2 vertreten durch [...]"))
    assert(p.plaintiffs.head.counsel.isEmpty)
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Baurekurs 2 (:307-310): natural counsel with Dr. title") {
    val p = parseParticipation(join("in Sachen Rekurrentin",
      "Hotel Uto Kulm AG, Gratstrasse, 8143 Stallikon",
      "vertreten durch Rechtsanwalt Dr. iur. Christof Truniger, Metzgerrainle 9, Postfach 5024, 6000 Luzern 5",
      "gegen Rekursgegnerinnen",
      "1. Bau- und Planungskommission Stallikon, 8143 Stallikon 2. Baudirektion Kanton Zürich, Walchetor, Walcheplatz 2, Postfach,",
      "8090 Zürich"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("Christof Truniger", "natural person", Some("m"), Seq("Dr."))))
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Obergericht 1 (:312-314): anonymized initials kept") {
    val p = parseParticipation(join("in Sachen", "A._, Kläger",
      "vertreten durch Rechtsanwalt lic. iur. W._", "gegen",
      "1. B._, 2. C._-Stiftung, 3. D._, Beklagte",
      "1 vertreten durch Rechtsanwalt Dr. iur. X._",
      "2 vertreten durch Rechtsanwältin Dr. iur. Y._"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("W._", "natural person", Some("m"), Nil)))
  }

  test("ZH_Obergericht 2 (:316-321): initials both sides, genders differ") {
    val p = parseParticipation(join("in Sachen", "A. X., geboren ..., von ..., whft. in ...,",
      "Klägerin, Rekurrentin, Anschlussrekursgegnerin und Beschwerdeführerin vertreten durch Rechtsanwalt Dr. iur. C. D.",
      "gegen", "B. X., geboren ..., von ..., whft. in ...,",
      "Beklagter, Rekursgegner, Anschlussrekurrent und Beschwerdegegner vertreten durch Rechtsanwältin lic. iur. E. F."))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("C. D.", "natural person", Some("m"), Seq("Dr."))))
    assert(p.defendants.head.counsel ==
      Seq(LegalCounsel("E. F.", "natural person", Some("f"), Nil)))
  }

  test("ZH_Obergericht 3 (:323-326): counsel only on the defendant side") {
    val p = parseParticipation(join("in Sachen", "A._, Beklagte und Beschwerdeführerin",
      "gegen", "B._, Kläger und Beschwerdegegner",
      "vertreten durch Rechtsanwältin mag. iur. et lic. oec. publ. X._"))
    assert(p.plaintiffs.head.counsel.isEmpty)
    assert(p.defendants.head.counsel ==
      Seq(LegalCounsel("X._", "natural person", Some("f"), Nil)))
  }

  test("ZH_Verwaltungsgericht 1 (:328-331): bare RA leaves gender unknown") {
    val p = parseParticipation(join("In Sachen", "A, vertreten durch RA B,",
      "Beschwerdeführerin,", "gegen", "Migrationsamt des Kantons Zürich,",
      "Beschwerdegegner,", "betreffend vorzeitige Erteilung der Niederlassungsbewilligung,"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("B", "natural person", None, Nil)))
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Verwaltungsgericht 2 (:333-337): das-article entity + RA") {
    val p = parseParticipation(join("In Sachen",
      "Stadt Zürich, vertreten durch das Polizeidepartement,", "Beschwerdeführerin,",
      "gegen", "A, vertreten durch RA B,", "Beschwerdegegner,"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("Polizeidepartement", "legal entity", None, Nil)))
    assert(p.defendants.head.counsel ==
      Seq(LegalCounsel("B", "natural person", None, Nil)))
  }

  test("ZH_Sozialversicherungsgericht 1 (:339-343): Dr. title collected") {
    val p = parseParticipation(join("in Sachen", "X._", "Beschwerdeführerin",
      "vertreten durch Rechtsanwalt Dr. Kreso Glavas", "Advokatur Glavas AG",
      "Markusstrasse 10, 8006 Zürich", "gegen",
      "Sozialversicherungsanstalt des Kantons Zürich, IV-Stelle",
      "Röntgenstrasse 17, Postfach, 8087 Zürich", "Beschwerdegegnerin",
      "weitere Verfahrensbeteiligte:", "Personalvorsorgestiftung der Y._", "Beigeladene"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("Kreso Glavas", "natural person", Some("m"), Seq("Dr."))))
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Sozialversicherungsgericht 2 (:345-350): entity vs female Dr.") {
    val p = parseParticipation(join("in Sachen", "X._", "Klägerin",
      "vertreten durch Rechtsdienst Integration Handicap",
      "Bürglistrasse 11, 8002 Zürich", "gegen", "GastroSocial Pensionskasse",
      "Bahnhofstrasse 86, Postfach, 5001 Aarau", "Beklagte",
      "vertreten durch Rechtsanwältin Dr. Isabelle Vetter-Schreiber",
      "Hubatka Müller & Vetter, Rechtsanwälte", "Seestrasse 6, Postfach 1544, 8027 Zürich"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("Rechtsdienst Integration Handicap", "legal entity", None, Nil)))
    assert(p.defendants.head.counsel ==
      Seq(LegalCounsel("Isabelle Vetter-Schreiber", "natural person", Some("f"), Seq("Dr."))))
  }

  test("ZH_Sozialversicherungsgericht 3 (:352-356): no titles") {
    val p = parseParticipation(join("in Sachen", "X._", "Beschwerdeführerin",
      "vertreten durch Rechtsanwalt Christoph Erdös", "Erdös & Lehmann Rechtsanwälte",
      "Kernstrasse 37, 8004 Zürich", "gegen",
      "Sozialversicherungsanstalt des Kantons Zürich, IV-Stelle",
      "Röntgenstrasse 17, Postfach, 8087 Zürich", "Beschwerdegegnerin"))
    assert(p.plaintiffs.head.counsel ==
      Seq(LegalCounsel("Christoph Erdös", "natural person", Some("m"), Nil)))
    assert(p.defendants.head.counsel.isEmpty)
  }
}
