package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The reference's procedural-participation golden vectors run through
  * the SPIDER-DISPATCHED engine (`test_utils.py:247-360`:
  * `procedural_participation_setup` joins the header lines with ", ",
  * calls the spider's function with namespace_de, and asserts the
  * listed (value, expected) pairs). Every assertion pair from
  * `test_data` (`:282-356`) is ported 1:1 below; gender 'male'/'female'
  * → Some("m")/Some("f"), 'unknown' → None.
  *
  * GoldenParticipationSpec keeps the same vectors against the generic
  * engine; this spec proves the per-spider config dispatch
  * (ParticipationExtractors.participationSpiders) reproduces the
  * reference's own expected outputs.
  */
class SpiderParticipationSpec extends AnyFunSuite {
  import ParticipationExtractors._

  private def parse(spider: String, lines: String*): SpiderParticipation =
    parseParticipationFor(spider, "de", lines.mkString(", "))
      .getOrElse(fail(s"parse returned None for $spider"))

  test("ZG_Verwaltungsgericht 1 (:284-286)") {
    val p = parse("ZG_Verwaltungsgericht", "in Sachen",
      "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
      "Ausgleichskasse Zug, Baarerstrasse 11, Postfach, 6302 Zug Beschwerdegegnerin",
      "betreffend", "Ergänzungsleistungen (hypothetisches Erwerbseinkommen)")
    assert(p.plaintiffs.head.counsel.head.name == "B._ AG")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZG_Verwaltungsgericht 2 (:288-291)") {
    val p = parse("ZG_Verwaltungsgericht", "in Sachen",
      "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
      "Amt für Wirtschaft und Arbeit (AWA), vertreten durch Arbeitslosenkasse des Kantons Zug, Rechtsdienst, Industriestrasse 24, 6301 Zug Beschwerdegegner")
    assert(p.defendants.head.counsel.head.name == "Arbeitslosenkasse des Kantons Zug")
    assert(p.defendants.head.counsel.head.legalType == "legal entity")
    assert(p.plaintiffs.head.counsel.head.name == "B._ AG")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
  }

  test("ZH_Steuerrekurs 1 (:293-296)") {
    val p = parse("ZH_Steuerrekurs", "In Sachen", "1. A, 2. B,",
      "Beschwerdeführer/ Rekurrenten, vertreten durch C AG,", "gegen",
      "1. Schw eizer ische E idgenossenschaf t , Beschwerdegegnerin, 2. Staat Zür ich , Rekursgegner, vertreten durch das kant. Steueramt, Division Konsum, Bändliweg 21, Postfach, 8090 Zürich,")
    assert(p.defendants.head.counsel.head.name == "Steueramt")
    assert(p.defendants.head.counsel.head.legalType == "legal entity")
    assert(p.plaintiffs.head.counsel.head.name == "C AG")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
  }

  test("ZH_Steuerrekurs 2 (:298-301)") {
    val p = parse("ZH_Steuerrekurs", "In Sachen", "A Gm bH, vormals B GmbH,",
      "als Rechtsnachfolgerin der C GmbH Immobiliengesellschaft,",
      "Rekurrentin, vertreten durch Ernst & Young AG, Maagplatz 1, Postfach, 8010 Zürich,",
      "gegen", "Gem einde D , Rekursgegnerin, vertreten durch die Kommission für Grundsteuern,")
    assert(p.defendants.head.counsel.head.name == "Kommission für Grundsteuern")
    assert(p.defendants.head.counsel.head.legalType == "legal entity")
    assert(p.plaintiffs.head.counsel.head.name == "Ernst & Young AG")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
  }

  test("ZH_Baurekurs 1 (:303-304): redacted [...] representation → none") {
    val p = parse("ZH_Baurekurs", "in Sachen Rekurrentin", "V. L. [...]",
      "vertreten durch [...]", "gegen Rekursgegnerschaft",
      "1. Baubehörde X 2. M. I. und K. I.-L. [...]", "Nr. 2 vertreten durch [...]")
    assert(p.plaintiffs.head.counsel.isEmpty)
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Baurekurs 2 (:306-309)") {
    val p = parse("ZH_Baurekurs", "in Sachen Rekurrentin",
      "Hotel Uto Kulm AG, Gratstrasse, 8143 Stallikon",
      "vertreten durch Rechtsanwalt Dr. iur. Christof Truniger, Metzgerrainle 9, Postfach 5024, 6000 Luzern 5",
      "gegen Rekursgegnerinnen",
      "1. Bau- und Planungskommission Stallikon, 8143 Stallikon 2. Baudirektion Kanton Zürich, Walchetor, Walcheplatz 2, Postfach,",
      "8090 Zürich")
    assert(p.plaintiffs.head.counsel.head.name == "Christof Truniger")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Obergericht 1 (:311-313)") {
    val p = parse("ZH_Obergericht", "in Sachen", "A._, Kläger",
      "vertreten durch Rechtsanwalt lic. iur. W._", "gegen",
      "1. B._, 2. C._-Stiftung, 3. D._, Beklagte",
      "1 vertreten durch Rechtsanwalt Dr. iur. X._",
      "2 vertreten durch Rechtsanwältin Dr. iur. Y._")
    assert(p.plaintiffs.head.counsel.head.name == "W._")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
  }

  test("ZH_Obergericht 2 (:315-320)") {
    val p = parse("ZH_Obergericht", "in Sachen", "A. X., geboren ..., von ..., whft. in ...,",
      "Klägerin, Rekurrentin, Anschlussrekursgegnerin und Beschwerdeführerin vertreten durch Rechtsanwalt Dr. iur. C. D.",
      "gegen", "B. X., geboren ..., von ..., whft. in ...,",
      "Beklagter, Rekursgegner, Anschlussrekurrent und Beschwerdegegner vertreten durch Rechtsanwältin lic. iur. E. F.")
    assert(p.plaintiffs.head.counsel.head.name == "C. D.")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
    assert(p.defendants.head.counsel.head.name == "E. F.")
    assert(p.defendants.head.counsel.head.legalType == "natural person")
    assert(p.defendants.head.counsel.head.gender == Some("f"))
  }

  test("ZH_Obergericht 3 (:322-325)") {
    val p = parse("ZH_Obergericht", "in Sachen", "A._, Beklagte und Beschwerdeführerin",
      "gegen", "B._, Kläger und Beschwerdegegner",
      "vertreten durch Rechtsanwältin mag. iur. et lic. oec. publ. X._")
    assert(p.plaintiffs.head.counsel.isEmpty)
    assert(p.defendants.head.counsel.head.name == "X._")
    assert(p.defendants.head.counsel.head.legalType == "natural person")
    assert(p.defendants.head.counsel.head.gender == Some("f"))
  }

  test("ZH_Verwaltungsgericht 1 (:327-330): bare RA → gender unknown") {
    val p = parse("ZH_Verwaltungsgericht", "In Sachen", "A, vertreten durch RA B,",
      "Beschwerdeführerin,", "gegen", "Migrationsamt des Kantons Zürich,",
      "Beschwerdegegner,", "betreffend vorzeitige Erteilung der Niederlassungsbewilligung,")
    assert(p.plaintiffs.head.counsel.head.name == "B")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == None)
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Verwaltungsgericht 2 (:332-336)") {
    val p = parse("ZH_Verwaltungsgericht", "In Sachen",
      "Stadt Zürich, vertreten durch das Polizeidepartement,", "Beschwerdeführerin,",
      "gegen", "A, vertreten durch RA B,", "Beschwerdegegner,")
    assert(p.plaintiffs.head.counsel.head.name == "Polizeidepartement")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
    assert(p.defendants.head.counsel.head.name == "B")
    assert(p.defendants.head.counsel.head.legalType == "natural person")
    assert(p.defendants.head.counsel.head.gender == None)
  }

  test("ZH_Sozialversicherungsgericht 1 (:338-342): Dr. title collected") {
    val p = parse("ZH_Sozialversicherungsgericht", "in Sachen", "X._", "Beschwerdeführerin",
      "vertreten durch Rechtsanwalt Dr. Kreso Glavas", "Advokatur Glavas AG",
      "Markusstrasse 10, 8006 Zürich", "gegen",
      "Sozialversicherungsanstalt des Kantons Zürich, IV-Stelle",
      "Röntgenstrasse 17, Postfach, 8087 Zürich", "Beschwerdegegnerin",
      "weitere Verfahrensbeteiligte:", "Personalvorsorgestiftung der Y._", "Beigeladene")
    assert(p.plaintiffs.head.counsel.head.name == "Kreso Glavas")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
    assert(p.plaintiffs.head.counsel.head.titles.head == "Dr.")
    assert(p.defendants.head.counsel.isEmpty)
  }

  test("ZH_Sozialversicherungsgericht 2 (:344-349)") {
    val p = parse("ZH_Sozialversicherungsgericht", "in Sachen", "X._", "Klägerin",
      "vertreten durch Rechtsdienst Integration Handicap",
      "Bürglistrasse 11, 8002 Zürich", "gegen", "GastroSocial Pensionskasse",
      "Bahnhofstrasse 86, Postfach, 5001 Aarau", "Beklagte",
      "vertreten durch Rechtsanwältin Dr. Isabelle Vetter-Schreiber",
      "Hubatka Müller & Vetter, Rechtsanwälte", "Seestrasse 6, Postfach 1544, 8027 Zürich")
    assert(p.plaintiffs.head.counsel.head.name == "Rechtsdienst Integration Handicap")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
    assert(p.defendants.head.counsel.head.name == "Isabelle Vetter-Schreiber")
    assert(p.defendants.head.counsel.head.legalType == "natural person")
    assert(p.defendants.head.counsel.head.gender == Some("f"))
    assert(p.defendants.head.counsel.head.titles.head == "Dr.")
  }

  test("ZH_Sozialversicherungsgericht 3 (:351-355): no titles") {
    val p = parse("ZH_Sozialversicherungsgericht", "in Sachen", "X._", "Beschwerdeführerin",
      "vertreten durch Rechtsanwalt Christoph Erdös", "Erdös & Lehmann Rechtsanwälte",
      "Kernstrasse 37, 8004 Zürich", "gegen",
      "Sozialversicherungsanstalt des Kantons Zürich, IV-Stelle",
      "Röntgenstrasse 17, Postfach, 8087 Zürich", "Beschwerdegegnerin")
    assert(p.plaintiffs.head.counsel.head.name == "Christoph Erdös")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
    assert(p.plaintiffs.head.counsel.head.titles.isEmpty)
    assert(p.defendants.head.counsel.isEmpty)
  }

  // ---- beyond the reference's test_data: CH_BGer's own trilingual
  // config (`:33-205`) and the quarantine paths, spec'd here because
  // the reference ships no golden vectors for them

  test("CH_BGer de: party genders + lawyer via Rechtsanwalt") {
    val p = parse("CH_BGer", "Verfahrensbeteiligte",
      "A._, Beschwerdeführer, vertreten durch Rechtsanwalt Dr. Hans Muster",
      "gegen", "B._ AG, Beschwerdegegnerin", "Gegenstand", "Forderung")
    assert(p.plaintiffs.head.name == "A._")
    assert(p.plaintiffs.head.gender == Some("m"))
    assert(p.plaintiffs.head.legalType == "natural person")
    // CH_BGer's search_lawyers keeps the raw match — no strip, no
    // title extraction (`:113`)
    assert(p.plaintiffs.head.counsel.head.name == " Dr. Hans Muster")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
    assert(p.defendants.head.name == "B._ AG")
    assert(p.defendants.head.legalType == "legal entity")
  }

  test("CH_BGer fr: recourante, Me-prefixed counsel, Objet end marker") {
    val p = parseParticipationFor("CH_BGer", "fr",
      "Participants à la procédure, X._, recourante, représentée par Me Jeanne Dupont, contre, Office cantonal, intimé, Objet, assurance").get
    assert(p.plaintiffs.head.name == "X._")
    assert(p.plaintiffs.head.gender == Some("f"))
    assert(p.plaintiffs.head.counsel.head.name == " Jeanne Dupont")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.defendants.head.name == "Office cantonal")
    assert(p.defendants.head.legalType == "legal entity")
  }

  test("CH_BGer it: no genders in italian, avv. counsel") {
    val p = parseParticipationFor("CH_BGer", "it",
      "Partecipanti al procedimento, A._, ricorrente, patrocinato dall'avv. Mario Rossi, contro, Stato del Cantone Ticino, Oggetto, ricorso").get
    assert(p.plaintiffs.head.name == "A._")
    assert(p.plaintiffs.head.gender == None)
    assert(p.plaintiffs.head.counsel.head.name == "Mario Rossi")
    assert(p.plaintiffs.head.counsel.head.gender == None)
    assert(p.defendants.head.name == "Stato del Cantone Ticino")
  }

  test("CH_BGer de: numbered party list recurses, genders dropped") {
    val p = parse("CH_BGer", "in Sachen", "1. A._, 2. B._, Beschwerdeführer",
      "gegen", "C._ AG, Beschwerdegegnerin", "Gegenstand", "Vertrag")
    assert(p.plaintiffs.map(_.name) == Seq("A._", "B._"))
    assert(p.plaintiffs.forall(_.gender.isEmpty))
    assert(p.plaintiffs.forall(_.legalType == "natural person"))
  }

  test("quarantine: malformed header (no second party) → None") {
    assert(parseParticipationFor("CH_BGer", "de",
      "Verfahrensbeteiligte, A._, Beschwerdeführer, Gegenstand, Klage").isEmpty)
  }

  test("quarantine: unconfigured spider / unsupported language → None") {
    assert(parseParticipationFor("AG_Gerichte", "de", "in Sachen A gegen B").isEmpty)
    assert(parseParticipationFor("ZH_Obergericht", "fr", "in Sachen A gegen B").isEmpty)
  }
  test("lawyer name BEFORE the role word when a comma follows it (:429-433)") {
    // '<name>, Rechtsanwalt,' — the role is immediately followed by a
    // comma, so the reference searches the text BEFORE it for the name
    val p = parse("ZH_Obergericht", "in Sachen", "A._, Kläger",
      "vertreten durch Hans Muster, Rechtsanwalt,", "gegen",
      "B._, Beklagte")
    assert(p.plaintiffs.head.counsel.head.name == "Hans Muster")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
    assert(p.plaintiffs.head.counsel.head.gender == Some("m"))
  }

  test("bare-only entity keeps its full Me-name as legal entity (:151-156)") {
    // the bounded entity regex (`:141`) needs a trailing comma; with
    // none in the segment only the bare fallback (`:151`) matches —
    // and that branch is ALWAYS a legal entity with the full name: the
    // Me-prefix munging (`:144`) belongs to the bounded branch alone
    val p = parseParticipationFor("CH_BGer", "de",
      "Verfahrensbeteiligte, A._, Beschwerdeführer, vertreten durch Metzger Treuhand AG gegen B._ AG, Beschwerdegegnerin, Gegenstand, Klage").get
    assert(p.plaintiffs.head.counsel.head.name.trim == "Metzger Treuhand AG")
    assert(p.plaintiffs.head.counsel.head.legalType == "legal entity")
  }

  test("CH_BGer nameless lawyer keeps an empty-name counsel (:116 quirk)") {
    // role word with a comma right after and nothing before: the
    // backward search yields an empty match; CH_BGer appends the
    // counsel anyway (the shared engine would quarantine instead)
    val p = parse("CH_BGer", "Verfahrensbeteiligte",
      "A._, vertreten durch Rechtsanwalt,", "gegen",
      "B._ AG, Beschwerdegegnerin", "Gegenstand", "Klage")
    assert(p.plaintiffs.head.counsel.head.name == "")
    assert(p.plaintiffs.head.counsel.head.legalType == "natural person")
  }
}
