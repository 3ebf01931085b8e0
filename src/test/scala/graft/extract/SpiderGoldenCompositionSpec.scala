package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Golden-port completeness (VERDICT r3 item 8): the reference's 13
  * FULL composition headers (`test_utils.py:37-64`, joined with " "
  * exactly like `court_composition_setup`) through the SPIDER-
  * DISPATCHED engine (`parseCompositionFor` — start/end slicing per
  * spider, the path the reference's per-spider functions take), with
  * EVERY assertion pair from `test_data` (`:108-236`) ported 1:1 —
  * president name/gender, each judge's name+gender, clerk name+gender,
  * exactly where the reference asserts them. 'male'/'female' →
  * Some("m")/Some("f"). GoldenCompositionSpec keeps the same vectors
  * against the generic engine with pre-sliced headers.
  */
class SpiderGoldenCompositionSpec extends AnyFunSuite {
  import PeopleExtractors._

  private def parse(spider: String, lines: String*): CourtComposition =
    parseCompositionFor(spider, lines.mkString(" "))

  private def people(ps: Seq[Person]): Seq[(String, Option[String])] =
    ps.map(p => (p.name, p.gender))

  test("ZG_Verwaltungsgericht 1 (:113-117)") {
    val c = parse("ZG_Verwaltungsgericht", "Normal.dot",
      "VERWALTUNGSGERICHT DES KANTONS ZUG", "SOZIALVERSICHERUNGSRECHTLICHE KAMMER",
      "Mitwirkende Richter: lic. iur. Adrian Willimann, Vorsitz lic. iur. Jacqueline Iten-Staub und Dr. iur. Matthias Suter Gerichtsschreiber: MLaw Patrick Trütsch",
      "U R T E I L vom 18. Juni 2020 [rechtskräftig] gemäss § 29 der Geschäftsordnung",
      "in Sachen", "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
      "Ausgleichskasse Zug, Baarerstrasse 11, Postfach, 6302 Zug Beschwerdegegnerin",
      "betreffend", "Ergänzungsleistungen (hypothetisches Erwerbseinkommen)",
      "S 2019 121", "2", "Urteil S 2019 121")
    assert(c.president.map(_.name) == Some("Adrian Willimann"))
    assert(c.judges.map(_.name) ==
      Seq("Adrian Willimann", "Jacqueline Iten-Staub", "Matthias Suter"))
    assert(c.clerks.map(_.name) == Seq("Patrick Trütsch"))
  }

  test("ZG_Verwaltungsgericht 2 (:119-123)") {
    val c = parse("ZG_Verwaltungsgericht", "Normal.dot",
      "VERWALTUNGSGERICHT DES KANTONS ZUG", "SOZIALVERSICHERUNGSRECHTLICHE KAMMER",
      "Mitwirkende Richter: lic. iur. Adrian Willimann, Vorsitz Dr. iur. Matthias Suter und MLaw Ines Stocker Gerichtsschreiber: MLaw Patrick Trütsch",
      "U R T E I L vom 19. Oktober 2020 [rechtskräftig] gemäss § 29 der Geschäftsordnung",
      "in Sachen", "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
      "Amt für Wirtschaft und Arbeit (AWA), vertreten durch Arbeitslosenkasse des Kantons Zug, Rechtsdienst, Industriestrasse 24, 6301 Zug Beschwerdegegner",
      "betreffend", "Arbeitslosenversicherung (Einstellung in der Anspruchsberechtigung)",
      "S 2020 12", "2", "Urteil S 2020 12")
    assert(c.president.map(_.name) == Some("Adrian Willimann"))
    assert(c.judges.map(_.name) ==
      Seq("Adrian Willimann", "Matthias Suter", "Ines Stocker"))
    assert(c.clerks.map(_.name) == Seq("Patrick Trütsch"))
  }

  test("ZH_Steuerrekurs 1 (:125-134)") {
    val c = parse("ZH_Steuerrekurs", "Endentscheid Kammer",
      "Steuerrekursgericht des Kantons Zürich", "2. Abteilung",
      "2 DB.2017.240 2 ST.2017.296", "Entscheid", "5. Februar 2019", "Mitwirkend:",
      "Abteilungspräsident Christian Mäder, Steuerrichterin Micheline Roth, Steuerrichterin Barbara Collet und Gerichtsschreiber Hans Heinrich Knüsli",
      "In Sachen", "1. A, 2. B,",
      "Beschwerdeführer/ Rekurrenten, vertreten durch C AG,", "gegen",
      "1. Schw eizer ische E idgenossenschaf t , Beschwerdegegnerin, 2. Staat Zür ich , Rekursgegner, vertreten durch das kant. Steueramt, Division Konsum, Bändliweg 21, Postfach, 8090 Zürich,",
      "betreffend", "Direkte Bundessteuer 2012 sowie Staats- und Gemeindesteuern 2012",
      "- 2 -", "2 DB.2017.240 2 ST.2017.296")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Christian Mäder", Some("m"))))
    assert(people(c.judges) == Seq(("Christian Mäder", Some("m")),
      ("Micheline Roth", Some("f")), ("Barbara Collet", Some("f"))))
    assert(people(c.clerks) == Seq(("Hans Heinrich Knüsli", Some("m"))))
  }

  test("ZH_Steuerrekurs 2 (:136-145)") {
    val c = parse("ZH_Steuerrekurs", "Endentscheid Kammer",
      "Steuerrekursgericht des Kantons Zürich", "2. Abteilung", "2 GR.2013.5",
      "Entscheid", "26. August 2013", "Mitwirkend:",
      "Abteilungspräsident Christian Mäder, Steuerrichter Alexander Widl, Ersatzrichter Claude Treyer und Gerichtsschreiber Stefan Eichenberger",
      "In Sachen", "A Gm bH, vormals B GmbH,",
      "als Rechtsnachfolgerin der C GmbH Immobiliengesellschaft,",
      "Rekurrentin, vertreten durch Ernst & Young AG, Maagplatz 1, Postfach, 8010 Zürich,",
      "gegen", "Gem einde D , Rekursgegnerin, vertreten durch die Kommission für Grundsteuern,",
      "betreffend", "Grundstückgewinnsteuer", "- 2 -", "2 GR.2013.5")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Christian Mäder", Some("m"))))
    assert(people(c.judges) == Seq(("Christian Mäder", Some("m")),
      ("Alexander Widl", Some("m")), ("Claude Treyer", Some("m"))))
    assert(people(c.clerks) == Seq(("Stefan Eichenberger", Some("m"))))
  }

  test("ZH_Baurekurs 1 (:147-154)") {
    val c = parse("ZH_Baurekurs", "BRGE Nr. 0/; GUTH vom",
      "Baurekursgericht des Kantons Zürich", "2. Abteilung",
      "G.-Nr. R2.2018.00197 und R2.2019.00057 BRGE II Nr. 0142/2019 und 0143/2019",
      "Entscheid vom 10. September 2019",
      "Mitwirkende Abteilungsvizepräsident Adrian Bergmann, Baurichter Stefano Terzi,  Marlen Patt, Gerichtsschreiber Daniel Schweikert",
      "in Sachen Rekurrentin", "V. L. [...]", "vertreten durch [...]",
      "gegen Rekursgegnerschaft", "1. Baubehörde X 2. M. I. und K. I.-L. [...]",
      "Nr. 2 vertreten durch [...]",
      "R2.2018.00197 betreffend Baubehördenbeschluss vom 4. September 2017; Baubewilligung für Um-",
      "bau Einfamilienhausteil und Ausbau Dachgeschoss, [...], BRGE II Nr. 00025/2018 vom 6. März 2018; Rückweisung zum  mit VB.2018.00209 vom 20. September 2018",
      "R2.2019.00057 Präsidialverfügung vom 29. März 2019; Baubewilligung für Umbau  und Ausbau Dachgeschoss (1. Projektänderung), [...] _",
      "R2.2018.00197 Seite 2")
    assert(people(c.judges) == Seq(("Adrian Bergmann", Some("m")),
      ("Stefano Terzi", Some("m")), ("Marlen Patt", Some("m"))))
    assert(people(c.clerks) == Seq(("Daniel Schweikert", Some("m"))))
  }

  test("ZH_Baurekurs 2 (:156-163)") {
    val c = parse("ZH_Baurekurs", "BRGE Nr. 0/; GUTH vom",
      "Baurekursgericht des Kantons Zürich", "2. Abteilung",
      "G.-Nr. R2.2011.00160 BRGE II Nr. 0049/2012", "Entscheid vom 20. März 2012",
      "Mitwirkende Abteilungsvizepräsident Emil Seliner, Baurichter Peter Rütimann,  Adrian Bergmann, Gerichtsschreiber Robert Durisch",
      "in Sachen Rekurrentin", "Hotel Uto Kulm AG, Gratstrasse, 8143 Stallikon",
      "vertreten durch Rechtsanwalt Dr. iur. Christof Truniger, Metzgerrainle 9, Postfach 5024, 6000 Luzern 5",
      "gegen Rekursgegnerinnen",
      "1. Bau- und Planungskommission Stallikon, 8143 Stallikon 2. Baudirektion Kanton Zürich, Walchetor, Walcheplatz 2, Postfach,",
      "8090 Zürich",
      "betreffend Bau- und Planungskommissionsbeschluss vom 24. August 2011 und Ver-",
      "fügung der Baudirektion Kanton Zürich Nr. BVV 06.0429_1 vom 8. Juli 2011; Verweigerung der nachträglichen Baubewilligung für Aussen- und Turmbeleuchtung Uto Kulm (Neubeurteilung), Kat.-Nr. 1032, Gratstrasse, Hotel-Restaurant Uto Kulm, Üetliberg / Stallikon _",
      "R2.2011.00160 Seite 2")
    assert(people(c.judges) == Seq(("Emil Seliner", Some("m")),
      ("Peter Rütimann", Some("m")), ("Adrian Bergmann", Some("m"))))
    assert(people(c.clerks) == Seq(("Robert Durisch", Some("m"))))
  }

  test("ZH_Obergericht 1 (:165-172)") {
    val c = parse("ZH_Obergericht", "Urteil - Abweisung, begründet",
      "Bezirksgericht Zürich 3. Abteilung", "Geschäfts-Nr.: CG170019-L / U",
      "Mitwirkend: Vizepräsident lic. iur. Th. Kläusli, Bezirksrichter lic. iur. K. Vogel,",
      "Ersatzrichter MLaw D. Brugger sowie der Gerichtsschreiber M.A.",
      "HSG Ch. Reitze", "Urteil vom 4. März 2020", "in Sachen", "A._, Kläger",
      "vertreten durch Rechtsanwalt lic. iur. W._", "gegen",
      "1. B._, 2. C._-Stiftung, 3. D._, Beklagte",
      "1 vertreten durch Rechtsanwalt Dr. iur. X._",
      "2 vertreten durch Rechtsanwältin Dr. iur. Y._")
    assert(people(c.judges) == Seq(("Th. Kläusli", Some("m")),
      ("K. Vogel", Some("m")), ("D. Brugger", Some("m"))))
    assert(people(c.clerks) == Seq(("Ch. Reitze", Some("m"))))
  }

  test("ZH_Obergericht 2 (:174-187)") {
    val c = parse("ZH_Obergericht", "Kassationsgericht des Kantons Zürich",
      "Kass.-Nr. AA050130/U/mb",
      "Mitwirkende: die Kassationsrichter Moritz Kuhn, Präsident, Robert Karrer, Karl",
      "Spühler, Paul Baumgartner und die Kassationsrichterin Yvona",
      "Griesser sowie die Sekretärin Margrit Scheuber",
      "Zirkulationsbeschluss vom 4. September 2006", "in Sachen",
      "A. X., geboren ..., von ..., whft. in ...,",
      "Klägerin, Rekurrentin, Anschlussrekursgegnerin und Beschwerdeführerin vertreten durch Rechtsanwalt Dr. iur. C. D.",
      "gegen", "B. X., geboren ..., von ..., whft. in ...,",
      "Beklagter, Rekursgegner, Anschlussrekurrent und Beschwerdegegner vertreten durch Rechtsanwältin lic. iur. E. F.")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Moritz Kuhn", Some("m"))))
    assert(people(c.judges) == Seq(("Moritz Kuhn", Some("m")),
      ("Robert Karrer", Some("m")), ("Karl Spühler", Some("m")),
      ("Paul Baumgartner", Some("m")), ("Yvona Griesser", Some("f"))))
    assert(people(c.clerks) == Seq(("Margrit Scheuber", Some("f"))))
  }

  test("ZH_Verwaltungsgericht 1 (:189-198)") {
    val c = parse("ZH_Verwaltungsgericht",
      "Verwaltungsgericht des Kantons Zürich 4. Abteilung", "VB.2020.00452",
      "Urteil", "der 4. Kammer", "vom 24. September 2020",
      "Mitwirkend: Abteilungspräsidentin Tamara Nüssle (Vorsitz), Verwaltungsrichter Reto Häggi Furrer, Verwaltungsrichter Martin Bertschi, Gerichtsschreiber David Henseler.",
      "In Sachen", "A, vertreten durch RA B,", "Beschwerdeführerin,", "gegen",
      "Migrationsamt des Kantons Zürich,", "Beschwerdegegner,",
      "betreffend vorzeitige Erteilung der Niederlassungsbewilligung,")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Tamara Nüssle", Some("f"))))
    assert(people(c.judges) == Seq(("Tamara Nüssle", Some("f")),
      ("Reto Häggi Furrer", Some("m")), ("Martin Bertschi", Some("m"))))
    assert(people(c.clerks) == Seq(("David Henseler", Some("m"))))
  }

  test("ZH_Verwaltungsgericht 2 (:200-209)") {
    val c = parse("ZH_Verwaltungsgericht",
      "Verwaltungsgericht des Kantons Zürich 3. Abteilung", "VB.2011.00558",
      "Urteil", "der 3. Kammer", "vom 8. Februar 2012",
      "Mitwirkend: Abteilungspräsident Rudolf Bodmer (Vorsitz), Verwaltungsrichterin Bea Rotach Tomschin, Ersatzrichter Martin Kayser, Gerichtsschreiber Cyrill Bienz.",
      "In Sachen", "Stadt Zürich, vertreten durch das Polizeidepartement,",
      "Beschwerdeführerin,", "gegen", "A, vertreten durch RA B,",
      "Beschwerdegegner,", "betreffend Benützung des öffentlichen Grundes zu Sonderzwecken,")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Rudolf Bodmer", Some("m"))))
    assert(people(c.judges) == Seq(("Rudolf Bodmer", Some("m")),
      ("Bea Rotach Tomschin", Some("f")), ("Martin Kayser", Some("m"))))
    assert(people(c.clerks) == Seq(("Cyrill Bienz", Some("m"))))
  }

  test("ZH_Sozialversicherungsgericht 1 (:211-220)") {
    val c = parse("ZH_Sozialversicherungsgericht",
      "Sozialversicherungsgerichtdes Kantons Zürich IV.2014.00602", "II. Kammer",
      "Sozialversicherungsrichter Mosimann, Vorsitzender",
      "Sozialversicherungsrichterin Käch", "Sozialversicherungsrichterin Sager",
      "Gerichtsschreiberin Kudelski", "Urteil vom 11. August 2015", "in Sachen",
      "X._", "Beschwerdeführerin", "vertreten durch Rechtsanwalt Dr. Kreso Glavas",
      "Advokatur Glavas AG", "Markusstrasse 10, 8006 Zürich", "gegen",
      "Sozialversicherungsanstalt des Kantons Zürich, IV-Stelle",
      "Röntgenstrasse 17, Postfach, 8087 Zürich", "Beschwerdegegnerin",
      "weitere Verfahrensbeteiligte:", "Personalvorsorgestiftung der Y._", "Beigeladene")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Mosimann", Some("m"))))
    assert(people(c.judges) == Seq(("Mosimann", Some("m")),
      ("Käch", Some("f")), ("Sager", Some("f"))))
    assert(people(c.clerks) == Seq(("Kudelski", Some("f"))))
  }

  test("ZH_Sozialversicherungsgericht 2 (:222-231)") {
    val c = parse("ZH_Sozialversicherungsgericht", "BV.2008.00114",
      "Sozialversicherungsgericht", "des Kantons Zürich", "III. Kammer",
      "Sozialversicherungsrichterin Heine, Vorsitzende",
      "Sozialversicherungsrichterin Annaheim", "Sozialversicherungsrichterin Daubenmeyer",
      "Gerichtssekretär O. Peter", "Urteil vom 30. Juni 2010", "in Sachen", "X._",
      "Klägerin", "vertreten durch Rechtsdienst Integration Handicap",
      "Bürglistrasse 11, 8002 Zürich", "gegen", "GastroSocial Pensionskasse",
      "Bahnhofstrasse 86, Postfach, 5001 Aarau", "Beklagte",
      "vertreten durch Rechtsanwältin Dr. Isabelle Vetter-Schreiber",
      "Hubatka Müller & Vetter, Rechtsanwälte", "Seestrasse 6, Postfach 1544, 8027 Zürich")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Heine", Some("f"))))
    assert(people(c.judges) == Seq(("Heine", Some("f")),
      ("Annaheim", Some("f")), ("Daubenmeyer", Some("f"))))
    assert(people(c.clerks) == Seq(("O. Peter", Some("m"))))
  }

  test("ZH_Sozialversicherungsgericht 3 (:233-242)") {
    val c = parse("ZH_Sozialversicherungsgericht",
      "Sozialversicherungsgerichtdes Kantons Zürich",
      "IV.2017.00330 IV. Kammer Sozialversicherungsrichter Hurst, Vorsitzender Sozialversicherungsrichterin Philipp Sozialversicherungsrichter Vogel Gerichtsschreiberin Curiger Urteil vom 7. August 2018",
      "in Sachen", "X._", "Beschwerdeführerin",
      "vertreten durch Rechtsanwalt Christoph Erdös", "Erdös & Lehmann Rechtsanwälte",
      "Kernstrasse 37, 8004 Zürich", "gegen",
      "Sozialversicherungsanstalt des Kantons Zürich, IV-Stelle",
      "Röntgenstrasse 17, Postfach, 8087 Zürich", "Beschwerdegegnerin")
    assert(c.president.map(p => (p.name, p.gender)) == Some(("Hurst", Some("m"))))
    assert(people(c.judges) == Seq(("Hurst", Some("m")),
      ("Philipp", Some("f")), ("Vogel", Some("m"))))
    assert(people(c.clerks) == Seq(("Curiger", Some("f"))))
  }
}
