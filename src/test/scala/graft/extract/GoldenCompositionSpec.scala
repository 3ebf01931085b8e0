package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** The reference's own golden test vectors, ported (SURVEY §5 plan):
  * header fixtures and expected compositions are test DATA from
  * `/root/reference/scrc/utils/test_utils.py:37-49` (headers) and
  * `:108-236` (expected names/genders), driven through OUR parser.
  * Gender encoding: reference 'male'/'female' → "m"/"f".
  */
class GoldenCompositionSpec extends AnyFunSuite {
  import PeopleExtractors._

  private def join(lines: String*): String = lines.mkString(" ")

  // test_utils.py:37 (ZG_Verwaltungsgericht_test_header)
  val zgVg = join("Normal.dot", "VERWALTUNGSGERICHT DES KANTONS ZUG",
    "SOZIALVERSICHERUNGSRECHTLICHE KAMMER",
    "Mitwirkende Richter: lic. iur. Adrian Willimann, Vorsitz lic. iur. Jacqueline Iten-Staub und Dr. iur. Matthias Suter Gerichtsschreiber: MLaw Patrick Trütsch",
    "U R T E I L vom 18. Juni 2020 [rechtskräftig] gemäss § 29 der Geschäftsordnung",
    "in Sachen", "A._ Beschwerdeführer vertreten durch B._ AG", "gegen",
    "Ausgleichskasse Zug, Baarerstrasse 11, Postfach, 6302 Zug Beschwerdegegnerin")

  test("ZG_Verwaltungsgericht header 1 (test_utils.py:113-117)") {
    val c = parseComposition(zgVg)
    assert(c.president.map(_.name) == Some("Adrian Willimann"))
    assert(c.judges.map(_.name) ==
      Seq("Adrian Willimann", "Jacqueline Iten-Staub", "Matthias Suter"))
    assert(c.clerks.map(_.name) == Seq("Patrick Trütsch"))
  }

  // test_utils.py:39 (header 2)
  val zgVg2 = join(
    "Mitwirkende Richter: lic. iur. Adrian Willimann, Vorsitz Dr. iur. Matthias Suter und MLaw Ines Stocker Gerichtsschreiber: MLaw Patrick Trütsch",
    "U R T E I L vom 19. Oktober 2020")

  test("ZG_Verwaltungsgericht header 2 (test_utils.py:119-123)") {
    val c = parseComposition(zgVg2)
    assert(c.president.map(_.name) == Some("Adrian Willimann"))
    assert(c.judges.map(_.name) ==
      Seq("Adrian Willimann", "Matthias Suter", "Ines Stocker"))
    assert(c.clerks.map(_.name) == Seq("Patrick Trütsch"))
  }

  // test_utils.py:41 (ZH_Steuerrekurs_test_header)
  val zhSr = join("Endentscheid Kammer", "Steuerrekursgericht des Kantons Zürich",
    "2. Abteilung", "2 DB.2017.240 2 ST.2017.296", "Entscheid", "5. Februar 2019",
    "Mitwirkend:",
    "Abteilungspräsident Christian Mäder, Steuerrichterin Micheline Roth, Steuerrichterin Barbara Collet und Gerichtsschreiber Hans Heinrich Knüsli",
    "In Sachen", "1. A, 2. B,")

  test("ZH_Steuerrekurs header 1 (test_utils.py:120-129)") {
    val c = parseComposition(zhSr)
    assert(c.president.map(_.name) == Some("Christian Mäder"))
    assert(c.president.flatMap(_.gender) == Some("m"))
    assert(c.judges.map(_.name) ==
      Seq("Christian Mäder", "Micheline Roth", "Barbara Collet"))
    assert(c.judges.map(_.gender) == Seq(Some("m"), Some("f"), Some("f")))
    assert(c.clerks == Seq(Person("Hans Heinrich Knüsli", Some("m"))))
  }

  // test_utils.py:43 (header 2)
  val zhSr2 = join("Entscheid", "26. August 2013", "Mitwirkend:",
    "Abteilungspräsident Christian Mäder, Steuerrichter Alexander Widl, Ersatzrichter Claude Treyer und Gerichtsschreiber Stefan Eichenberger",
    "In Sachen", "A Gm bH, vormals B GmbH,")

  test("ZH_Steuerrekurs header 2 (test_utils.py:131-140)") {
    val c = parseComposition(zhSr2)
    assert(c.president.map(_.name) == Some("Christian Mäder"))
    assert(c.president.flatMap(_.gender) == Some("m")) // test_utils.py:132
    assert(c.judges.map(_.name) ==
      Seq("Christian Mäder", "Alexander Widl", "Claude Treyer"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "m", "m"))
    assert(c.clerks == Seq(Person("Stefan Eichenberger", Some("m"))))
  }

  // test_utils.py:45 (ZH_Baurekurs_test_header)
  val zhBr = join("BRGE Nr. 0/; GUTH vom", "Baurekursgericht des Kantons Zürich",
    "2. Abteilung", "G.-Nr. R2.2018.00197 und R2.2019.00057 BRGE II Nr. 0142/2019 und 0143/2019",
    "Entscheid vom 10. September 2019",
    "Mitwirkende Abteilungsvizepräsident Adrian Bergmann, Baurichter Stefano Terzi,  Marlen Patt, Gerichtsschreiber Daniel Schweikert",
    "in Sachen Rekurrentin")

  test("ZH_Baurekurs header 1 (test_utils.py:142-150): vice-president is not president") {
    val c = parseComposition(zhBr)
    assert(c.president.isEmpty)
    assert(c.judges.map(_.name) == Seq("Adrian Bergmann", "Stefano Terzi", "Marlen Patt"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "m", "m")) // context-inherited
    assert(c.clerks == Seq(Person("Daniel Schweikert", Some("m"))))
  }

  // test_utils.py:47 (header 2)
  val zhBr2 = join("Entscheid vom 20. März 2012",
    "Mitwirkende Abteilungsvizepräsident Emil Seliner, Baurichter Peter Rütimann,  Adrian Bergmann, Gerichtsschreiber Robert Durisch",
    "in Sachen Rekurrentin", "Hotel Uto Kulm AG, Gratstrasse, 8143 Stallikon")

  test("ZH_Baurekurs header 2 (test_utils.py:151-159)") {
    val c = parseComposition(zhBr2)
    assert(c.judges.map(_.name) == Seq("Emil Seliner", "Peter Rütimann", "Adrian Bergmann"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "m", "m")) // test_utils.py:152-157
    assert(c.clerks == Seq(Person("Robert Durisch", Some("m"))))
  }

  // test_utils.py:49 (ZH_Obergericht_test_header)
  val zhOg = join("Urteil - Abweisung, begründet", "Bezirksgericht Zürich 3. Abteilung",
    "Geschäfts-Nr.: CG170019-L / U",
    "Mitwirkend: Vizepräsident lic. iur. Th. Kläusli, Bezirksrichter lic. iur. K. Vogel,",
    "Ersatzrichter MLaw D. Brugger sowie der Gerichtsschreiber M.A.",
    "HSG Ch. Reitze", "Urteil vom 4. März 2020", "in Sachen")

  test("ZH_Obergericht header 1 (test_utils.py:160-168): titles stripped, initials kept") {
    val c = parseComposition(zhOg)
    assert(c.president.isEmpty)
    assert(c.judges.map(_.name) == Seq("Th. Kläusli", "K. Vogel", "D. Brugger"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "m", "m")) // test_utils.py:161-166
    assert(c.clerks == Seq(Person("Ch. Reitze", Some("m")))) // :167-168
  }

  // test_utils.py:51 (header 2)
  val zhOg2 = join("Kassationsgericht des Kantons Zürich", "Kass.-Nr. AA050130/U/mb",
    "Mitwirkende: die Kassationsrichter Moritz Kuhn, Präsident, Robert Karrer, Karl",
    "Spühler, Paul Baumgartner und die Kassationsrichterin Yvona",
    "Griesser sowie die Sekretärin Margrit Scheuber",
    "Zirkulationsbeschluss vom 4. September 2006", "in Sachen")

  test("ZH_Obergericht header 2 (test_utils.py:169-183): plural role + name list") {
    val c = parseComposition(zhOg2)
    assert(c.president.map(_.name) == Some("Moritz Kuhn"))
    assert(c.president.flatMap(_.gender) == Some("m")) // test_utils.py:170
    assert(c.judges.map(_.name) == Seq("Moritz Kuhn", "Robert Karrer",
      "Karl Spühler", "Paul Baumgartner", "Yvona Griesser"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "m", "m", "m", "f"))
    assert(c.clerks == Seq(Person("Margrit Scheuber", Some("f"))))
  }

  // test_utils.py:55 (ZH_Verwaltungsgericht_test_header)
  val zhVg = join("Verwaltungsgericht des Kantons Zürich 4. Abteilung", "VB.2020.00452",
    "Urteil", "der 4. Kammer", "vom 24. September 2020",
    "Mitwirkend: Abteilungspräsidentin Tamara Nüssle (Vorsitz), Verwaltungsrichter Reto Häggi Furrer, Verwaltungsrichter Martin Bertschi, Gerichtsschreiber David Henseler.",
    "In Sachen", "A, vertreten durch RA B,")

  test("ZH_Verwaltungsgericht header 1 (test_utils.py:184-193)") {
    val c = parseComposition(zhVg)
    assert(c.president == Some(Person("Tamara Nüssle", Some("f"))))
    assert(c.judges.map(_.name) == Seq("Tamara Nüssle", "Reto Häggi Furrer", "Martin Bertschi"))
    assert(c.judges.flatMap(_.gender) == Seq("f", "m", "m"))
    assert(c.clerks == Seq(Person("David Henseler", Some("m"))))
  }

  // test_utils.py:57 (header 2)
  val zhVg2 = join("Verwaltungsgericht des Kantons Zürich 3. Abteilung", "VB.2011.00558",
    "Urteil", "der 3. Kammer", "vom 8. Februar 2012",
    "Mitwirkend: Abteilungspräsident Rudolf Bodmer (Vorsitz), Verwaltungsrichterin Bea Rotach Tomschin, Ersatzrichter Martin Kayser, Gerichtsschreiber Cyrill Bienz.",
    "In Sachen", "Stadt Zürich, vertreten durch das Polizeidepartement,")

  test("ZH_Verwaltungsgericht header 2 (test_utils.py:195-204)") {
    val c = parseComposition(zhVg2)
    assert(c.president == Some(Person("Rudolf Bodmer", Some("m"))))
    assert(c.judges.map(_.name) == Seq("Rudolf Bodmer", "Bea Rotach Tomschin", "Martin Kayser"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "f", "m"))
    assert(c.clerks == Seq(Person("Cyrill Bienz", Some("m"))))
  }

  // test_utils.py:60 (ZH_Sozialversicherungsgericht_test_header)
  val zhSvg = join("Sozialversicherungsgerichtdes Kantons Zürich IV.2014.00602",
    "II. Kammer", "Sozialversicherungsrichter Mosimann, Vorsitzender",
    "Sozialversicherungsrichterin Käch", "Sozialversicherungsrichterin Sager",
    "Gerichtsschreiberin Kudelski", "Urteil vom 11. August 2015", "in Sachen", "X._")

  test("ZH_Sozialversicherungsgericht header 1 (test_utils.py:206-215)") {
    val c = parseComposition(zhSvg)
    assert(c.president == Some(Person("Mosimann", Some("m"))))
    assert(c.judges.map(_.name) == Seq("Mosimann", "Käch", "Sager"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "f", "f"))
    assert(c.clerks == Seq(Person("Kudelski", Some("f"))))
  }

  // test_utils.py:62 (header 2)
  val zhSvg2 = join("BV.2008.00114", "Sozialversicherungsgericht", "des Kantons Zürich",
    "III. Kammer", "Sozialversicherungsrichterin Heine, Vorsitzende",
    "Sozialversicherungsrichterin Annaheim", "Sozialversicherungsrichterin Daubenmeyer",
    "Gerichtssekretär O. Peter", "Urteil vom 30. Juni 2010", "in Sachen", "X._")

  test("ZH_Sozialversicherungsgericht header 2 (test_utils.py:217-226)") {
    val c = parseComposition(zhSvg2)
    assert(c.president == Some(Person("Heine", Some("f"))))
    assert(c.judges.map(_.name) == Seq("Heine", "Annaheim", "Daubenmeyer"))
    assert(c.judges.flatMap(_.gender) == Seq("f", "f", "f"))
    assert(c.clerks == Seq(Person("O. Peter", Some("m"))))
  }

  // test_utils.py:64 (header 3 — composition crammed into one line)
  val zhSvg3 = join("Sozialversicherungsgerichtdes Kantons Zürich",
    "IV.2017.00330 IV. Kammer Sozialversicherungsrichter Hurst, Vorsitzender Sozialversicherungsrichterin Philipp Sozialversicherungsrichter Vogel Gerichtsschreiberin Curiger Urteil vom 7. August 2018",
    "in Sachen", "X._")

  test("ZH_Sozialversicherungsgericht header 3 (test_utils.py:228-236)") {
    val c = parseComposition(zhSvg3)
    assert(c.president == Some(Person("Hurst", Some("m"))))
    assert(c.judges.map(_.name) == Seq("Hurst", "Philipp", "Vogel"))
    assert(c.judges.flatMap(_.gender) == Seq("m", "f", "m"))
    assert(c.clerks == Seq(Person("Curiger", Some("f"))))
  }
}
