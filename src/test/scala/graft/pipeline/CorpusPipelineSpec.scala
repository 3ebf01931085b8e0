package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CorpusPipelineSpec extends SparkSpec {

  private def makeLanding(): String = {
    val dir = Files.createTempDirectory("landing")
    def put(name: String, content: String) =
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    def ruling(i: Int, outcome: String) =
      s"""<html><body>
         |<p>Urteil vom 1$i. August 2020</p>
         |<p>Besetzung: Bundesrichter Meier, Präsident, Gerichtsschreiber S$i</p>
         |<p>Sachverhalt</p>
         |<p>A. Der Beschwerdeführer $i reichte Klage ein.</p>
         |<p>Erwägungen</p>
         |<p>1. Vgl. BGE 12$i II 45 zur Frage.</p>
         |<p>Demnach erkennt das Gericht</p>
         |<p>Die Beschwerde wird $outcome.</p>
         |<p>Rechtsmittelbelehrung</p>
         |</body></html>""".stripMargin
    for (i <- 0 until 4) {
      put(s"case_$i.json", s"""{"id": $i}""")
      put(s"case_$i.html",
        ruling(i, if (i % 2 == 0) "abgewiesen" else "gutgeheissen"))
    }
    // pdf-only document (html missing → falls back to pdf payload):
    // pre-extracted text landing file
    put("case_pdf.json", """{"id": 9}""")
    put("case_pdf.pdf", "Sachverhalt\nKurzer PDF Text der lang genug ist fuer das Minimum.")
    // REAL pdf bytes — the native extractor (S3) must decode in-pipeline
    put("case_realpdf.json", """{"id": 11}""")
    Files.write(dir.resolve("case_realpdf.pdf"), graft.sources.PdfText.synthesize(
      "Sachverhalt des echten PDF Urteils mit ausreichender Laenge fuer das Minimum.",
      flate = true))
    // too-short document → dropped by the ingest gate
    put("tiny.json", """{"id": 10}""")
    put("tiny.html", "<html><body>x</body></html>")
    dir.toString
  }

  test("end-to-end corpus construction: ingest→sections→children→idempotent writes") {
    val landing = makeLanding()
    val out = Files.createTempDirectory("corpus_out").toString
    val report = CorpusPipeline.run(spark, landing, out)

    assert(report.nIngested == 6)       // 4 html + 2 pdf; tiny dropped
    assert(report.nSkipped == 1)        // the too-short doc, surfaced not silent
    assert(report.nSections == 6)
    assert(report.nCitations == 4)      // the 4 structured rulings cite once
    assert(report.judgmentCoverage == 4.0 / 6) // pdf docs have no rulings section

    // the real-PDF document decoded through the native extractor and
    // the language identifier tagged the German prose
    val docs = spark.read.parquet(s"$out/documents")
    assert(docs.where(col("text").contains("echten PDF Urteils")).count() == 1)
    assert(docs.where(col("lang") === "de").count() >= 5)

    // htmlToText stripped the markup before sectioning
    val sections = spark.read.parquet(s"$out/sections")
    assert(sections.where(col("rulings").contains("<p>")).count() == 0)
    val dismissed = sections.where(col("rulings").contains("abgewiesen"))
    assert(dismissed.count() == 2)

    // judgments extracted per decision
    val j = spark.read.parquet(s"$out/judgments")
    assert(j.where(array_contains(col("outcomes"), "approval")).count() == 2)
    assert(j.where(array_contains(col("outcomes"), "dismissal")).count() == 2)

    // composition parsed from the header section
    val comp = spark.read.parquet(s"$out/compositions")
    assert(comp.where(col("president.name") === "Meier").count() == 4)

    // idempotency: a full re-run leaves identical row counts
    val again = CorpusPipeline.run(spark, landing, out)
    assert(again.nIngested == report.nIngested)
    assert(spark.read.parquet(s"$out/documents").count() == 6)
    assert(spark.read.parquet(s"$out/citations").count() == 4)
  }
  test("CH_BGer run populates participation and lower-court child tables") {
    val dir = Files.createTempDirectory("landing_bger")
    def put(name: String, content: String) =
      Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    def doc(i: Int) = Seq(
      "Urteil des Bundesgerichts",
      s"Besetzung Bundesrichter Meier, Präsident, Gerichtsschreiber S$i",
      "Verfahrensbeteiligte A._, Beschwerdeführer, vertreten durch Rechtsanwalt Dr. Hans Muster, gegen, B._ AG, Beschwerdegegnerin",
      "Gegenstand Beschwerde gegen das Urteil des Obergerichts des Kantons Zürich, II. Zivilkammer, vom 12. März 2019 (LB180001).",
      "Sachverhalt:",
      s"Am ${i + 1}. Januar 2020 erhob die Partei Beschwerde gegen den Entscheid.",
      "Erwägungen:",
      s"Vgl. BGE ${120 + i} II 31.",
      "Demnach erkennt das Bundesgericht",
      "Die Beschwerde wird abgewiesen.")
      .map(pp => s"<p>$pp</p>").mkString("<html><body>", "", "</body></html>")
    for (i <- 0 until 3) {
      put(s"bger_$i.json", s"""{"id": $i}""")
      put(s"bger_$i.html", doc(i))
    }
    val out = Files.createTempDirectory("corpus_bger_out").toString
    val report = CorpusPipeline.run(spark, dir.toString, out, spider = "CH_BGer")
    assert(report.nIngested == 3)

    // F38 through the pipeline: spider-dispatched participation
    val part = spark.read.parquet(s"$out/participations")
    assert(part.count() == 3)
    val p0 = part.selectExpr("plaintiffs[0].name", "plaintiffs[0].gender",
      "plaintiffs[0].counsel[0].name", "defendants[0].name").collect()
    assert(p0.forall(_.getString(0) == "A._"))
    assert(p0.forall(_.getString(1) == "m"))
    assert(p0.forall(_.getString(2) == " Dr. Hans Muster")) // CH_BGer keeps raw match
    assert(p0.forall(_.getString(3) == "B._ AG"))

    // F39 through the pipeline: lower court resolved from header+topic
    val lc = spark.read.parquet(s"$out/lower_courts")
    assert(lc.where(col("court") === "ZH_OG").count() == 3)
    assert(lc.where(col("file_number") === "LB180001").count() == 3)
    assert(lc.where(col("date") === "2019-03-12").count() == 3)

    // F36/F37 through the pipeline: the people table carries the
    // parsed president with role-context gender
    val people = spark.read.parquet(s"$out/people")
    assert(people.where(col("role") === "president")
      .where(col("name") === "Meier").where(col("gender") === "m").count() == 3)
  }
}
