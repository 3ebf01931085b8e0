package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Extraction hot-path scale probe (VERDICT r3 item 4): the 100 TB
  * cost of this engine is the per-document scan — PDF decode, HTML
  * DOM, cleaning, the marker section sweep, judgment/citation regexes,
  * and the people parsers. Each stage runs over an N×-replicated
  * realistic document at two sizes; per-doc µs and the t(4N)/t(N)
  * ratio (ideal ≈ 4 on a warm 32-core local) make non-linear stages
  * visible. Results recorded in PERF.md.
  */
object ExtractProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val paras = Seq(
      "Urteil des Bundesgerichts",
      "Besetzung Bundesrichter Meier, Präsident, Bundesrichterin Huber, Gerichtsschreiber Keller",
      "Verfahrensbeteiligte A._, Beschwerdeführer, vertreten durch Rechtsanwalt Dr. Hans Muster, gegen B._ AG, Beschwerdegegnerin",
      "Gegenstand",
      "Sachverhalt:",
      "Am 1. Januar 2020 erhob die Partei Beschwerde gegen den angefochtenen Entscheid des Obergerichts des Kantons Zürich.",
      "Erwägungen:",
      "Die Beschwerde ist form- und fristgerecht eingereicht worden. Vgl. BGE 120 II 31 und BGE 130 IV 5. Nach Art. 42 BGG ist darauf einzutreten.",
      "Demnach erkennt das Bundesgericht",
      "Die Beschwerde wird abgewiesen.")
    val fullText = paras.mkString("\n")
    val header = paras(1) + " " + paras(2)
    val pdfBytes = graft.sources.PdfText.synthesize(fullText, Seq("FlateDecode"))
    val html = "<html><body>" + paras.map(p => s"<p>$p</p>").mkString + "</body></html>"

    val htmlParasUdf = udf { (h: String) =>
      graft.functions.TextFunctions.htmlToParagraphsUnified(h).size }
    val cleanUdf = udf { (t: String) =>
      graft.functions.TextFunctions.cleanText(t).length }
    val sectionsUdf = udf { (ps: Seq[String]) =>
      graft.extract.Extractors.splitSections("CH_BGer", "de", ps,
        graft.extract.MarkerConfigLoader.bundled).size }
    val judgmentUdf = udf { (t: String) =>
      graft.extract.Extractors.extractJudgments(t, "de").size }
    val citeUdf = udf { (t: String) =>
      graft.extract.Extractors.parseRulingCitations(t).size }
    val compUdf = udf { (h: String) =>
      graft.extract.PeopleExtractors.parseCompositionFor("ZH_Obergericht", h).judges.size }
    val wpUdf = udf { (t: String) =>
      graft.functions.WordPiece.countWithSpecials(t, graft.functions.WordPiece.bundled) }
    val partUdf = udf { (h: String) =>
      graft.extract.ParticipationExtractors
        .parseParticipationFor("CH_BGer", "de", h).map(_.plaintiffs.size).getOrElse(-1) }
    val pdfUdf = udf { (b: Array[Byte], salt: Long) =>
      val t = graft.sources.PdfText.extract(b); if (t == null) salt else t.length + salt }
    val cidTtfBytes = graft.sources.PdfText.synthesizeCidTrueType(fullText)

    def run(label: String, n: Long)(mk: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Column): Double = {
      val df = spark.range(n).toDF()
      val t0 = System.nanoTime()
      df.select(sum(mk(df))).collect()
      (System.nanoTime() - t0) / 1e9
    }

    val sizes = Seq(50000L, 200000L)
    val stages: Seq[(String, org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.Column)] = Seq(
      "pdf_decode" -> (df => pdfUdf(lit(pdfBytes), col("id"))),
      "pdf_cid_ttf" -> (_ => pdfUdf(lit(cidTtfBytes), col("id"))),
      "html_paras" -> (_ => htmlParasUdf(concat(lit(html), col("id").cast("string")))),
      "clean_text" -> (_ => cleanUdf(concat(lit(fullText), col("id").cast("string")))),
      "sections"   -> (_ => sectionsUdf(
        concat(array(paras.map(lit): _*), array(col("id").cast("string"))))),
      "judgments"  -> (_ => judgmentUdf(concat(lit(paras(9)), col("id").cast("string")))),
      "citations"  -> (_ => citeUdf(concat(lit(paras(7)), col("id").cast("string")))),
      "composition" -> (_ => compUdf(concat(lit(header), col("id").cast("string")))),
      "wordpiece"   -> (_ => wpUdf(concat(lit(fullText), col("id").cast("string")))),
      "participation" -> (_ => partUdf(concat(lit(header), col("id").cast("string")))))

    // warm codegen + classloading once
    stages.foreach { case (_, mk) => run("warm", 2000L)(mk) }
    println(f"${"stage"}%-14s ${"t(50k)"}%8s ${"t(200k)"}%8s ${"us/doc"}%8s ${"ratio"}%6s")
    for ((label, mk) <- stages) {
      val ts = sizes.map(n => run(label, n)(mk))
      val usPerDoc = ts.last / sizes.last * 1e6
      val ratio = ts.last / ts.head
      println(f"$label%-14s ${ts.head}%8.2f ${ts.last}%8.2f $usPerDoc%8.1f $ratio%6.2f")
    }
    spark.stop()
  }
}
