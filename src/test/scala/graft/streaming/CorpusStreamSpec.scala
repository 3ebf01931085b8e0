package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming corpus construction: two landing waves through one
  * continuous query — the second microbatch must process ONLY the new
  * files, re-delivered stems must stay idempotent, and the child
  * tables must match what the batch pipeline produces for the same
  * corpus (streaming↔batch equivalence, the EventStreamsSpec
  * discipline applied to §3.1).
  */
class CorpusStreamSpec extends SparkSpec {

  private def doc(i: Int): String = Seq(
    "Urteil des Bundesgerichts",
    "Verfahrensbeteiligte A._, Beschwerdeführer, vertreten durch Rechtsanwalt Dr. Hans Muster, gegen, B._ AG, Beschwerdegegnerin",
    "Gegenstand Beschwerde gegen das Urteil des Obergerichts des Kantons Zürich, II. Zivilkammer, vom 12. März 2019 (LB180001).",
    "Sachverhalt:",
    s"Am ${i + 1}. Januar 2020 erhob die Partei Beschwerde gegen den Entscheid.",
    "Erwägungen:",
    s"Vgl. BGE ${120 + i} II 31.",
    "Demnach erkennt das Bundesgericht",
    "Die Beschwerde wird abgewiesen.")
    .map(p => s"<p>$p</p>").mkString("<html><body>", "", "</body></html>")

  test("two waves stream through the pipeline; re-delivery stays idempotent") {
    val landing = Files.createTempDirectory("stream_landing")
    val out = Files.createTempDirectory("stream_out").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    def land(i: Int): Unit = {
      Files.write(landing.resolve(s"sd$i.json"),
        s"""{"id": $i}""".getBytes(StandardCharsets.UTF_8))
      Files.write(landing.resolve(s"sd$i.html"),
        doc(i).getBytes(StandardCharsets.UTF_8))
    }
    // wave 1
    (0 until 3).foreach(land)
    val q = CorpusStream.run(spark, landing.toString, out, "CH_BGer", ckpt)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/documents").count() == 3)

      // wave 2: two new docs land while the query runs
      (3 until 5).foreach(land)
      q.processAllAvailable()

      val docs = spark.read.parquet(s"$out/documents")
      assert(docs.count() == 5)
      assert(docs.select("stem").distinct().count() == 5)

      // child tables populated for every wave, incl. the F38/F39 stages
      assert(spark.read.parquet(s"$out/participations")
        .where(expr("plaintiffs[0].name = 'A._'")).count() == 5)
      assert(spark.read.parquet(s"$out/lower_courts")
        .where(col("court") === "ZH_OG").count() == 5)
      val cites = spark.read.parquet(s"$out/citations")
      assert(cites.count() == 5)
      assert(cites.agg(min("volume")).collect()(0).getInt(0) == 120)

      // streaming result equals the BATCH pipeline over the same corpus
      val batchOut = Files.createTempDirectory("stream_batch_out").toString
      graft.pipeline.CorpusPipeline.run(spark, landing.toString, batchOut, "CH_BGer")
      val streamed = spark.read.parquet(s"$out/judgments")
        .select("decision_id", "outcomes")
      val batch = spark.read.parquet(s"$batchOut/judgments")
        .select("decision_id", "outcomes")
      assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    } finally q.stop()
  }
}
