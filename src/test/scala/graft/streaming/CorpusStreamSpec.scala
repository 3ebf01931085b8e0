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

  test("late payload re-triggers its stem instead of being lost") {
    val landing = Files.createTempDirectory("stream_late_landing")
    val out = Files.createTempDirectory("stream_late_out").toString
    val ckpt = Files.createTempDirectory("stream_late_ckpt").toString
    // wave 1: the meta lands ALONE — the payload is still in flight
    Files.write(landing.resolve("late0.json"),
      """{"id": 0}""".getBytes(StandardCharsets.UTF_8))
    val q = CorpusStream.run(spark, landing.toString, out, "CH_BGer", ckpt)
    try {
      q.processAllAvailable()
      // a payload-less triple fails min_chars → nothing ingested yet
      // (the sink may not even exist: an all-empty batch writes no files)
      assert(scala.util.Try(
        spark.read.parquet(s"$out/documents").count()).getOrElse(0L) == 0L)

      // wave 2: the html payload lands minutes later; its own file
      // event must re-enter the stem (a meta-driven stream would never
      // revisit it — no new .json ever lands for this stem)
      Files.write(landing.resolve("late0.html"),
        doc(0).getBytes(StandardCharsets.UTF_8))
      q.processAllAvailable()
      val docs = spark.read.parquet(s"$out/documents")
      assert(docs.count() == 1)
      assert(docs.select("stem").collect()(0).getString(0) == "late0")
      assert(spark.read.parquet(s"$out/judgments").count() == 1)
    } finally q.stop()
  }

  test("partitioned landing: only the open partition is listed and ingested") {
    val landing = Files.createTempDirectory("stream_part_landing")
    val out = Files.createTempDirectory("stream_part_out").toString
    val ckpt = Files.createTempDirectory("stream_part_ckpt").toString
    val closed = Files.createDirectory(landing.resolve("date=2026-08-12"))
    val open = Files.createDirectory(landing.resolve("date=2026-08-13"))
    def land(dir: java.nio.file.Path, name: String, i: Int): Unit = {
      Files.write(dir.resolve(s"$name.json"),
        s"""{"id": $i}""".getBytes(StandardCharsets.UTF_8))
      Files.write(dir.resolve(s"$name.html"),
        doc(i).getBytes(StandardCharsets.UTF_8))
    }
    land(closed, "old0", 0)
    land(open, "new0", 1)
    land(open, "new1", 2)
    val q = CorpusStream.run(spark, landing.toString, out, "CH_BGer", ckpt,
      openPartition = Some("date=2026-08-13"), maxFilesPerTrigger = Some(2))
    try {
      q.processAllAvailable()
      val docs = spark.read.parquet(s"$out/documents")
      // the closed partition's stem never enters a batch — the listing
      // (source AND rescan) is confined to the open partition
      assert(docs.count() == 2)
      assert(docs.select("stem").collect().map(_.getString(0)).toSet ==
        Set("new0", "new1"))
    } finally q.stop()
  }
}
