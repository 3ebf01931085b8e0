package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import EventStreams._

class EventStreamsSpec extends SparkSpec {

  // Base offset keeps event times away from epoch 0: the initial
  // watermark is 0 and the late-row filter drops ts <= 0 rows.
  private val baseMin = 1002000L  // divisible by 60: windows stay hour-aligned
  private def ts(minutes: Long): Timestamp = new Timestamp((baseMin + minutes) * 60000L)
  private def us(minutes: Long): Long = (baseMin + minutes) * 60000000L

  test("tumbling window counts match the batch computation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val events = Seq(
      Event(1, ts(5), 1, "click", 1.0),
      Event(2, ts(20), 1, "click", 2.0),
      Event(3, ts(65), 2, "view", 3.0),
      Event(4, ts(70), 2, "click", 4.0))
    mem.addData(events: _*)

    val q = tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("tumbling")
        .select("window_start", "event_type", "n_events")
        .collect().map(r => (r.getTimestamp(0).getTime / 60000 - baseMin,
          r.getString(1), r.getLong(2)))
        .toSet
      assert(got == Set((0L, "click", 2L), (60L, "view", 1L), (60L, "click", 1L)))
    } finally q.stop()
  }

  test("sliding windows assign each event to 4 windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(Event(1, ts(32), 1, "click", 1.0))
    val q = slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val starts = spark.table("sliding")
        .collect().map(_.getTimestamp(0).getTime / 60000 - baseMin).toSet
      // event at minute 32 → 1h windows starting at -15, 0, 15, 30
      assert(starts == Set(-15L, 0L, 15L, 30L))
    } finally q.stop()
  }

  test("sessionization emits a closed session after the gap passes") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // session: 3 events within the 30-min gap
      mem.addData(
        Event(1, ts(0), 7, "view", 1.0),
        Event(2, ts(10), 7, "click", 1.0),
        Event(3, ts(20), 7, "purchase", 1.0))
      q.processAllAvailable()
      // a much later event pushes the watermark past the session end;
      // the first session must close with exactly 3 events
      mem.addData(Event(9, ts(600), 7, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Event(10, ts(1200), 7, "view", 1.0))
      q.processAllAvailable()

      val closed = spark.table("sessions").where(col("closed"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(closed.exists { case (uid, n, start) =>
        uid == 7L && n == 3L && start == us(0)
      }, s"expected the 3-event session to close, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("streaming dedup drops redundant deliveries within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = dedupEvents(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(1, ts(1), 1, "click", 1.0), // redelivery, same id
        Event(2, ts(2), 1, "view", 2.0))
      q.processAllAvailable()
      mem.addData(Event(1, ts(5), 1, "click", 1.0)) // late redelivery
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming near-dup dedup drops identical-fingerprint documents") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Long)]
    val docs = mem.toDF().toDF("doc_ts", "text", "doc_id")
    val q = dedupDocs(docs)
      .writeStream.format("memory").queryName("docdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (ts(0), "das gericht weist die beschwerde ab und schliesst den fall", 1L),
        // re-crawl: identical text, later timestamp → same simhash, dropped
        (ts(1), "das gericht weist die beschwerde ab und schliesst den fall", 2L),
        // genuinely different document survives
        (ts(2), "der rekurrent obsiegt vollumfaenglich mit seinen antraegen heute", 3L))
      q.processAllAvailable()
      val kept = spark.table("docdedup").select("doc_id")
        .collect().map(_.getLong(0)).toSeq.sorted
      assert(kept == Seq(1L, 3L))
    } finally q.stop()
  }

  // ---- streaming ↔ batch equivalence: the streaming operators over
  // the REAL events table must reproduce the gated batch duals
  // (e1/e5/e2/e7) exactly — same input rows via MemoryStream, two far-
  // future flush events advance the watermark so every real window and
  // session closes, flush artifacts filtered by key/time.

  private def tsFromUs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(((us % 1000000L) * 1000L).toInt)
    t
  }

  private def realEvents(): (Seq[Event], Long) = {
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select("event_id", "ts_us", "user_id", "event_type", "value").collect()
    val events = rows.map(r => Event(r.getLong(0), tsFromUs(r.getLong(1)),
      r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
    (events, rows.map(_.getLong(1)).max)
  }

  test("streaming tumbling counts equal the e1 batch dual on the real table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (events, maxUs) = realEvents()
    val mem = MemoryStream[Event]
    val q = tumblingCounts(mem.toDF())
      .writeStream.format("memory").queryName("eq_tumbling")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(Event(-1, tsFromUs(maxUs + 36L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      mem.addData(Event(-2, tsFromUs(maxUs + 72L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      // regroup the (window, event_type) streaming rows to e1's
      // per-window shape; decimal partial sums re-add exactly
      val got = spark.table("eq_tumbling")
        .groupBy(unix_micros(col("window_start")).as("window_start_us"))
        .agg(sum("n_events").as("n_events"),
          sum("sum_value").cast("double").as("sum_value"))
        .where(col("window_start_us") <= maxUs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = graft.SparkEntry.queries("e1_tumbling_window")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming sliding counts equal the e5 batch dual on the real table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (events, maxUs) = realEvents()
    val mem = MemoryStream[Event]
    val q = slidingCounts(mem.toDF())
      .writeStream.format("memory").queryName("eq_sliding")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(Event(-1, tsFromUs(maxUs + 36L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      mem.addData(Event(-2, tsFromUs(maxUs + 72L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("eq_sliding")
        .select(unix_micros(col("window_start")).as("ws"), col("n_events"))
        .where(col("ws") <= maxUs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = graft.SparkEntry.queries("e5_sliding_window")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want)
    } finally q.stop()
  }

  test("streaming sessionization equals the e2 and e7 batch duals on the real table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (events, maxUs) = realEvents()
    val mem = MemoryStream[Event]
    val q = sessionize(mem.toDS())
      .writeStream.format("memory").queryName("eq_sessions")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // first flush closes every real session via timeout; second
      // advances the watermark past the first flush's own session
      mem.addData(Event(-1, tsFromUs(maxUs + 36L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      mem.addData(Event(-2, tsFromUs(maxUs + 72L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      val closed = spark.table("eq_sessions")
        .where(col("closed") && col("user_id") >= 0)
        .collect()
      val gotE2 = closed.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3) - r.getLong(2))).toSet
      val wantE2 = graft.SparkEntry.queries("e2_sessionize")(spark, sfDir)
        .select("user_id", "n_events", "start_us", "dur_us")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(gotE2 == wantE2, "streaming sessions != e2 batch sessions")

      val gotE7 = closed.map(r => (r.getLong(0), r.getLong(2), r.getLong(1))).toSet
      val wantE7 = graft.SparkEntry.queries("e7_session_window")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(gotE7 == wantE7, "streaming sessions != e7 session_window")
    } finally q.stop()
  }

  test("stream-stream interval join equals the e8 batch dual on the real table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (events, maxUs) = realEvents()
    val mem = MemoryStream[Event]
    val q = clickToPurchase(mem.toDF())
      .writeStream.format("memory").queryName("eq_attrib")
      .outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      mem.addData(Event(-1, tsFromUs(maxUs + 36L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      mem.addData(Event(-2, tsFromUs(maxUs + 72L * 3600000000L), -1L, "flush", 0.0))
      q.processAllAvailable()
      val got = spark.table("eq_attrib")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = graft.SparkEntry.queries("e8_click_attribution")(spark, sfDir)
        .select("click_id", "purchase_id", "user_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
      assert(want.nonEmpty, "fixture should contain click->purchase pairs")
    } finally q.stop()
  }

  test("file-source stream over the real events table produces batches") {
    // file streams need a landing DIRECTORY (each micro-batch = new
    // files); stage the single testdata file into one
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("part-000.parquet"))
    val stream = readEventStream(spark, dir.toString)
    assert(stream.isStreaming)
    val q = stream.groupBy("event_type").count()
      .writeStream.format("memory").queryName("filesrc")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val counts = spark.table("filesrc").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum > 0)
      assert(counts.keySet.contains("click"))
    } finally q.stop()
  }
}
