package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming layer over the events schema.
  *
  * The reference is incremental batch (SURVEY §2.10): progress files +
  * delete-then-insert idempotency (`scrc/preprocessors/
  * abstract_preprocessor.py:122-140`). Because every stage there is
  * idempotent-by-key, the streaming drop-in is exactly these operators:
  * a file/Kafka source feeding the same windowed aggregations, with
  * watermarks bounding state instead of progress files bounding rework.
  *
  * Scale notes: all operators here are keyed state — state size is
  * O(open windows + active sessions), bounded by the watermark; a
  * 1000-executor cluster partitions state by (key) via the normal
  * shuffle, and RocksDB state store handles spill.
  */
object EventStreams {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionUpdate(user_id: Long, n_events: Long, start_us: Long,
                           end_us: Long, closed: Boolean)

  case class SessState(nEvents: Long, startUs: Long, endUs: Long)

  /** Exact epoch-micros of a Timestamp — getTime() alone truncates to
    * milliseconds, which would let streaming session bounds drift from
    * the micros-exact batch duals (the equivalence spec pins this).
    */
  private def epochMicros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Tumbling 1-hour window counts/sums with a 2-hour watermark —
    * streaming dual of EventQueries.e1_tumbling_window.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("decimal(28,6)").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windows: 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("n_events"))

  /** Gap-based sessionization with explicit keyed state — streaming dual
    * of EventQueries.e2_sessionize (30-minute inactivity gap). Uses
    * flatMapGroupsWithState so a closed session is emitted exactly once.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionUpdate(userId, s.nEvents, s.startUs, s.endUs, closed = true))
          } else {
            val sorted = rows.toSeq.sortBy(e => (epochMicros(e.ts), e.event_id))
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionUpdate]
            for (e <- sorted) {
              val tUs = epochMicros(e.ts)
              cur match {
                case Some(s) if tUs - s.endUs <= gapUs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1, endUs = tUs))
                case Some(s) =>
                  closed += SessionUpdate(userId, s.nEvents, s.startUs, s.endUs, closed = true)
                  cur = Some(SessState(1, tUs, tUs))
                case None =>
                  cur = Some(SessState(1, tUs, tUs))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endUs / 1000L + gapMinutes * 60L * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop redundant deliveries of the same
    * event_id within the watermark horizon (the training-pipeline
    * at-least-once ingest → exactly-once table pattern; state is
    * bounded by the watermark).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup dedup: documents fingerprinted with simhash64
    * (graft.functions.TextFunctions — per-row, stateless, zero
    * shuffle), then first-wins within the watermark horizon on the
    * fingerprint. Catches the boilerplate-duplicate class (identical
    * simhash) in-flight, so exact copies and near-identical
    * re-crawls never land in the corpus; full banded MinHash dedup
    * remains the batch compaction pass (dedupKeepList) — the standard
    * two-tier streaming/batch dedup split. State is bounded by the
    * watermark. Input needs (doc_ts timestamp, text string).
    */
  def dedupDocs(docs: DataFrame,
                fingerprint: org.apache.spark.sql.Column = null): DataFrame = {
    val sim = udf { t: String =>
      graft.functions.TextFunctions.simhash64(
        if (t == null) Seq.empty else t.split("\\s+").toSeq) }
    val fp = Option(fingerprint).getOrElse(sim(col("text")))
    docs
      .withColumn("fp", fp)
      .withWatermark("doc_ts", "2 hours")
      .dropDuplicatesWithinWatermark("fp")
  }

  /** Stream-stream INTERVAL join: each click joined to the same user's
    * purchases within the following hour — Spark's watermarked
    * stream-stream join (state on both sides, bounded by the watermark
    * + the join's time-range condition; the attribution-join shape of
    * a training-data event pipeline). Batch dual: e8_click_attribution.
    */
  def clickToPurchase(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 1 hour"))
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
  }

  /** LEFT OUTER stream-stream interval join — the attribution join
    * with unconverted clicks kept: matches emit on arrival (the inner
    * path), and a click with NO purchase in its following hour emits
    * null-padded exactly once, when the watermark proves no future
    * match can exist and the state row evicts. Flush rows must reach
    * BOTH legs' watermark nodes (a leg's watermark only advances on
    * rows that survive its filter), so each leg admits event_type
    * 'flush' alongside its own type; flush rows carry user_id −1 and
    * the caller filters them from the output.
    */
  def clickToPurchaseOuter(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type").isin("click", "flush"))
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type").isin("purchase", "flush"))
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 1 hour"),
      "leftOuter")
      .select(col("click_id"), col("purchase_id"), col("c_user").as("user_id"))
  }

  /** FULL OUTER stream-stream interval join — completes the outer-join
    * family (e12 inner, e28 left): unmatched CLICKS null-pad on the
    * right and unmatched PURCHASES null-pad on the left, each emitted
    * exactly once when the watermark proves no future match and its
    * state evicts (the e27/e11 eviction-flush protocol drives the tail
    * out). Same leg/watermark/flush discipline as [[clickToPurchaseOuter]];
    * user_id coalesces across sides because a right-unmatched row has
    * no click leg to carry it.
    */
  def clickToPurchaseFull(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type").isin("click", "flush"))
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.where(col("event_type").isin("purchase", "flush"))
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    clicks.join(purchases,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr("interval 1 hour"),
      "fullOuter")
      .select(col("click_id"), col("purchase_id"),
        coalesce(col("c_user"), col("p_user")).as("user_id"))
  }

  /** File-source reader for a directory of event parquet files — the
    * production ingest shape (each micro-batch = newly landed files).
    * Same two-encoding policy as `sources.Tables`: legacy
    * TIMESTAMP(NANOS) read as epoch-nanos longs (Spark's vectorized
    * reader rejects NANOS), or plain µs TIMESTAMP/TIMESTAMP_NTZ.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_ns", col("ts").cast("long"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        raw.withColumn("ts_ns", expr("unix_micros(cast(ts as timestamp)) * 1000L"))
          .withColumn("ts", expr("cast(ts as timestamp)"))
    }
  }
}
