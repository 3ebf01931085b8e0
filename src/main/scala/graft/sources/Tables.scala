package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the driver-generated synthetic tables (TESTDATA.md).
  *
  * Mirrors the reference's fixed table-catalog role
  * (`database_creation/drop_and_create_tables.sql`): a set of named
  * Parquet tables loaded by name. At 100 TB these become
  * partitioned/bucketed Parquet directories; since the reads below are
  * plain `spark.read.parquet`, partition pruning and filter/column
  * pushdown apply unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` has been generated under two encodings across driver
    * runs: parquet TIMESTAMP(NANOS) — which Spark's vectorized reader
    * rejects, so we read it as epoch-nanos Long via the legacy flag —
    * and plain TIMESTAMP_NTZ at microsecond precision. We branch on the
    * schema Spark actually reads and normalize both to the same three
    * columns: `ts_ns` (epoch nanos, Long), `ts_us` (epoch micros,
    * Long), `ts` (microsecond timestamp). DuckDB oracles using
    * `epoch_ns(ts)` agree with either path (µs×1000 is exact and stays
    * well under 2^63 until year 2262).
    * The legacy flag is a runtime SQL conf, so setting it here also
    * covers a driver-created session (`SparkEntry.entry`).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The NTZ→instant cast below uses the session timezone; pin it so
      // ts_us/ts_ns are the same epoch values DuckDB's epoch_ns computes
      // regardless of which entrypoint built the session.
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // legacy TIMESTAMP(NANOS) read back as epoch-nanos Long
          raw.withColumn("ts_ns", col("ts").cast("long"))
            // integer division BEFORE any widening: 1.7e18 exceeds 2^53,
            // a double round-trip would corrupt the low bits.
            .withColumn("ts_us", expr("ts_ns div 1000"))
            .withColumn("ts", expr("timestamp_micros(ts_us)"))
        case _ =>
          // TIMESTAMP / TIMESTAMP_NTZ at microsecond precision
          raw.withColumn("ts_us", expr("unix_micros(cast(ts as timestamp))"))
            .withColumn("ts_ns", expr("ts_us * 1000L"))
            .withColumn("ts", expr("timestamp_micros(ts_us)"))
      }
    } else if (name == "documents") {
      // schema-normalizing read (the events precedent): the shipped
      // table carries n_chars ≡ length(text) as a derived column;
      // landings that omit it (re-exports, the sf1 replication probe)
      // get it derived so every consumer sees one schema
      val raw = spark.read.parquet(s"$dir/documents.parquet")
      if (raw.columns.contains("n_chars")) raw
      else raw.withColumn("n_chars", length(col("text")).cast("long"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
