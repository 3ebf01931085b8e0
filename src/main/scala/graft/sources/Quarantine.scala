package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The UNIFIED quarantine channel (SURVEY §2.9's error channel — the
  * reference logs-and-skips failed rows, `abstract_extractor.py:177-183`;
  * here failures become data). One envelope shape across every tier
  * that can reject a row — PDF (m5), media (m7), extractors (x15/x20) —
  * instead of three ad-hoc conventions (null text / quarantined flag /
  * per-UDF error struct):
  *
  *   struct<result: T, error: string>   — error IS NULL ⟺ clean
  *
  * The result type stays tier-specific (extracted text, decoded meta,
  * outcome array); the ENVELOPE and the sink are shared. Routing is one
  * null-check filter per side, so both channels stay in the same scan
  * (no second pass over the payload bytes), and the quarantine sink
  * appends the normalized (tier, doc_id, error) rows all tiers share —
  * the operational table a 100 TB ingest watches for decode-failure
  * spikes. Gated x39; each tier's own gate stays green on top of the
  * envelope.
  */
object Quarantine {

  /** Wrap a tier's result and error columns into the canonical
    * envelope. `error` must be null exactly when the row is clean.
    */
  def envelope(result: Column, error: Column): Column =
    struct(result.as("result"), error.as("error"))

  /** Convenience for tiers whose only failure signal is a null result
    * (the PDF tier): a null result becomes a quarantined envelope with
    * the given reason.
    */
  def envelopeNullable(result: Column, reason: String): Column =
    envelope(result, when(result.isNull, lit(reason)))

  /** Split on the envelope's error: (clean rows, quarantined rows). */
  def split(df: DataFrame, envelopeCol: String): (DataFrame, DataFrame) =
    (df.where(col(s"$envelopeCol.error").isNull),
      df.where(col(s"$envelopeCol.error").isNotNull))

  /** The normalized quarantine rows of a frame: (tier, doc_id, error).
    * This is the one shape the shared sink stores for every tier.
    */
  def quarantinedRows(df: DataFrame, envelopeCol: String, tier: String,
                      idCol: String): DataFrame =
    split(df, envelopeCol)._2
      .select(lit(tier).as("tier"), col(idCol).cast("long").as("doc_id"),
        col(s"$envelopeCol.error").as("error"))

  /** Shared quarantine sink: append a tier's quarantined rows to the
    * common table. Append-only and partition-parallel; at scale the
    * path gets the same [[Sinks.compact]] treatment as any other
    * append-accumulating table.
    */
  def appendQuarantined(df: DataFrame, envelopeCol: String, tier: String,
                        idCol: String, path: String): Unit =
    quarantinedRows(df, envelopeCol, tier, idCol)
      .write.mode(SaveMode.Append).parquet(path)
}
