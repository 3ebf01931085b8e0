package graft.analyses

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality constraint validation (the Deequ-shaped ingest guard a
  * 100 TB pipeline runs before publishing a table): each table's
  * constraints — null checks, range checks, key uniqueness — are FUSED
  * INTO ONE AGGREGATION PASS (a naive per-constraint loop scans the
  * table once per check; at corpus scale that multiplies the dominant
  * cost by the constraint count). Referential checks are the one
  * exception — each needs its own anti-join probe, which stays a
  * broadcast/semi shape on the dimension side.
  *
  * Output is one row per constraint: (check, violations, ok) — exact
  * integers, so the whole report is engine-restatable.
  *
  * Reference shape: the coverage/verification reports
  * (`verification report`, per-extractor % logging) generalized into
  * machine-checkable constraints.
  */
object QualityChecks {

  /** A named violation counter — an aggregate Column over the table. */
  final case class Check(name: String, violations: Column)

  def notNull(c: String): Check =
    Check(s"$c not_null", sum(when(col(c).isNull, 1L).otherwise(0L)))

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"$c in_range[$lo,$hi]",
      sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)))

  /** count − countDistinct: NULL keys count as violations
    * (countDistinct ignores them), matching the intuition that a null
    * key is not a unique identifier.
    */
  def unique(cols: Seq[String]): Check =
    Check(s"${cols.mkString("+")} unique",
      count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*))

  def matches(c: String, pattern: String): Check =
    Check(s"$c matches", sum(when(col(c).rlike(pattern), 0L).otherwise(1L)))

  /** All `checks` over `df` in ONE aggregation, melted to
    * (check, violations, ok) rows.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val agg = df.agg(checks.head.violations.as("c0"),
      checks.tail.zipWithIndex.map { case (ch, i) =>
        ch.violations.as(s"c${i + 1}") }: _*)
    val stacked = checks.zipWithIndex
      .map { case (ch, i) => s"'${ch.name.replace("'", "''")}', c$i" }
      .mkString(", ")
    agg.selectExpr(
        s"stack(${checks.size}, $stacked) AS (check, violations)")
      .withColumn("violations", coalesce(col("violations"), lit(0L)))
      .withColumn("ok", col("violations") === 0L)
  }

  /** Referential-integrity probe: rows of `fact` whose `factKey` has no
    * match in `dim.dimKey` (one anti-join; dim side broadcast-eligible).
    */
  def refCheck(name: String, fact: DataFrame, factKey: String,
               dim: DataFrame, dimKey: String): DataFrame =
    fact.join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("check"), col("violations"),
        (col("violations") === 0L).as("ok"))
}
