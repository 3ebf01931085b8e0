package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized interval (band) join: `points ⋈ intervals` on
  * `equiKeys ∧ lo ≤ pt ≤ hi`, without a broadcast-nested-loop or a
  * cartesian per equi-key group.
  *
  * The naive plan for a range predicate is BNLJ (quadratic per key
  * group — a hot user with 10k events pays 10⁸ comparisons). Instead,
  * the ordinal axis is tiled into fixed-width buckets:
  *
  *  - each POINT lands in exactly one bucket (`floor(pt / width)`)
  *  - each INTERVAL is exploded to the buckets it overlaps
  *    (`floor(lo / width) .. floor(hi / width)`)
  *  - the join becomes a plain hash equi-join on (equiKeys…, bucket)
  *    with the exact range predicate left as a residual filter
  *
  * Shuffle volume is |points| + Σ(interval_width / width + 1) rows —
  * choosing `width` on the order of the typical interval length keeps
  * the explode factor ~2. No distinct is needed: a (point, interval)
  * pair can only meet in the point's single bucket. This is the
  * standard range-join optimization (cf. Databricks' range-join hint,
  * DuckDB's IEJoin alternative) expressed with stock Spark operators,
  * so AQE skew-split still applies to the one shuffle.
  *
  * Reference shape: "events within a window of a ruling's date"
  * (time-window lookups in the composition/citation extractors) —
  * generalized to any integral ordinal (epoch nanos/micros/days).
  * Intervals are inclusive on both ends.
  *
  * WHEN TO USE (probe-measured, tools/RangeJoinProbe):
  *  - NO equi key (`equiKeys = Seq.empty`): Spark has nothing to hash
  *    on and plans BroadcastNestedLoopJoin — |P|·|I| comparisons. The
  *    bucket column MANUFACTURES the equi key: flat ~0.4 s across a
  *    50× point scale-up where BNLJ grows linearly in |P|·|I|
  *    (~100× at 5M points × 2k intervals).
  *  - HOT equi keys: SMJ evaluates the per-key-group cross product in
  *    ONE task (quadratic, unsplittable — AQE can't divide a single
  *    key group); the bucket sub-key splits the group by ordinal range.
  *  - Selective equi key with BOUNDED groups: prefer the plain
  *    equi-join with the range as a residual condition — Spark's SMJ
  *    handles it well and the bucket explode only adds overhead.
  *
  * Bucketing uses EXACT integer floor division: epoch nanos exceed
  * 2^53, so a double-division `floor(x / w)` can misbucket a point
  * near a boundary (double rounds the dividend by up to ~256 ns) —
  * spurious candidates would be caught by the residual filter, but a
  * MISSED bucket is a silently dropped match.
  */
object RangeJoin {

  /** SQL snippet: floor division of (long) column expression `x` by
    * positive literal `w` — `div` truncates toward zero, so negatives
    * are shifted to make truncation agree with floor (keeps buckets
    * contiguous across 0).
    */
  private def fdiv(x: String, w: Long): String =
    s"(CASE WHEN ($x) >= 0 THEN ($x) div ${w}L " +
      s"ELSE -(((-($x)) + ${w - 1}L) div ${w}L) END)"

  /** Join `points` to every interval row whose `[loCol, hiCol]` contains
    * `ptCol`, matching `equiKeys` exactly. Column names across the two
    * sides must be disjoint apart from `equiKeys` (standard join-key
    * hygiene; rename upstream).
    *
    * @param width bucket width on the ordinal axis, > 0; pick ≈ the
    *              typical interval length (explode factor ≈ 2).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      equiKeys: Seq[String], ptCol: String,
                      loCol: String, hiCol: String,
                      width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val p = points.withColumn("__bkt",
      expr(fdiv(s"CAST($ptCol AS BIGINT)", width)))
    val iv = intervals.withColumn("__bkt",
      explode(expr(
        s"sequence(${fdiv(s"CAST($loCol AS BIGINT)", width)}, " +
          s"${fdiv(s"CAST($hiCol AS BIGINT)", width)})")))
    p.join(iv, equiKeys :+ "__bkt")
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bkt")
  }

  /** Band join: right rows carry an ordinal `centerCol`; matches where
    * `center - before ≤ pt ≤ center + after`. Convenience wrapper that
    * derives the interval bounds; bucket width = the band span.
    */
  def bandJoin(points: DataFrame, centers: DataFrame,
               equiKeys: Seq[String], ptCol: String, centerCol: String,
               before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0, "band widths must be non-negative")
    val iv = centers
      .withColumn("__lo", col(centerCol).cast("long") - before)
      .withColumn("__hi", col(centerCol).cast("long") + after)
    pointInInterval(points, iv, equiKeys, ptCol, "__lo", "__hi",
        width = math.max(1L, before + after))
      .drop("__lo", "__hi")
  }
}
