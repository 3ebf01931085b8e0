package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single latest right row with
  * `right.ord <= left.ord` within the same key group.
  *
  * The reference's only non-equi join is this shape — nearest ruling
  * page ≤ cited page within (year, volume)
  * (`scrc/dataset_creation/dataset_creator.py:262-285`). A naive
  * translation (equi-join on keys + range filter + row_number) explodes
  * into all matching pairs before pruning; at 100 TB that intermediate
  * dominates the job.
  *
  * This implementation uses the union-sort rewrite instead: tag both
  * sides, union, and run one `last(..., ignoreNulls)` window over
  * (key, ord). Cost = a single shuffle of |L|+|R| rows on the key — no
  * pairwise blowup, and skew handling falls out of AQE on the one
  * shuffle. This is the standard engine technique (e.g. Flink temporal
  * joins / pandas merge_asof) expressed in pure Catalyst operators so
  * whole-stage codegen applies; no custom SparkPlan is needed.
  */
object AsOfJoin {

  /** Left as-of-backward join.
    *
    * @param left      probe side; all its columns are preserved
    * @param right     build side
    * @param keys      equi keys (same names on both sides)
    * @param leftOrd   ordering column on `left` (e.g. event time)
    * @param rightOrd  ordering column on `right`
    * @param rightVals right columns to carry; emitted as `prefix + name`
    * @param strict    if true, match `right.ord < left.ord` (exclusive)
    */
  def joinBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftOrd: String, rightOrd: String, rightVals: Seq[String],
                   prefix: String = "asof_", strict: Boolean = false): DataFrame = {
    val payload = struct(rightVals.map(right(_)) ++ Seq(right(rightOrd).as("__ord")): _*)
    val r = right.select(
      keys.map(right(_)) ++ Seq(
        right(rightOrd).as("__ord"),
        // at equal ord: side 0 sorts first => inclusive (<=); side 2 => strict (<)
        lit(if (strict) 2 else 0).as("__side"),
        payload.as("__payload")): _*)
    val leftCols = left.columns
    val l = left.select(
      col("*") +: Seq(
        col(leftOrd).as("__ord"),
        lit(1).as("__side"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")): _*)
    // align schemas: right side gets nulls for left-only columns
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = leftCols.map(col) ++
      rightVals.map(v => col(s"__match.$v").as(s"$prefix$v")) :+
      col("__match.__ord").as(s"${prefix}ord")
    matched.select(out: _*)
  }

  /** Left as-of-FORWARD join: for each left row, the single EARLIEST
    * right row with `right.ord >= left.ord` (or `>` when strict) in
    * the same key group — the mirror of [[joinBackward]] through the
    * same union-sort rewrite (one shuffle of |L|+|R| rows, no pairwise
    * blowup): the sort flips to DESCENDING (ord, side) so the same
    * O(n) running frame `last(ignoreNulls) over [unboundedPreceding,
    * currentRow]` picks the nearest FOLLOWING payload. At equal ord
    * the side tag decides inclusivity: in descending side order the
    * inclusive right row (side 2) sorts before the left row (side 1)
    * so the running frame sees it; strict tags it side 0 so it sorts
    * after the left row and falls outside the frame.
    *
    * Determinism caveat (shared with joinBackward): among right rows
    * with IDENTICAL (key, ord) the winner is unspecified — pre-reduce
    * the right side to one row per (key, ord) when that can occur.
    */
  def joinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftOrd: String, rightOrd: String, rightVals: Seq[String],
                  prefix: String = "asof_", strict: Boolean = false): DataFrame = {
    val payload = struct(rightVals.map(right(_)) ++ Seq(right(rightOrd).as("__ord")): _*)
    val r = right.select(
      keys.map(right(_)) ++ Seq(
        right(rightOrd).as("__ord"),
        lit(if (strict) 0 else 2).as("__side"),
        payload.as("__payload")): _*)
    val leftCols = left.columns
    val l = left.select(
      col("*") +: Seq(
        col(leftOrd).as("__ord"),
        lit(1).as("__side"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")): _*)
    val rAligned = l.columns.foldLeft(r) { (df, c) =>
      if (r.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.columns.map(col): _*)
    // DESCENDING (ord, side) + the running [unboundedPreceding, currentRow]
    // frame with last(ignoreNulls): Spark evaluates this as an O(n) running
    // frame per key group; the naive [currentRow, unboundedFollowing] +
    // first(ignoreNulls) lowers to UnboundedFollowingWindowFunctionFrame,
    // which recomputes the aggregate from each row to the partition end —
    // O(n^2) on hot keys. In descending side order the inclusive right row
    // (side 2) sorts BEFORE the left row (side 1) so the running frame sees
    // it; strict (side 0) sorts after and falls outside the frame.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ord").desc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(rAligned)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val out = leftCols.map(col) ++
      rightVals.map(v => col(s"__match.$v").as(s"$prefix$v")) :+
      col("__match.__ord").as(s"${prefix}ord")
    matched.select(out: _*)
  }

  /** Range join on [lower, upper) against an equi key, returned as an
    * aggregate per left row (count / sum-style), avoiding the pair
    * blowup only when aggregation allows; general range joins keep the
    * equi-key shuffle join + range predicate (Spark plans a hash join
    * on the equi keys; the range condition is a post-join filter, NOT a
    * cartesian BNLJ, because equi keys exist).
    */
  def rangeCount(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftLower: Column, leftUpper: Column, rightOrd: Column,
                 outCol: String): DataFrame = {
    // a synthetic row id keeps duplicate left rows distinct through the
    // group-by — grouping on the left columns alone would merge them
    // into one output row and break the per-left-row cardinality
    val l = left.withColumn("__rowid", monotonically_increasing_id())
    val joined = l.join(right,
      keys.map(k => l(k) === right(k)).reduce(_ && _) &&
        rightOrd >= leftLower && rightOrd < leftUpper, "left")
    val groupCols = col("__rowid") +: left.columns.map(l(_))
    joined.groupBy(groupCols: _*)
      .agg(count(rightOrd).as(outCol))
      .drop("__rowid")
  }
}
