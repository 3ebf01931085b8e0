package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-neutral Count-Min sketch (d = 4 rows,
  * w = 1024 columns) for heavy-hitter frequency estimates at 100 TB —
  * like [[HllSketch]], composed entirely from codegen'd built-ins and
  * exact integer arithmetic, so any engine restates the counter table
  * and the estimates bit-for-bit (Spark's own CountMinSketch state is
  * an opaque binary).
  *
  * Cell derivation for value v, row j ∈ 0..3:
  *   col_j(v) = conv(first 3 hex chars of md5(j || ':' || v), 16, 10) mod 1024
  * Counters: counter[j, c] = Σ counts of values with col_j = c — a sum
  * of bigints, order-independent. Estimate for v = min_j counter[j,
  * col_j(v)] — the classic CMS guarantee: NEVER an underestimate
  * (every occurrence of v lands in all 4 of its cells), overestimates
  * only from collisions (w·d = 4096 cells ⇒ collisions negligible
  * until the distinct-value count approaches w).
  *
  * Scale shape: the sketch is 4096 rows REGARDLESS of corpus size —
  * one groupBy over the (pre-aggregated) values, mergeable by cell-wise
  * SUM across partitions/streams/days. Pre-aggregating values first
  * (count per value, then add the count to each cell) is equivalent to
  * per-occurrence increments and shuffles |distinct| rows, not |corpus|.
  *
  * Reference shape: term-frequency mining (F32 n-gram tops) where the
  * exact counter table would not fit driver/broadcast state.
  */
object CountMinSketch {

  val D = 4 // hash rows
  val W = 1024 // columns per row

  /** (value, cnt) → one row per (row j, col, cnt): the cell explode. */
  private def cells(counts: DataFrame, valueCol: String): DataFrame =
    counts.select(col(valueCol), col("cnt"),
        explode(expr(s"sequence(0, ${D - 1})")).as("j"))
      .withColumn("c", expr(
        s"CAST(conv(substring(md5(concat(CAST(j AS STRING), ':', $valueCol)), 1, 3), 16, 10) AS INT) % $W"))

  /** The 4×1024 counter table from a pre-aggregated (value, cnt)
    * frame: (j, c, counter). Merge across sketches = cell-wise sum.
    */
  def counters(counts: DataFrame, valueCol: String): DataFrame =
    cells(counts, valueCol)
      .groupBy("j", "c").agg(sum("cnt").as("counter"))

  /** CMS estimate per probe value: min over the d counters the value
    * hashes into. `probes` carries `valueCol`; missing cells count 0
    * (cannot happen for values the sketch has seen).
    */
  def estimates(probes: DataFrame, counterDf: DataFrame,
                valueCol: String): DataFrame =
    cells(probes.withColumn("cnt", lit(0L)), valueCol)
      .join(counterDf, Seq("j", "c"), "left")
      .groupBy(valueCol)
      .agg(min(coalesce(col("counter"), lit(0L))).as("cms_est"))
}
