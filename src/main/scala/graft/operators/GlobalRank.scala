package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking / ntile (W3).
  *
  * `Window.orderBy(...)` with no partition key funnels the ENTIRE table
  * through one partition — fine for a 1 500-row aggregate, fatal for a
  * raw fact table at 100 TB. This operator computes the same total
  * order distributed:
  *
  *  1. `repartitionByRange` on the sort key (parallel range exchange),
  *     then sort within partitions — partitions are now ordered blocks
  *     of the global sort.
  *  2. `monotonically_increasing_id` AFTER the sort gives each row its
  *     partition id (upper bits) and its 0-based position within the
  *     partition (lower 33 bits) with no further shuffle — the id is
  *     nondeterministic in general, which is exactly why the optimizer
  *     will not reorder it across the sort.
  *  3. Per-partition row counts (one row per partition — tiny) turn
  *     into prefix offsets with a window over ≤ numPartitions rows;
  *     global rank = offset[pid] + local position + 1 via a broadcast
  *     join. Only the offset table is ever single-partition, never the
  *     data.
  *
  * `ntileGlobal` is SIZE-ADAPTIVE: the distributed machinery pays ~1 s
  * of fixed cost (range exchange + persist + offset broadcast), which
  * is the wrong trade for a vocabulary-bounded aggregate — below the
  * row-estimate threshold it dispatches to the plain single-partition
  * window (identical assignment, proven equal in `GlobalRankSpec`),
  * above it to the distributed plan. Estimates come from plan
  * statistics; unknown stats route distributed (always correct, just
  * heavier).
  *
  * The ntile bucket follows the SQL-standard formula (first `n mod k`
  * buckets get the extra row), so results match `ntile(k) OVER
  * (ORDER BY ...)` exactly — asserted against Spark's own window ntile
  * in `GlobalRankSpec`. The sort columns must define a TOTAL order
  * (include a tiebreaker key) for the assignment to be deterministic.
  */
object GlobalRank {

  private val LocalBits = 33 // monotonically_increasing_id layout
  private val LocalMask = (1L << LocalBits) - 1

  /** Default dispatch threshold: a ≤1M-row unpartitioned window sorts
    * comfortably inside one task, well under the distributed plan's
    * fixed cost.
    */
  val SmallInputRows: Long = 1L << 20

  /** Plan-statistics row estimate: exact rowCount when the optimizer
    * knows it (local relations, ranges, CBO), else a conservative
    * bytes-based guess. None = unknown (caller should assume large).
    */
  private[operators] def estimatedRows(df: DataFrame): Option[Long] = {
    val stats = df.queryExecution.optimizedPlan.stats
    stats.rowCount.map(_.longValue).orElse {
      val sz = stats.sizeInBytes
      // For file sources sizeInBytes is the COMPRESSED on-disk size, so
      // assume 1 byte/row: an 8 B/row minimum width times an up-to-8×
      // decompression margin. Every realistic source then OVERestimates
      // the count and routes distributed — the safe direction; the
      // wrongly-single-task direction risks one task sorting everything
      if (sz < BigInt(Long.MaxValue / 2)) Some(sz.longValue.max(1L)) else None
    }
  }

  /** `withGlobalRank` plus a release handle for the internal cache: the
    * range-partitioned frame stays pinned (MEMORY_AND_DISK) until the
    * handle runs, so eager consumers (write / collect) should
    * try/finally-release it. The handle-free overload keeps the cache
    * for the plan's lifetime — it is reclaimed when the plan is GC'd,
    * which is fine for one-shot sessions but accumulates storage if a
    * long-lived session keeps ranking new frames.
    */
  def withGlobalRankReleasable(df: DataFrame, sortCols: Seq[Column],
                               rankCol: String): (DataFrame, () => Unit) = {
    // persisted because TWO consumers read it (the offset counts and
    // the join side): range-boundary sampling is seeded per shuffle, so
    // if the exchange were re-executed rather than reused, the two
    // evaluations could disagree on partition assignment and corrupt
    // every rank — the cache pins one materialization for both
    val parted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftRight(col("__mid"), LocalBits))
      .withColumn("__local", col("__mid").bitwiseAND(lit(LocalMask)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = counts.withColumn("__offset",
      coalesce(sum("__cnt").over(
        Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("__pid", "__offset")
    val ranked = parted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, col("__offset") + col("__local") + 1)
      .drop("__mid", "__pid", "__local", "__offset")
    (ranked, () => { parted.unpersist(); () })
  }

  /** Append `rankCol` (1-based global rank by `sortCols`). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String): DataFrame =
    withGlobalRankReleasable(df, sortCols, rankCol)._1

  /** Append `bucketCol` = ntile(`buckets`) over the global `sortCols`
    * order — size-adaptive (see class doc). Pass `smallInputRows = 0`
    * to force the distributed plan (as the scale probes do).
    */
  def ntileGlobal(df: DataFrame, buckets: Int, sortCols: Seq[Column],
                  bucketCol: String,
                  smallInputRows: Long = SmallInputRows): DataFrame =
    ntileGlobalReleasable(df, buckets, sortCols, bucketCol, smallInputRows)._1

  /** `ntileGlobal` plus the internal cache's release handle: the
    * distributed path pins the range-partitioned frame (see
    * withGlobalRankReleasable); eager consumers should try/finally-
    * release. The small-input path persists nothing — its handle is a
    * no-op.
    */
  def ntileGlobalReleasable(df: DataFrame, buckets: Int, sortCols: Seq[Column],
                            bucketCol: String,
                            smallInputRows: Long = SmallInputRows)
      : (DataFrame, () => Unit) = {
    if (estimatedRows(df).exists(_ <= smallInputRows)) {
      (df.withColumn(bucketCol,
        ntile(buckets).over(Window.orderBy(sortCols: _*)).cast("long")), () => ())
    } else {
      val (ranked, release) = withGlobalRankReleasable(df, sortCols, "__rank")
      // total row count rides along as a 1-row broadcast
      val total = ranked.agg(count(lit(1)).as("__n"))
      val k = lit(buckets.toLong)
      val out = ranked.crossJoin(broadcast(total))
        .withColumn(bucketCol, {
          // Column `/` is true division — use explicit integral div
          def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")
          val n = col("__n")
          val base = idiv(n, k)
          val rem = n % k
          val cut = rem * (base + 1)     // rows covered by the big buckets
          when(col("__rank") <= cut, idiv(col("__rank") - 1, base + 1) + 1)
            .otherwise(rem + idiv(col("__rank") - cut - 1, base) + 1)
        })
        .drop("__rank", "__n")
      (out, release)
    }
  }

  /** Append `outCol` = GLOBAL running total of `valueCol` in `sortCols`
    * order — the distributed prefix sum behind budget-capped selection
    * ("take the best documents until the token budget is spent").
    * `Window.orderBy(...).rowsBetween(unboundedPreceding, current)`
    * with no partition key would funnel the whole table through one
    * task; here the same three-step trick as withGlobalRank applies:
    * range-partition + local sort, then per-PARTITION sums collapse to
    * a ≤numPartitions-row offset table (the only single-partition
    * window), and the within-partition running sum is a window
    * partitioned by __pid — fully parallel. Sort columns must define a
    * total order (include a tiebreaker) for determinism.
    */
  def withGlobalPrefixSumReleasable(df: DataFrame, sortCols: Seq[Column],
                                    valueCol: Column, outCol: String)
      : (DataFrame, () => Unit) = {
    val parted = df
      .withColumn("__val", valueCol)
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftRight(col("__mid"), LocalBits))
      .withColumn("__local", col("__mid").bitwiseAND(lit(LocalMask)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = parted.groupBy("__pid").agg(sum("__val").as("__psum"))
      .withColumn("__offset",
        coalesce(sum("__psum").over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__offset")
    val w = Window.partitionBy("__pid").orderBy("__local")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = parted.join(broadcast(offsets), Seq("__pid"))
      .withColumn(outCol, col("__offset") + sum(col("__val")).over(w))
      .drop("__mid", "__pid", "__local", "__offset", "__val")
    (out, () => { parted.unpersist(); () })
  }

  /** Append `outCol` (global running total of `valueCol` by `sortCols`). */
  def withGlobalPrefixSum(df: DataFrame, sortCols: Seq[Column],
                          valueCol: Column, outCol: String): DataFrame =
    withGlobalPrefixSumReleasable(df, sortCols, valueCol, outCol)._1
}
