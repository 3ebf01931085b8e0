package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-neutral HyperLogLog sketch (p = 8, m = 256
  * registers) for approximate distinct counts at 100 TB — composed
  * entirely from codegen'd built-ins (md5, conv, regexp_extract,
  * shiftleft), no UDF, no custom expression.
  *
  * Why not `approx_count_distinct`: Spark's HLL++ register state is an
  * engine-internal binary and its estimate depends on implementation
  * details, so no other engine can restate it — it can't be
  * oracle-gated and its sketches can't interoperate. This sketch fixes
  * the hash (md5), the register derivation (hex nibbles), and the
  * harmonic sum (EXACT integer arithmetic, scaled by 2^61) so any
  * engine reproduces the state bit-for-bit; the only floating-point
  * step is the final constant-folded estimate division, which is a
  * single IEEE op on identical inputs.
  *
  * Register derivation per value v:
  *  - h = md5(cast(v as string)) — 32 hex chars
  *  - bucket = first 2 nibbles (0..255)
  *  - rho = position of the first 1-bit in the next 60 bits + 1
  *    (1..60; 61 when all zero), computed from hex nibbles with a
  *    4-way CASE — no log2 floating point anywhere in the state
  *  - register[bucket] = max(rho) — commutative/idempotent, so the
  *    aggregation is one shuffle of ≤ m rows per group and sketches
  *    merge by max (partition-order independent by construction)
  *
  * The scaled harmonic sum Σ 2^(61-rho) (empty registers contribute
  * 2^61) stays exact in DECIMAL(38,0) — max 256·2^61 = 2^69 overflows
  * BIGINT. Raw estimate = α₂₅₆·m²·2^61 / zsum (no small-range
  * correction in the gated output — ln() is libm-dependent across
  * engines; `estimateCorrected` applies it driver-side for users).
  *
  * Reference shape: corpus-stats distinct counts (unique cited
  * rulings, unique parties) that don't need exactness at 100 TB.
  */
object HllSketch {

  val M = 256 // 2^p, p = 8
  val Alpha = 0.7182725932495458 // 0.7213 / (1 + 1.079/256)

  /** α·m²·2^61 precomputed to ONE double literal (e-notation parses as
    * DOUBLE in both Spark and DuckDB — bare decimal literals are
    * DECIMAL in both, with engine-specific multiplication semantics),
    * so the raw estimate is a single identical IEEE division.
    */
  val AlphaM2Scale = "1.0854228543761655e+23"

  private val Scale = "2305843009213693952" // 2^61

  /** Adds `__bucket` (int 0..255) and `__rho` (int 1..61) for `key`.
    * Null keys hash like the string "null"? No — md5(NULL) is NULL and
    * the register rows drop at the aggregate, matching the oracle's
    * NULL-skip in count(distinct).
    */
  def withRegister(df: DataFrame, key: Column): DataFrame = df
    .withColumn("__h", md5(key.cast("string")))
    .withColumn("__bucket", expr("CAST(conv(substring(__h, 1, 2), 16, 10) AS INT)"))
    .withColumn("__tail", expr("substring(__h, 3, 15)"))
    .withColumn("__z", length(regexp_extract(col("__tail"), "^0*", 0)))
    .withColumn("__rho", expr(
      """CASE WHEN __z >= 15 THEN 61
         ELSE 4 * __z + (CASE
           WHEN CAST(conv(substring(__tail, __z + 1, 1), 16, 10) AS INT) >= 8 THEN 0
           WHEN CAST(conv(substring(__tail, __z + 1, 1), 16, 10) AS INT) >= 4 THEN 1
           WHEN CAST(conv(substring(__tail, __z + 1, 1), 16, 10) AS INT) >= 2 THEN 2
           ELSE 3 END) + 1 END"""))
    .drop("__h", "__tail", "__z")

  /** One register row (groupCols..., __bucket, register) per non-empty
    * bucket: the mergeable sketch state (merge = max per bucket).
    */
  def registers(df: DataFrame, key: Column, groupCols: Seq[String]): DataFrame =
    withRegister(df, key)
      .where(col("__bucket").isNotNull)
      .groupBy((groupCols :+ "__bucket").map(col): _*)
      .agg(max("__rho").as("register"))

  /** Integer sketch summary + raw estimate per group:
    *  - n_nonempty: buckets with at least one value (bigint)
    *  - zsum: exact scaled harmonic sum Σ 2^(61-rho) over ALL m
    *    registers (empty → 2^61), emitted as double (exact decimal →
    *    nearest double is bit-identical across engines)
    *  - est_raw: α·m²·2^61 / zsum, one double division
    */
  def summary(df: DataFrame, key: Column, groupCols: Seq[String]): DataFrame =
    summarize(registers(df, key, groupCols), groupCols)

  /** Summary from an EXISTING register frame — possibly a LOG of
    * partial sketches (several register rows per bucket, e.g. one per
    * micro-batch): rows merge by max first, so appending partial
    * sketches and summarizing later is exactly sketch merge. Duplicate
    * or re-delivered inputs cannot perturb the result (max is
    * idempotent) — HLL under at-least-once delivery needs no dedup.
    */
  def summarize(regs: DataFrame, groupCols: Seq[String]): DataFrame =
    regs
      .groupBy((groupCols :+ "__bucket").map(col): _*)
      .agg(max("register").as("register"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_nonempty"),
        sum(expr("CAST(shiftleft(1L, 61 - register) AS DECIMAL(38,0))")).as("__zp"))
      .withColumn("zsum",
        expr(s"CAST(__zp + (256 - n_nonempty) * CAST($Scale AS DECIMAL(38,0)) AS DOUBLE)"))
      .withColumn("est_raw", expr(s"$AlphaM2Scale / zsum"))
      .drop("__zp")

  /** Driver-side corrected estimate from a summary row (standard HLL
    * small-range linear counting; uses ln, hence NOT in the gated
    * engine-neutral output).
    */
  def estimateCorrected(nNonempty: Long, estRaw: Double): Double = {
    val zeros = M - nNonempty
    if (estRaw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
    else estRaw
  }
}
