package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling salted join: hot keys on the fact side are spread over
  * `nSalts` artificial sub-keys; the (small) build side is replicated
  * once per salt. The shuffle then balances hot keys across `nSalts`
  * tasks instead of funnelling them into one.
  *
  * Use when AQE's skew-join split isn't available (e.g. the skew is in
  * a broadcast-ineligible mid-size dimension) — otherwise prefer AQE
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default).
  */
object Salting {

  /** Equi-join `large` ⋈ `small` on `key`, salting the large side.
    * Result equals the unsalted join (inner/left semantics preserved
    * for 1:N joins where `small` has ≤1 row per key).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 nSalts: Int = 8, joinType: String = "inner"): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)).cast("int"))
    val replicated = small
      .withColumn("__salt", explode(expr(s"sequence(0, ${nSalts - 1})")))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
