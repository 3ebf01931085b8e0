package graft.queries

/** Shared DuckDB-oracle SQL builders for operators gated from more than
  * one pack (the SQL restates graft operators' semantics exactly — see
  * the operator scaladoc for the algorithm).
  */
object Oracles {

  /** Restates `operators.HllSketch.summary` (p=8 md5-nibble registers,
    * exact scaled harmonic sum, single-literal estimate division) over
    * `table`, hashing `keyVarchar` (a VARCHAR-typed SQL expression),
    * grouped by `groupCol`. Emits (groupCol, n_nonempty, zsum, est_raw).
    */
  def hllSummary(table: String, keyVarchar: String, groupCol: String): String = {
    val h = s"md5($keyVarchar)"
    val tail = s"substr($h, 3, 15)"
    val z = s"length(regexp_extract($tail, '^0*'))"
    def nibble(expr: String) = s"strpos('0123456789abcdef', $expr) - 1"
    val firstNz = nibble(s"substr($tail, $z + 1, 1)")
    s"""WITH reg AS (
          SELECT $groupCol,
                 16 * (${nibble(s"substr($h, 1, 1)")})
                   + (${nibble(s"substr($h, 2, 1)")}) AS bucket,
                 CASE WHEN $z >= 15 THEN 61
                 ELSE 4 * $z
                   + (CASE WHEN $firstNz >= 8 THEN 0
                           WHEN $firstNz >= 4 THEN 1
                           WHEN $firstNz >= 2 THEN 2
                           ELSE 3 END) + 1 END AS rho
          FROM $table),
        regs AS (
          SELECT $groupCol, bucket, max(rho) AS register
          FROM reg GROUP BY 1, 2),
        summ AS (
          SELECT $groupCol,
                 count(*) AS n_nonempty,
                 CAST(sum((1::BIGINT << (61 - register))::HUGEINT)
                      + (256 - count(*)) * 2305843009213693952::HUGEINT AS DOUBLE) AS zsum
          FROM regs GROUP BY 1)
        SELECT $groupCol, n_nonempty, zsum,
               1.0854228543761655e+23 / zsum AS est_raw
        FROM summ"""
  }
}
