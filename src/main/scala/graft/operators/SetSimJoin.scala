package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via prefix filtering (the AllPairs /
  * PPJoin candidate condition) — the LSH-free sibling of
  * [[MinHashLSH.candidatePairs]]: where LSH trades recall for
  * candidate count, the prefix filter is LOSSLESS (every pair at
  * Jaccard ≥ τ is guaranteed a candidate) and the verify step makes
  * the output exactly the all-pairs result at the threshold.
  *
  * The candidate condition: order every document's distinct tokens by
  * one GLOBAL total order (ascending document frequency, then token —
  * rarest first), and emit only each document's PREFIX of length
  * |d| − ⌈τ·|d|⌉ + 1. Two sets at Jaccard ≥ τ overlap in more than
  * |a|+|b|−⌈τ(|a|+|b|)⌉ elements, so under any shared total order
  * their prefixes must intersect — an equi-join on prefix tokens
  * finds every qualifying pair. Rarest-first is the load-bearing
  * choice at scale: the join key distribution is the prefix-token
  * frequency distribution, and putting rare tokens in prefixes means
  * stopword-sized buckets never form (the hot tokens sort LAST and
  * are mostly excluded from prefixes by construction). A residual hot
  * slice is a plain shuffle equi-join AQE skew-split handles.
  *
  * Threshold arithmetic is RATIONAL (tauNum/tauDen), never floating:
  * prefix length, the length filter, and the final Jaccard test are
  * all integer cross-multiplications, so the operator's output set is
  * bit-deterministic and engine-portable.
  *
  * Cost shape at 100 TB: one groupBy for document frequencies (map-
  * side combined, one row per distinct token), one re-agg to order
  * tokens per doc, one equi-join on prefix tokens (each doc
  * contributes ~(1−τ)·|d| join rows), a distinct on surviving
  * candidate pairs, and a verify join that touches only candidates —
  * never all pairs.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with |a∩b| / |a∪b| ≥ tauNum/tauDen over
    * distinct token sets.
    *
    * @param docs      input relation
    * @param idCol     numeric id column name
    * @param tokensCol array<string> column (deduped internally)
    * @return (ia, ib, inter_sz, union_sz, jaccard) — sizes BIGINT,
    *         jaccard = inter/union as double (exact int division)
    */
  def jaccardJoin(docs: DataFrame, idCol: String, tokensCol: Column,
                  tauNum: Int = 4, tauDen: Int = 5): DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen, s"tau=$tauNum/$tauDen not in (0,1]")
    val base = docs
      .select(col(idCol).cast("long").as("id"),
        array_distinct(tokensCol).as("ts"))
      .where(size(col("ts")) > 0)

    // global document frequency per token — the total order's first key
    val freq = base.select(explode(col("ts")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))

    // re-assemble each doc's tokens sorted rarest-first; (df, tok) is
    // unique within a doc (tokens are distinct), so the order is total
    val ordered = base.select(col("id"), explode(col("ts")).as("tok"))
      .join(freq, "tok")
      .groupBy("id")
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("ft"))
      .select(col("id"),
        expr("transform(ft, x -> x.tok)").as("ots"),
        size(col("ft")).as("n"))

    // prefix length n - ceil(tau*n) + 1, all-integer ceil
    val prefLen = (col("n") - (col("n") * tauNum + tauDen - 1)
      .divide(tauDen).cast("int") + 1)
    val prefixes = ordered
      .select(col("id"), col("n"),
        explode(slice(col("ots"), lit(1), prefLen)).as("tok"))

    val a = prefixes.select(col("id").as("ia"), col("n").as("na"), col("tok"))
    val b = prefixes.select(col("id").as("ib"), col("n").as("nb"), col("tok"))
    val candidates = a.join(b, "tok")
      .where(col("ia") < col("ib"))
      // length filter: min ≥ tau·max, integer cross-multiplied —
      // BEFORE the distinct so impossible pairs never shuffle twice
      .where(least(col("na"), col("nb")) * tauDen >=
        greatest(col("na"), col("nb")) * tauNum)
      .select("ia", "ib").distinct()

    // verify ONLY candidates: exact intersection via array_intersect
    // (token arrays are already distinct)
    val ta = base.select(col("id").as("ia"), col("ts").as("tsa"))
    val tb = base.select(col("id").as("ib"), col("ts").as("tsb"))
    candidates.join(ta, "ia").join(tb, "ib")
      .select(col("ia"), col("ib"),
        size(array_intersect(col("tsa"), col("tsb"))).cast("long").as("inter_sz"),
        (size(col("tsa")) + size(col("tsb"))).cast("long").as("nsum"))
      .select(col("ia"), col("ib"), col("inter_sz"),
        (col("nsum") - col("inter_sz")).as("union_sz"))
      .where(col("inter_sz") * tauDen >= col("union_sz") * tauNum)
      .withColumn("jaccard",
        col("inter_sz").cast("double") / col("union_sz").cast("double"))
  }
}
