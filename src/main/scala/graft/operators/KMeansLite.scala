package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means over a vector column — the codebook
  * trainer the IVF (s6) and PQ (s7) tiers were designed to accept.
  *
  * Spark-first shape: each iteration is ONE job — a compiled argmin
  * assignment pass over broadcast centroids (zero shuffle) followed by
  * a per-(cluster, dim) mean (one shuffle, dims-bounded like s5).
  * Centroids live on the driver between iterations (k × dims doubles —
  * the codebook IS driver/broadcast state, as in any ANN index build).
  *
  * Determinism, so a DuckDB oracle can restate the whole fit:
  *  - init = the vectors of the k smallest (md5(id), id) — a
  *    deterministic HASH-ordered sample, so sorted/clustered input
  *    doesn't bias the seeds the way first-k-rows would, while staying
  *    restatable in SQL (both engines agree on md5 hex of the id
  *    string);
  *  - assignment = squared-L2 argmin, dims folded ascending, ties to
  *    the lowest cluster id;
  *  - means accumulate in DECIMAL (order-independent exact sums;
  *    double summation order varies across partitions) and finalize as
  *    double — bit-identical on both engines;
  *  - a cluster that loses every member keeps its previous centroid.
  */
object KMeansLite {

  /** squared-L2 argmin over the broadcast-by-closure centroid list;
    * null/empty vectors yield null (quarantine-style) instead of an NPE
    */
  def assignUdf(cents: Seq[(Int, Array[Double])]) =
    udf { v: Seq[Double] =>
      if (v == null || v.isEmpty) None
      else {
        var best = -1
        var bestD = Double.PositiveInfinity
        for ((cid, cv) <- cents) {
          var d = 0.0
          var i = 0
          while (i < cv.length) {
            val diff = v(i) - cv(i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = cid }
        }
        Some(best)
      }
    }

  /** shared squared-L2 argmin (ties to the earliest entry — cid order
    * when the list is fit()'s sorted output, the assignUdf discipline)
    */
  private def nearestIn(cents: Seq[(Int, Array[Double])],
                        v: Seq[Double]): Int = {
    var best = -1
    var bestD = Double.PositiveInfinity
    for ((cid, cv) <- cents) {
      var d = 0.0
      var i = 0
      while (i < cv.length) {
        val diff = v(i) - cv(i)
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = cid }
    }
    best
  }

  /** TWO-LEVEL (coarse → fine) centroid assignment — the production
    * remedy for the scaled-k assignment term priced in PERF.md round
    * 10: with k ∝ n the brute argmin is n·k distance ops (d32
    * measured 17.6× for a 10× step); routing through a coarse
    * codebook of kc ≈ √k cells costs n·(kc + k/kc) ≈ n·2√k instead.
    * The fine codebook is grouped ONCE, driver-side, by each fine
    * centroid's nearest coarse cell (kc·k ops); a vector then resolves
    * its coarse cell and argmins only that cell's fine members.
    *
    * APPROXIMATE vs the brute argmin — a vector's true nearest fine
    * centroid can live in a neighboring coarse cell (the IVF nprobe
    * trade, accepted here for the same reason) — but fully
    * DETERMINISTIC given the two codebooks: ties break to the lowest
    * cid at both levels, so an oracle can restate the exact rule. A
    * vector routed to a coarse cell that owns NO fine members (seed
    * overlap pathology) falls back to the full fine argmin —
    * correctness-first, bounded, and rare by construction.
    */
  def assignHierarchicalUdf(coarse0: Seq[(Int, Array[Double])],
                            fine0: Seq[(Int, Array[Double])]) = {
    require(coarse0.nonEmpty && fine0.nonEmpty,
      "assignHierarchicalUdf: both codebooks must be non-empty")
    // the lowest-cid tie-break contract holds only if nearestIn scans
    // in cid order — fit() returns sorted codebooks, but enforce it
    // here (driver-side, k·log k) so an unsorted caller can't silently
    // shift assignments away from the oracle's restated rule
    val coarse = coarse0.sortBy(_._1)
    val fine = fine0.sortBy(_._1)
    val byCoarse: Map[Int, Seq[(Int, Array[Double])]] =
      fine.groupBy(fc => nearestIn(coarse, fc._2.toSeq))
    udf { v: Seq[Double] =>
      if (v == null || v.isEmpty) None
      else {
        val cands = byCoarse.getOrElse(nearestIn(coarse, v), fine)
        Some(nearestIn(cands, v))
      }
    }
  }

  /** deterministic init shared by both fits: the vectors of the k
    * smallest (md5(id), id) — hash-ordered, restatable in SQL
    */
  private def seedInit(df: DataFrame, idCol: String, vCol: String, k: Int)
      : Seq[(Int, Array[Double])] = df
    .orderBy(md5(col(idCol).cast("string")), col(idCol))
    .limit(k).select(col(vCol)).collect()
    .zipWithIndex
    .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }.toSeq

  /** one Lloyd mean step under the given assignment UDF — decimal-
    * exact sums, round-6 double finalization (both engines identical)
    */
  private def lloydMeans(df: DataFrame, vCol: String,
                         assign: org.apache.spark.sql.expressions.UserDefinedFunction)
      : Map[Int, Array[Double]] = df
    .withColumn("cid", assign(col(vCol)))
    .select(col("cid"), posexplode(
      expr(s"transform($vCol, x -> cast(x as decimal(25,10)))"))
      .as(Seq("dim", "x")))
    .groupBy("cid", "dim")
    // decimal-exact sum, then the s5-proven round(…,6) finalization
    // — decimal DIVISION precision rules differ between engines, so
    // the quantized mean is what both compute identically
    .agg(round((sum("x") / count(lit(1))).cast("double"), 6).as("m"))
    .collect()
    .groupBy(_.getInt(0))
    .map { case (cid, rows) =>
      cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
    }

  /** Fit `k` centroids with `iters` Lloyd iterations; returns them
    * sorted by cluster id. `df` must carry a unique `idCol` (init picks
    * the k smallest by hash order) and `vCol: array<double>`.
    */
  def fit(df: DataFrame, idCol: String, vCol: String, k: Int, iters: Int)
      : Seq[(Int, Array[Double])] = {
    var cents = seedInit(df, idCol, vCol, k)
    for (_ <- 1 to iters) {
      val means = lloydMeans(df, vCol, assignUdf(cents))
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    cents
  }

  /** TWO-LEVEL fit — the scaled-k production path end to end. fit()'s
    * Lloyd iteration assigns with the brute argmin, so at k ∝ n the
    * TRAINER is n·k per iteration even if the final assignment goes
    * hierarchical; this variant routes the iteration's assignment
    * through [[assignHierarchicalUdf]] under a coarse codebook fit
    * first at kc ≈ √k, so every pass over the data — coarse fit, fine
    * iterations, and the caller's final assignment — is n·O(√k).
    *
    * Same determinism contract as fit(): hash-ordered seeds, lowest-cid
    * tie-breaks at both levels, decimal-exact means finalized round-6,
    * a cluster that loses every member keeps its previous centroid —
    * so a SQL oracle can restate the whole fit (coarse trainer → fine
    * seeds → per-iteration hierarchical argmin → means). APPROXIMATE
    * vs fit() the way assignHierarchicalUdf is vs assignUdf (a
    * vector's true nearest fine centroid can sit in a neighboring
    * coarse cell); exact on separated data (HierarchicalAssignSpec).
    * Returns (coarse, fine), both sorted by cid.
    */
  def fitHierarchical(df: DataFrame, idCol: String, vCol: String,
                      k: Int, kc: Int, iters: Int)
      : (Seq[(Int, Array[Double])], Seq[(Int, Array[Double])]) = {
    val coarse = fit(df, idCol, vCol, kc, iters)
    var cents = seedInit(df, idCol, vCol, k)
    for (_ <- 1 to iters) {
      val means = lloydMeans(df, vCol, assignHierarchicalUdf(coarse, cents))
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }
    (coarse, cents)
  }

  // ---------------------------------------------- centroids-as-DataFrame
  // The driver-state ceiling of the UDF tier, and its removal. The
  // two-level UDFs above hold the FINE codebook (k·dims doubles) as
  // broadcast-by-closure state and build the fine→coarse route map
  // driver-side at k·kc distance ops; fit()/fitHierarchical() collect
  // k·dims means back per Lloyd iteration. Under the gated policy
  // k = n/100 that survives ~100× of the gated shapes (15 M docs →
  // k = 150k ≈ 77 MB broadcast) but dies around k ≈ 10⁷ (multi-GB
  // broadcast; 3×10¹⁰ driver ops for the route map). The *Dist
  // variants below keep the fine codebook a DataFrame end to end —
  // the coarse route is a zero-shuffle UDF over the O(√k) coarse
  // codebook (the ONLY remaining driver/broadcast state: kc = √k
  // cells, e.g. k = 10¹⁰ → 10⁵ cells ≈ 51 MB — the ceiling moves
  // from k ≈ 10⁷ to k ≈ 10¹⁰), the fine argmin is an equi-join on
  // the routed coarse cell + one per-vector window, and the Lloyd
  // means never leave the cluster. BIT-IDENTICAL to the UDF tier by
  // construction (same seeds, same fold orders, same lowest-cid tie
  // breaks, same empty-cell fallback, same decimal-exact means) —
  // DistAssignSpec asserts it and the s24/d34 gates share the
  // s20/d33 oracles verbatim.

  /** Above this k the seed path switches from the limit+window plan
    * (which merges/ranks the k-row result through ONE task — fine at
    * ~50 MB of seed vectors, the funnel the dist tier must not
    * reintroduce past that) to GlobalRank's distributed ranking.
    */
  private[operators] val SeedFunnelMax = 100000

  /** hash-ordered k seeds as a DATAFRAME (seedInit without the
    * driver collect), PERSISTED: `(cid int, cv array<double>)`.
    * SIZE-ADAPTIVE like GlobalRank.ntileGlobal: small k takes the
    * limit+window plan (TakeOrdered heaps cluster-side; only the
    * k-row result ranks in one task), large k routes through
    * GlobalRank's range-exchange ranking so no single task ever holds
    * k seed vectors — filter rank ≤ k afterwards. Both paths rank the
    * SAME (md5, id) total order, so the seeds are identical
    * (DistAssignSpec pins it); `funnelMax` is a test knob only.
    */
  private[operators] def seedInitDf(df: DataFrame, idCol: String, vCol: String,
                                    k: Int,
                                    funnelMax: Int = SeedFunnelMax): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val base = df.select(md5(col(idCol).cast("string")).as("__h"),
      col(idCol).as("__sid"), col(vCol).as("cv"))
    if (k <= funnelMax)
      base.orderBy(col("__h"), col("__sid")).limit(k)
        .withColumn("cid", (row_number().over(
          Window.orderBy(col("__h"), col("__sid"))) - 1))
        .select(col("cid"), col("cv"))
        .persist(lvl)
    else {
      val (ranked, release) = GlobalRank.withGlobalRankReleasable(
        base, Seq(col("__h"), col("__sid")), "__r")
      val seeds = ranked.where(col("__r") <= k)
        .withColumn("cid", (col("__r") - 1).cast("int"))
        .select(col("cid"), col("cv"))
        .persist(lvl)
      // materialize before releasing the rank's internal cache — the
      // range-boundary sampling is seeded per shuffle, so the seeds
      // must pin ONE materialization of it
      seeds.count()
      release()
      seeds
    }
  }

  /** squared-L2 distance of vector columns `a`, `b` — the SQL fold is
    * ascending-dim left-to-right, bit-identical to nearestIn's loop
    */
  private def l2Col(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), " +
      "cast(0 as double), (acc, x) -> acc + x)")

  /** TWO-LEVEL assignment with the fine codebook as a DATAFRAME
    * (`fineDf(cid, cv)`): coarse routing is the same zero-shuffle
    * compiled argmin over the small broadcast coarse codebook — on
    * BOTH the fine centroids and the population — and the fine argmin
    * becomes an equi-join on the routed coarse cell plus one
    * per-vector window (ties to the lowest cid, nearestIn's
    * contract). A vector routed to a coarse cell owning NO fine
    * members falls back to the full fine argmin (cross join against
    * the fine DataFrame — rare by construction, the UDF tier's rule).
    * Null/empty vectors assign null. Returns `(<idCol>, cid)`.
    */
  def assignHierDistDf(pop: DataFrame, idCol: String, vCol: String,
                       coarse: Seq[(Int, Array[Double])],
                       fineDf: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val route = assignUdf(coarse.sortBy(_._1))
    val fineRouted = fineDf.withColumn("__ccid", route(col("cv")))
    val routed = pop
      .select(col(idCol).as("__aid"), col(vCol).as("__v"))
      .withColumn("__ccid", route(col("__v")))
      .where(col("__ccid").isNotNull)
    val w = Window.partitionBy("__aid").orderBy(col("__dd"), col("cid"))
    def argmin(cands: DataFrame): DataFrame = cands
      .withColumn("__dd", l2Col("__v", "cv"))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("__aid"), col("cid"))
    val matched = argmin(routed.join(fineRouted, Seq("__ccid")))
    val fallback = argmin(
      routed.join(fineRouted.select("__ccid").distinct(),
          Seq("__ccid"), "left_anti")
        .crossJoin(fineDf))
    matched.union(fallback).withColumnRenamed("__aid", idCol)
  }

  /** one distributed Lloyd mean step over an assigned population
    * `(cid, <vCol>)` — the lloydMeans aggregation kept as a DataFrame
    * (decimal-exact sums, round-6 double finalization; the per-cid
    * array reassembles via a dim-sorted collect_list, bounded at dims
    * entries per group)
    */
  private def lloydMeansDf(assigned: DataFrame, vCol: String): DataFrame =
    assigned
      .select(col("cid"), posexplode(
        expr(s"transform($vCol, x -> cast(x as decimal(25,10)))"))
        .as(Seq("dim", "x")))
      .groupBy("cid", "dim")
      .agg(round((sum("x") / count(lit(1))).cast("double"), 6).as("m"))
      .groupBy("cid")
      .agg(expr("transform(sort_array(collect_list(struct(dim, m))), " +
        "s -> s.m)").as("cv"))

  /** TWO-LEVEL fit with the fine codebook a DATAFRAME end to end —
    * fitHierarchical without the k-proportional driver state: the
    * coarse codebook still fits via [[fit]] (kc = √k centroids — the
    * retained, bounded driver state), fine seeds stay distributed
    * ([[seedInitDf]]), each Lloyd iteration assigns through
    * [[assignHierDistDf]] and re-means via [[lloydMeansDf]], and the
    * keep-seed rule (a cluster losing every member keeps its previous
    * centroid) is an anti-join union instead of getOrElse. Returns
    * `(coarse, fineDf(cid, cv))` — same contract, same determinism,
    * bit-identical centroids (DistAssignSpec).
    *
    * CACHE CONTRACT — CALLER UNPERSISTS: the returned fine frame is
    * persisted (≤ k codebook rows; at iters=0 it is seedInitDf's
    * persisted frame). The caller releases it after materializing its
    * consumers (`fineDf.unpersist()` — the s24/s25 gates and
    * serveTopkFromIndex's probe-cache discipline); leaving it pinned
    * costs one codebook-sized cache block until session cache eviction.
    */
  def fitHierarchicalDist(df: DataFrame, idCol: String, vCol: String,
                          k: Int, kc: Int, iters: Int)
      : (Seq[(Int, Array[Double])], DataFrame) = {
    val coarse = fit(df, idCol, vCol, kc, iters)
    var fine = seedInitDf(df, idCol, vCol, k) // persisted by seedInitDf
    for (_ <- 1 to iters) {
      val asg = assignHierDistDf(df, idCol, vCol, coarse, fine)
      val assigned = df.select(col(idCol), col(vCol))
        .join(asg, Seq(idCol))
      val means = lloydMeansDf(assigned, vCol)
      // keep-seed via anti-join (a shuffle over ≤ k codebook rows,
      // never the corpus). Persist short-circuits EXECUTION only —
      // the logical plan would still deepen every iteration and
      // re-incur driver-side analysis of the whole chain (the d34
      // lesson, MinHashLSH.convergeKeepList) — so the persisted
      // frame is re-wrapped as a flat LogicalRDD before it becomes
      // next round's `fine`; unpersist stays on the wrapped handle.
      val grown = means
        .unionByName(fine.join(means.select("cid"), Seq("cid"), "left_anti"))
      val next = df.sparkSession.createDataFrame(grown.rdd, grown.schema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      next.count()
      fine.unpersist()
      fine = next
    }
    (coarse, fine)
  }
}
