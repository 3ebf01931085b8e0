package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Recall evidence for the ANN tiers: each approximate path (LSH
  * bucket, IVF nprobe=2, PQ ADC) measured against the exact brute-force
  * top-10 on the same corpus. ANN correctness gates (s4/s6/s7…) pin the
  * OUTPUT deterministically; this spec pins the QUALITY claim — that the
  * approximations actually find most true neighbors — with printed
  * per-tier recall feeding COVERAGE/PERF notes.
  */
class AnnRecallSpec extends SparkSpec {

  private val K = 10
  private val nQueries = 8

  private lazy val e = {
    graft.GraftExtensions.registerNative(spark)
    VectorOps.vecs(graft.sources.Tables.embeddings(spark, sfDir))
      .select("vec_id", "v", "nn").cache()
  }

  /** exact top-K neighbor ids per query id (cosine, brute force) */
  private lazy val truth: Map[Long, Set[Long]] = {
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"))
    e.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
  }

  private def recall(approx: Map[Long, Set[Long]]): Double = {
    val hits = truth.map { case (q, t) => (approx.getOrElse(q, Set.empty) & t).size }
    hits.sum.toDouble / (truth.size * K)
  }

  /** top-K via bucket-equality candidates over `b` (with bucket col) */
  private def bucketTop(b: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
    val q = b.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nn").as("qn"), col("bucket"))
    b.join(broadcast(q), "bucket")
      .where(col("vec_id") =!= col("qid"))
      .select("qid", "qv", "qn", "vec_id", "v", "nn").distinct() // union of tables
      .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
  }

  test("multi-table LSH compounds recall over the single-table index") {
    val single = recall(bucketTop(e.withColumn("bucket", VectorOps.bucketBits(4))))
    def multi(tables: Int): Double = {
      // one row per (vector, table); bucket ids disambiguated per table
      val b = e.withColumn("t", explode(expr(s"sequence(0, ${tables - 1})")))
      val withBucket = (0 until tables).foldLeft(
        b.withColumn("bucket", lit(-1)))( (acc, t) =>
        acc.withColumn("bucket",
          when(col("t") === t,
            VectorOps.bucketTable(4, t) * tables + t).otherwise(col("bucket"))))
      recall(bucketTop(withBucket))
    }
    val m2 = multi(2); val m4 = multi(4)
    println(f"ANN-RECALL lsh single(4bit)=$single%.3f tables2=$m2%.3f tables4=$m4%.3f")
    assert(m4 >= m2 - 1e-9, "more tables must not lose neighbors")
    assert(m4 > single, "the multi-table index must beat one table")
    assert(m4 >= 0.4, f"4-table LSH recall@$K collapsed: $m4%.3f")
    // the ORACLE-portable arithmetic table family (the gated s11
    // configuration) must compound the same way
    val b = e.withColumn("t", explode(expr("sequence(0, 3)")))
    val withBucket = (0 until 4).foldLeft(b.withColumn("bucket", lit(-1)))((acc, t) =>
      acc.withColumn("bucket", when(col("t") === t,
        VectorOps.bucketTableOracle(4, t) * 4 + t).otherwise(col("bucket"))))
    val m4o = recall(bucketTop(withBucket))
    println(f"ANN-RECALL lsh tables4-oracle-family=$m4o%.3f")
    assert(m4o > single, "the arithmetic table family must also beat one table")
  }

  /** codebook entries with squared norms — the ivf UDFs' input shape */
  private def withNormsL(cb: Seq[(Int, Array[Double])])
      : Seq[(Long, Array[Double], Double)] =
    cb.map { case (cid, cv) => (cid.toLong, cv, cv.map(x => x * x).sum) }

  /** ONE copy of the IVF serve pipeline (assign → probe-explode →
    * cell join → exact cosine top-K) — flat and two-level recall
    * measurements differ only in the UDF pair they pass
    */
  private def serveTop(assign: org.apache.spark.sql.expressions.UserDefinedFunction,
                       probe: org.apache.spark.sql.expressions.UserDefinedFunction)
      : Map[Long, Set[Long]] = {
    val assigned = e.withColumn("cell", assign(col("v"), col("nn")))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"),
        explode(probe(col("v"), col("nn"))).as("cell"))
    assigned.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
  }

  test("IVF nprobe=2 recall beats a single-cell probe") {
    val ivf = withNormsL(KMeansLite.fit(e, "vec_id", "v", 4, 1))
    def ivfTop(nprobe: Int): Map[Long, Set[Long]] =
      serveTop(VectorOps.ivfAssignUdf(ivf), VectorOps.ivfProbeUdf(ivf, nprobe))
    val r1 = recall(ivfTop(1))
    val r2 = recall(ivfTop(2))
    println(f"ANN-RECALL ivf nprobe=1: $r1%.3f  nprobe=2: $r2%.3f")
    assert(r2 >= r1 - 1e-9, "probing more cells must not lose neighbors")
    assert(r2 >= 0.5, f"IVF nprobe=2 recall@$K collapsed: $r2%.3f")
  }

  test("two-level cosine routing preserves flat-IVF recall (s20's trade priced)") {
    // same FINE codebook both ways — this isolates the ROUTING trade
    // (s20's coarse→in-cell approximation) from codebook quality: flat
    // assign/probe scan all k cells; two-level routes through kc=√k
    // coarse anchors at pc=2, nprobe=2. The recall delta IS the price
    // of the O(√k)-per-pass routing; COVERAGE cites the printed line.
    val k = 16
    val kc = 4
    val fine = withNormsL(KMeansLite.fit(e, "vec_id", "v", k, 1))
    val coarse = withNormsL(KMeansLite.fit(e, "vec_id", "v", kc, 1))
    val flat = recall(serveTop(VectorOps.ivfAssignUdf(fine),
      VectorOps.ivfProbeUdf(fine, 2)))
    val two = recall(serveTop(VectorOps.ivfAssignHierUdf(coarse, fine),
      VectorOps.ivfProbeHierUdf(coarse, fine, 2, 2)))
    // the recall knobs, measured: widening pc ALONE (pc=kc makes the
    // probe leg rank every fine cell — a globally-flat probe over the
    // two-level ASSIGNMENT) actually LOSES recall, because neighbors
    // were assigned through their coarse route and a query's
    // globally-nearest cells can be ones no neighbor could land in —
    // probe/assignment ROUTING CONSISTENCY beats probe width. The
    // knob that recovers is nprobe within the matched candidate set.
    val wideMismatch = recall(serveTop(
      VectorOps.ivfAssignHierUdf(coarse, fine),
      VectorOps.ivfProbeHierUdf(coarse, fine, kc, 2)))
    val wideMatched = recall(serveTop(
      VectorOps.ivfAssignHierUdf(coarse, fine),
      VectorOps.ivfProbeHierUdf(coarse, fine, 2, 4)))
    println(f"ANN-RECALL ivf-hier k=$k kc=$kc flat(nprobe=2)=$flat%.3f " +
      f"two-level(pc=2,nprobe=2)=$two%.3f pc=$kc-mismatch=$wideMismatch%.3f " +
      f"nprobe=4-matched=$wideMatched%.3f")
    // measured on this corpus: flat 0.338, two-level 0.275, pc=kc
    // 0.213 (the consistency lesson), nprobe=4 recovers past flat;
    // floors pin "small delta, no collapse, matched-widening
    // recovers", not the exact values
    assert(two >= flat - 0.15,
      f"two-level routing lost too much recall: $two%.3f vs flat $flat%.3f")
    assert(two >= 0.25, f"two-level IVF recall@$K collapsed: $two%.3f")
    // the two orderings below are measured facts about THIS corpus/
    // seed (0.275 vs 0.213; 0.463 vs 0.338), not algorithm invariants
    // — a corpus or seeding change could narrow them without a real
    // regression, so the assertions carry a 0.05 slack band while the
    // println above keeps the exact measured values on record
    assert(two >= wideMismatch - 0.05,
      "matched pc=2 probing must not lose to the mismatched global probe")
    assert(wideMatched >= flat - 0.05,
      f"nprobe=4 within the matched route must recover flat nprobe=2 " +
        f"recall: $wideMatched%.3f vs $flat%.3f")
  }

  /** s24's serve shape: assignment/probe through the centroids-as-
    * DataFrame tier (equi-join + keyed window routing, no broadcast
    * fine codebook), then the same bounded (qid, cell) frame join —
    * the DIST composition differs from serveTop's UDF explode, which
    * is exactly why its recall needs its own measurement
    */
  private def serveTopDist(coarse: Seq[(Long, Array[Double], Double)],
                           fineDf: org.apache.spark.sql.DataFrame,
                           pc: Int, nprobe: Int): Map[Long, Set[Long]] = {
    val assigned = e.join(
      VectorOps.ivfAssignHierDist(e, "vec_id", coarse, fineDf), Seq("vec_id"))
    val qBase = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"))
    val q = qBase.join(
      VectorOps.ivfProbeHierDist(qBase, "qid", coarse, fineDf, pc, nprobe),
      Seq("qid"))
    assigned.join(broadcast(q), Seq("cell"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
      .where(col("rank") <= K)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
  }

  test("the dist tier's probe path serves UDF-tier recall exactly " +
       "(s24's serve shape; the (pc,nprobe)=(2,4) default holds)") {
    // DistAssignSpec pins assignment/probe bit-parity; this pins that
    // the COMPOSED serve — bounded (qid, cell) frame join instead of
    // the UDF probe explode — inherits it end to end, so the recall
    // sweep's (pc, nprobe) guidance at ivfProbeHierUdf's definition
    // site transfers to the dist path unchanged.
    val k = 16
    val kc = 4
    val fine = withNormsL(KMeansLite.fit(e, "vec_id", "v", k, 1))
    val coarse = withNormsL(KMeansLite.fit(e, "vec_id", "v", kc, 1))
    val fineDf = spark.createDataFrame(
      java.util.Arrays.asList(fine.map { case (c, v, n) =>
        org.apache.spark.sql.Row(c, v.toSeq, n) }: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cid",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        org.apache.spark.sql.types.StructField("cn",
          org.apache.spark.sql.types.DoubleType))))
    val udf22 = serveTop(VectorOps.ivfAssignHierUdf(coarse, fine),
      VectorOps.ivfProbeHierUdf(coarse, fine, 2, 2))
    val udf24 = serveTop(VectorOps.ivfAssignHierUdf(coarse, fine),
      VectorOps.ivfProbeHierUdf(coarse, fine, 2, 4))
    val dist22 = serveTopDist(coarse, fineDf, 2, 2)
    val dist24 = serveTopDist(coarse, fineDf, 2, 4)
    println(f"ANN-RECALL ivf-hier-dist k=$k kc=$kc " +
      f"(pc=2,np=2)=${recall(dist22)}%.3f (pc=2,np=4)=${recall(dist24)}%.3f " +
      s"udf-parity=${dist22 == udf22 && dist24 == udf24}")
    assert(dist22 == udf22,
      "dist serve at (pc=2, nprobe=2) diverged from the UDF serve")
    assert(dist24 == udf24,
      "dist serve at (pc=2, nprobe=4) diverged from the UDF serve")
    // the measured default from the UDF sweep, confirmed on this path:
    // nprobe=4 within the matched route recovers flat nprobe=2 recall
    val flat = recall(serveTop(VectorOps.ivfAssignUdf(fine),
      VectorOps.ivfProbeUdf(fine, 2)))
    assert(recall(dist24) >= flat - 0.05,
      f"(2,4) on the dist path must hold flat nprobe=2 recall: " +
        f"${recall(dist24)}%.3f vs $flat%.3f")
  }

  test("PQ ADC ranking preserves most true neighbors at 16x compression") {
    val cents = KMeansLite.fit(e, "vec_id", "v", 4, 1)
      .map { case (cid, cv) => (cid.toLong, cv) }
    val enc = e.select(col("vec_id"), VectorOps.pqEncodeUdf(cents, 4)(col("v")).as("codes"))
    val q = e.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), VectorOps.pqAdcUdf(cents, 4)(col("v")).as("adc"))
    def adcShortlist(n: Int): Map[Long, Set[Long]] =
      enc.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("qid"))
        .withColumn("dist",
          expr("adc[0][codes[0]] + adc[1][codes[1]] + adc[2][codes[2]] + adc[3][codes[3]]"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("dist").asc, col("vec_id"))))
        .where(col("rank") <= n)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
    val raw = recall(adcShortlist(K))
    // the production shape: ADC shortlist (cheap, compressed domain) →
    // EXACT rerank of the shortlist with full vectors → top-K
    def rerank(shortlist: Map[Long, Set[Long]]): Map[Long, Set[Long]] = {
      import spark.implicits._
      val cand = shortlist.toSeq.flatMap { case (q2, ids) => ids.map(q2 -> _) }
        .toDF("qid", "vec_id")
      val qv = e.where(col("vec_id") < nQueries)
        .select(col("vec_id").as("qid"), col("v").as("qv"), col("nn").as("qn"))
      cand.join(e, "vec_id").join(broadcast(qv), "qid")
        .withColumn("cos", VectorOps.cosine("v", "qv", "nn", "qn"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))))
        .where(col("rank") <= K)
        .select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (q2, rs) => q2 -> rs.map(_.getLong(1)).toSet }
    }
    val rr = recall(rerank(adcShortlist(K * 10)))
    println(f"ANN-RECALL pq k=4 m=4 raw=$raw%.3f rerank(100)=$rr%.3f")
    assert(rr > raw, "exact rerank of the ADC shortlist must beat raw ADC order")
    assert(rr >= 0.4, f"PQ+rerank recall@$K collapsed: $rr%.3f")
  }
}
