package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HllSketch properties: estimate accuracy at several cardinalities
  * (fixed data ⇒ deterministic error; bound = 3σ ≈ 20% for m = 256),
  * merge-by-max correctness (the property that makes the sketch a
  * distributed aggregate), and determinism across partitionings.
  */
class HllSketchSpec extends SparkSpec {

  private def estimate(n: Long): (Double, Long) = {
    val df = spark.range(n).select(col("id"), lit("g").as("g"))
    val row = HllSketch.summary(df, col("id"), Seq("g")).collect()(0)
    val est = HllSketch.estimateCorrected(
      row.getAs[Long]("n_nonempty"), row.getAs[Double]("est_raw"))
    (est, n)
  }

  test("corrected estimate lands within 3 sigma at 100 / 10k / 300k") {
    for (n <- Seq(100L, 10000L, 300000L)) {
      val (est, exact) = estimate(n)
      val relErr = math.abs(est - exact) / exact
      assert(relErr < 0.20, f"n=$n est=$est%.1f relErr=$relErr%.3f")
    }
  }

  test("sketches merge by max: halves merged equal the full registers") {
    val full = spark.range(50000).select(col("id"), lit("g").as("g"))
    val a = full.where(col("id") % 2 === 0)
    val b = full.where(col("id") % 2 === 1)
    val fullRegs = HllSketch.registers(full, col("id"), Seq("g"))
    val merged = HllSketch.registers(a, col("id"), Seq("g"))
      .unionByName(HllSketch.registers(b, col("id"), Seq("g")))
      .groupBy("g", "__bucket").agg(max("register").as("register"))
    assert(merged.exceptAll(fullRegs).isEmpty && fullRegs.exceptAll(merged).isEmpty,
      "max-merge of partial sketches must equal the full sketch")
  }

  test("summary is partition-order independent") {
    val base = graft.sources.Tables.lineitem(spark, sfDir)
    val s1 = HllSketch.summary(base, col("l_orderkey"), Seq("l_returnflag"))
      .orderBy("l_returnflag").collect().toSeq
    val s2 = HllSketch.summary(base.repartition(13), col("l_orderkey"),
        Seq("l_returnflag"))
      .orderBy("l_returnflag").collect().toSeq
    assert(s1 == s2)
  }

  test("null keys drop from the sketch like count(distinct) drops them") {
    import spark.implicits._
    val df = Seq(Some(1L), Some(2L), None, Some(1L)).toDF("k")
      .select(col("k"), lit("g").as("g"))
    val row = HllSketch.summary(df, col("k"), Seq("g")).collect()(0)
    // 2 distinct non-null values -> at most 2 non-empty buckets
    assert(row.getAs[Long]("n_nonempty") <= 2L)
  }
}
