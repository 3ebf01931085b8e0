package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** IVF coarse quantizer: zero-shuffle assignment, probe ordering, and
  * agreement with brute force inside the probed cells.
  */
class IvfSpec extends SparkSpec {

  val cents = Seq(
    (0L, Array(1.0, 0.0, 0.0), 1.0),
    (1L, Array(0.0, 1.0, 0.0), 1.0),
    (2L, Array(0.0, 0.0, 1.0), 1.0))

  test("assignment: argmax cosine, lowest cell id wins ties") {
    import spark.implicits._
    val df = Seq(
      (10L, Seq(0.9, 0.1, 0.0), 0.82),   // -> cell 0
      (11L, Seq(0.0, 0.2, 0.9), 0.85),   // -> cell 2
      (12L, Seq(0.5, 0.5, 0.0), 0.5))    // exact tie 0 vs 1 -> 0
      .toDF("vec_id", "v", "nn")
    val out = df.withColumn("cell", VectorOps.ivfAssignUdf(cents)(col("v"), col("nn")))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(10L -> 0L, 11L -> 2L, 12L -> 0L))
  }

  test("probe: nprobe nearest cells in similarity order") {
    import spark.implicits._
    val df = Seq((20L, Seq(0.8, 0.6, 0.0), 1.0)).toDF("vec_id", "v", "nn")
    val out = df.select(VectorOps.ivfProbeUdf(cents, 2)(col("v"), col("nn")))
      .head().getSeq[Long](0)
    assert(out == Seq(0L, 1L)) // cos 0.8 then 0.6; cell 2 (0.0) not probed
  }

  test("assignment runs without a shuffle") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, Seq(i * 0.1, 1.0, 0.5), 2.0))
      .toDF("vec_id", "v", "nn")
      .withColumn("cell", VectorOps.ivfAssignUdf(cents)(col("v"), col("nn")))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"IVF assignment must be map-only:\n${plan.take(600)}")
  }
}
