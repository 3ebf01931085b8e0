package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** cosine_sim native expression: bit parity with the interpreted
  * higher-order formulation, null handling, float coercion, codegen.
  */
class CosineSimSpec extends SparkSpec {

  private def registered() = { graft.GraftExtensions.registerNative(spark); spark }

  test("bit-identical to the aggregate(zip_with(...)) formulation") {
    import spark.implicits._
    registered()
    val df = (0 until 200).map { i =>
      (i.toLong, (0 until 64).map(j => math.sin(i * 64 + j)),
        (0 until 64).map(j => math.cos(i * 7 + j)))
    }.toDF("id", "a", "b")
      .withColumn("na", expr("aggregate(a, cast(0 as double), (s, x) -> s + x * x)"))
      .withColumn("nb", expr("aggregate(b, cast(0 as double), (s, x) -> s + x * x)"))
    val out = df.select(
      expr("cosine_sim(a, b, na, nb)").as("fast"),
      (expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)") /
        (sqrt(col("na")) * sqrt(col("nb")))).as("slow"))
      .collect()
    out.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"bit mismatch: $r")
    }
  }

  test("null inputs -> null; float arrays and int norms coerce") {
    import spark.implicits._
    registered()
    val r = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)))
      .toDF("fa", "fb")
      .selectExpr("cosine_sim(fa, fb, 1, 1) AS c",
        "cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), fb, 1, 1) AS n")
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.isNullAt(1))
  }

  test("whole-stage codegen compiles the expression (no fallback)") {
    registered()
    // parquet source, so ConvertToLocalRelation can't pre-evaluate the
    // projection — the expression must survive real codegen
    val df = graft.operators.VectorOps.vecs(
      graft.sources.Tables.embeddings(spark, sfDir))
      .selectExpr("cosine_sim(v, v, nn, nn) AS c")
    val rows = df.collect() // forces the generated code to compile and run
    assert(rows.forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-9))
    // the `*(n)` prefix marks a WholeStageCodegen stage; the
    // cosine_sim Project must carry it (no CodegenFallback demotion)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_sim") && l.trim.startsWith("*(")), plan.take(500))
  }
}
