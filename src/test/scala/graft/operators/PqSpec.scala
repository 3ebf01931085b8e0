package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Product-quantization tier: code validity, determinism, and the ADC
  * floor property — a query scored against its OWN codes hits the
  * per-subspace minima, so no corpus vector can score lower.
  */
class PqSpec extends SparkSpec {

  private def centsOf(e: org.apache.spark.sql.DataFrame) =
    e.where(col("vec_id") < 4).select("vec_id", "v").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq

  test("codes are m=4 ints within the codebook range") {
    val e = VectorOps.vecs(graft.sources.Tables.embeddings(spark, sfDir))
    val cents = centsOf(e)
    val enc = e.select(VectorOps.pqEncodeUdf(cents, 4)(col("v")).as("codes"))
    assert(enc.where(size(col("codes")) =!= 4).count() == 0)
    assert(enc.where(expr("exists(codes, c -> c < 0 OR c > 3)")).count() == 0)
  }

  test("ADC self-score is the global minimum over the corpus") {
    val e = VectorOps.vecs(graft.sources.Tables.embeddings(spark, sfDir))
    val cents = centsOf(e)
    val enc = e.select(col("vec_id"), VectorOps.pqEncodeUdf(cents, 4)(col("v")).as("codes"))
    val q = e.where(col("vec_id") === 7)
      .select(col("vec_id").as("qid"), VectorOps.pqAdcUdf(cents, 4)(col("v")).as("adc"))
    val scored = enc.crossJoin(broadcast(q))
      .withColumn("dist",
        expr("adc[0][codes[0]] + adc[1][codes[1]] + adc[2][codes[2]] + adc[3][codes[3]]"))
    val self = scored.where(col("vec_id") === 7).select("dist").collect()(0).getDouble(0)
    val minAll = scored.agg(min("dist")).collect()(0).getDouble(0)
    assert(self == minAll, s"self=$self min=$minAll")
  }

  test("encode and ADC are deterministic across invocations") {
    val e = VectorOps.vecs(graft.sources.Tables.embeddings(spark, sfDir))
    val cents = centsOf(e)
    def run() = e.select(col("vec_id"),
      VectorOps.pqEncodeUdf(cents, 4)(col("v")).as("codes"))
      .orderBy("vec_id").collect().map(_.toString).toSeq
    assert(run() == run())
  }
}
