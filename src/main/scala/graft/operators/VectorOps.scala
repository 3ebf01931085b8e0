package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared embedding-vector helpers: double-cast + squared norm, cosine
  * between two vector columns, and the deterministic random-hyperplane
  * LSH bucket (integer hyperplanes — reproducible across engines, no
  * RNG state to ship to executors).
  */
object VectorOps {

  /** vec table → (vec_id, label, v: array<double>, nn: squared norm) */
  def vecs(df: DataFrame): DataFrame =
    df.withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
      .withColumn("nn", expr("aggregate(v, cast(0 as double), (a, x) -> a + x * x)"))

  /** cosine of columns `a` and `b` given squared norms `na`, `nb` */
  def cosine(a: String, b: String, na: String, nb: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x)") /
      (sqrt(col(na)) * sqrt(col(nb)))

  /** 4-bit hyperplane bucket of vector column `v`;
    * hyperplane j component i = ((i*31 + j*17) mod 7) - 3.
    */
  val bucket: Column = expr(
    """aggregate(sequence(0, 3), 0, (acc, j) -> acc +
       IF(aggregate(transform(sequence(0, size(v) - 1),
            i -> v[i] * cast((i * 31 + j * 17) % 7 - 3 as double)),
          cast(0 as double), (a, x) -> a + x) > 0, shiftleft(1, j), 0))""")

  /** DuckDB restatements (for oracle SQL) */
  val duckVecs: String =
    """SELECT vec_id, label, embedding::DOUBLE[] AS v,
       list_aggregate(list_transform(embedding::DOUBLE[], x -> x * x), 'sum') AS nn
       FROM embeddings"""

  val duckBucket: String =
    """list_aggregate(list_transform(range(4), j ->
       CASE WHEN list_aggregate(list_transform(range(1, len(v) + 1),
              i -> v[i] * (((i - 1) * 31 + j * 17) % 7 - 3)), 'sum') > 0
            THEN (1 << j) ELSE 0 END), 'sum')"""
}
