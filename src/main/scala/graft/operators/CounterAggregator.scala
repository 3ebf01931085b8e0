package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Counter-map merge aggregator (A3): the reference accumulates
  * per-document `Counter` dicts of lemmas/POS across chunks, then rolls
  * them up chamber → court → canton (`scrc/preprocessors/
  * abstract_preprocessor.py:343-410`, `count_computer.py:40-87`).
  *
  * Preferred Spark shape is explode + groupBy().count() (columnar,
  * codegen, partial agg — used by TextQueries.t4); this Aggregator is
  * for when the MAP ITSELF is the value (counter columns stored per
  * chamber, merged upward), matching the reference's
  * `counter_lemma JSONB` columns. Partial merges happen map-side
  * (Aggregator.merge), so the shuffle carries one map per group.
  */
object CounterAggregator
  extends Aggregator[Map[String, Long], Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(acc: Map[String, Long], row: Map[String, Long]): Map[String, Long] =
    merge(acc, row)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    // fold the smaller map into the larger one
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
  }

  override def finish(acc: Map[String, Long]): Map[String, Long] = acc

  private val mapEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  override def bufferEncoder: Encoder[Map[String, Long]] = mapEncoder

  override def outputEncoder: Encoder[Map[String, Long]] = mapEncoder
}
