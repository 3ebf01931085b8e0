package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gated query: a Spark plan plus (when SQL-expressible) the DuckDB
  * oracle the driver compares it against.
  *
  * Conventions that keep the hash-compare exact across engines:
  *  - money/value aggregates go through DECIMAL casts (order-independent
  *    exact arithmetic; double summation order varies across partitions)
  *  - int32 source columns are cast to BIGINT when projected
  *  - event-time comparisons use raw epoch-nanos (`ts_ns`), never the
  *    truncated microsecond timestamp
  *  - every aggregate/computed column is aliased identically in the
  *    Spark plan and the oracle SQL
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]
}
