package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One gated query: a Spark plan plus (when SQL-expressible) the DuckDB
  * oracle the driver compares it against.
  *
  * Conventions that keep the hash-compare exact across engines:
  *  - money/value aggregates ACCUMULATE in DECIMAL (order-independent
  *    exact arithmetic; double summation order varies across partitions)
  *    but the FINAL output column is cast to DOUBLE on both sides —
  *    decimal stringification differs between engines (trailing zeros),
  *    decimal→nearest-double is bit-identical
  *  - int32 source columns are cast to BIGINT when projected
  *  - event-time JOIN/COMPARE logic runs on raw epoch-nanos (`ts_ns`);
  *    OUTPUT columns are epoch-micros (`ts_us`) because the DuckDB
  *    oracle's timestamps are µs-precision
  *  - every aggregate/computed column is aliased identically in the
  *    Spark plan and the oracle SQL
  */
final case class Q(name: String,
                   fn: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

trait QueryPack {
  def all: Seq[Q]

  /** Run `body` with a session conf temporarily set, restoring the prior
    * value (or unsetting) afterwards — analyzer confs only need to hold
    * while the DataFrame is CONSTRUCTED (analysis is eager), so scoping
    * them here keeps one query's workaround from leaking into the rest
    * of the session.
    */
  protected def withConf[T](s: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = s.conf.getOption(key)
    s.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }
}
