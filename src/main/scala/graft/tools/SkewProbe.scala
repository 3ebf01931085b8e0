package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew evidence for the relational/J2 family (VERDICT r3 item 7).
  *
  * A Zipf-skewed child table (one decision_id owning 25% of all rows)
  * drives the three shapes:
  *   - `agg_count` — MapJoin.aggregateJoin with algebraic aggs: the
  *     map-side partial aggregation absorbs the hot key before the
  *     shuffle; expected flat.
  *   - `collect_hot` — MapJoin.collectJoin: collect_list is holistic,
  *     so ONE reducer must hold the hot key's array — the output row
  *     itself is that array, irreducible by any split. Measured to
  *     show it is bounded by hot-key volume, not corpus size.
  *   - `raw_join` — the unaggregated child joined to the fact table
  *     (sort-merge forced): the shape AQE's skew-join split applies
  *     to. Measured with AQE skew split ON vs OFF, plus the
  *     Salting.saltedJoin alternative; the executed plan is checked
  *     for the `skew=true` marker.
  *
  * Thresholds are lowered so the 1M-row hot partition (~tens of MB)
  * crosses AQE's split trigger — at production scale the defaults
  * (256 MB) trigger on their own.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "512k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nChild = 4000000L
    val nKeys = 200000L
    // 25% of child rows land on key 0; the rest spread uniformly
    val child = spark.range(nChild).select(
      when(col("id") % 4 === 0, 0L)
        .otherwise(pmod(col("id") * 2654435761L, lit(nKeys))).as("decision_id"),
      // xxhash payload keeps shuffle blocks incompressible, so the
      // MapStatus sizes AQE reads reflect the true hot-block volume
      xxhash64(col("id")).as("v"))
    val fact = spark.range(nKeys).select(col("id").as("decision_id"),
      (col("id") % 13).as("f"))

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"SKEW $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }

    // warm
    child.count(); fact.count()

    t("agg_count") {
      graft.operators.MapJoin.aggregateJoin(fact, child, "decision_id",
        Seq(count(lit(1)).as("n"), sum("v").as("sv"))).count()
    }
    t("collect_hot") {
      graft.operators.MapJoin.collectJoin(fact, child, "decision_id", "vs", col("v"))
        .select(max(size(col("vs")))).collect()(0).getInt(0).toLong
    }
    def rawJoin() = fact.join(child, Seq("decision_id")).groupBy("f")
      .agg(count(lit(1)).as("n"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t("raw_join_skewjoin_off") { rawJoin().count() }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t("raw_join_skewjoin_on") { rawJoin().count() }
    val plan = {
      // collect() drives THIS dataset's queryExecution (count() would
      // plan its own), so executedPlan shows the final adaptive plan
      val df = rawJoin(); df.collect()
      df.queryExecution.executedPlan.toString
    }
    println(s"SKEW aqe_skew_marker_present=${plan.contains("skew=true") || plan.contains("isSkewJoin=true")}")
    println("SKEW plan: " + plan.linesIterator
      .filter(l => l.contains("SortMergeJoin") || l.contains("skewed"))
      .map(_.trim).take(4).mkString(" | "))
    t("salted_join") {
      graft.operators.Salting.saltedJoin(child, fact, "decision_id", 16)
        .groupBy("f").agg(count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
