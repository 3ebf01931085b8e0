package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"),
      (2L, 15L, "l3"), (3L, 100L, "l4")
    ).toDF("k", "t", "lval")
    val right = Seq(
      (1L, 8L, "r1"), (1L, 10L, "r2"), (1L, 19L, "r3"),
      (2L, 30L, "r4")
    ).toDF("k", "t", "rval")
    (left, right)
  }

  test("joinBackward picks the latest right row with ord <= left ord") {
    val (l, r) = fixture
    val out = AsOfJoin.joinBackward(l, r, Seq("k"), "t", "t", Seq("rval"))
      .select("k", "t", "lval", "asof_rval")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        Option(x.getString(3)))).toSet
    assert(out == Set(
      (1L, 10L, "l1", Some("r2")),  // tie: inclusive picks equal ts
      (1L, 20L, "l2", Some("r3")),
      (1L, 5L, "l0", None),         // nothing before
      (2L, 15L, "l3", None),        // right exists only after
      (3L, 100L, "l4", None)))      // key absent on right
  }

  test("strict mode excludes equal ordinates") {
    val (l, r) = fixture
    val out = AsOfJoin.joinBackward(l, r, Seq("k"), "t", "t", Seq("rval"),
        strict = true)
      .where(col("t") === 10L && col("k") === 1L)
      .select("asof_rval").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("r1")) // r2@10 excluded
  }

  test("matches the naive pair-join formulation on real data") {
    val ev = graft.sources.Tables.events(spark, sfDir)
    val clicks = ev.where(col("event_type") === "click")
      .select("event_id", "user_id", "ts_ns")
    val purchasesR = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id").as("p_id"))
    val purchases = purchasesR.withColumnRenamed("ts_ns", "p_ts")

    val fast = AsOfJoin.joinBackward(clicks, purchasesR,
        Seq("user_id"), "ts_ns", "ts_ns", Seq("p_id"))
      .select(col("event_id"), col("asof_p_id"))

    val w = Window.partitionBy("event_id").orderBy(col("p_ts").desc, col("p_id").desc)
    val naive = clicks.join(purchases,
        clicks("user_id") === purchases("user_id") && col("p_ts") <= col("ts_ns"), "left")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("event_id"), col("p_id"))

    val f = fast.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val n = naive.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(f == n)
  }

  test("joinForward runs as an O(n) running frame, never UnboundedFollowing (ADVICE r9)") {
    val (l, r) = fixture
    val plan = AsOfJoin.joinForward(l, r, Seq("k"), "t", "t", Seq("rval"))
      .queryExecution.executedPlan.toString.toLowerCase
    // [currentRow, unboundedFollowing] lowers to Spark's
    // UnboundedFollowingWindowFunctionFrame, which recomputes from each
    // row to the partition end — O(n^2) per key group on hot keys. The
    // descending-sort rewrite must keep the frame a running
    // [unboundedPreceding, currentRow].
    assert(!plan.contains("unboundedfollowing"), plan.take(800))
    assert(plan.contains("unboundedpreceding"), plan.take(800))
  }

  test("rangeCount counts right rows in [lower, upper) per left row") {
    val (l, r) = fixture
    val out = AsOfJoin.rangeCount(l, r, Seq("k"),
        l("t") - 5, l("t") + 5, r("t"), "n_in_range")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2)) -> x.getLong(3)).toMap
    assert(out((1L, 10L, "l1")) == 2)  // r1@8, r2@10 in [5,15)
    assert(out((1L, 20L, "l2")) == 1)  // r3@19 in [15,25)
    assert(out((3L, 100L, "l4")) == 0) // key absent → left join keeps row, count 0
  }

  test("rangeCount preserves duplicate left rows (one output row each)") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 10L), (1L, 10L)).toDF("k", "t") // exact dups
    val r = Seq((1L, 9L), (1L, 11L)).toDF("k", "t")
    val out = AsOfJoin.rangeCount(l, r, Seq("k"),
      l("t") - 5, l("t") + 5, r("t"), "n")
    assert(out.count() == 3, "duplicate left rows must not collapse")
    assert(out.collect().forall(_.getLong(2) == 2))
  }
}
