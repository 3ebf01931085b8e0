package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the Morton interleave bit-exactly, the layout's two-dimensional
  * pruning claim on a synthetic uniform grid, and write round-trip
  * exactness.
  */
class ZOrderSpec extends SparkSpec {

  test("morton interleaves bits: a at even positions, b at odd") {
    import spark.implicits._
    val rows = Seq((3L, 0L), (0L, 3L), (3L, 3L), (0b101L, 0b011L))
      .toDF("a", "b")
      .select(ZOrder.morton(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // spread(3)=0b101, spread(5)=0b10001, spread(3)<<1=0b1010
    assert(rows.toSeq == Seq(5L, 10L, 15L, 0b011011L))
  }

  test("layout prunes on BOTH dimensions of a uniform grid") {
    import spark.implicits._
    // 64×64 grid in scrambled input order — the layout must recover
    // spatial locality that the input order does not have
    val grid = spark.range(4096)
      .select((col("id") * 2654435761L % 4096).as("k"))
      .select((col("k") % 64).as("x"), expr("k div 64").as("y"))
    val dir = graft.queries.Scratch.dir("zorder_grid_").toString + "/g"
    ZOrder.writeLayout(grid, dir, "x", "y", 16)
    val boxes = ZOrder.fileBoxes(spark.read.parquet(dir), "x", "y").collect()
    assert(boxes.length >= 8)
    def hits(lo1: Long, hi1: Long, lo2: Long, hi2: Long): Int =
      ZOrder.boxHits(boxes, lo1, hi1, lo2, hi2)
    // a 16-file Morton layout of a 64×64 grid is ~a 4×4 macro-grid:
    // one-eighth slabs on EITHER axis touch at most half the files —
    // the single-key-sorted counterfactual reads 100% on its non-sort
    // axis
    assert(hits(0, 7, 0, 63) * 2 <= boxes.length)
    assert(hits(0, 63, 0, 7) * 2 <= boxes.length)
    // and a small 2-D box touches very few
    assert(hits(0, 7, 0, 7) * 4 <= boxes.length)
  }

  test("equi-depth binning keeps pruning under outlier skew where linear scaling degenerates") {
    import spark.implicits._
    // the degenerate case for min/max scaling is OUTLIER-driven span
    // inflation (sentinel ids, 9999-12-31 timestamps): 8 rows at
    // x = 2^40 stretch the span so far that all 4096 real rows
    // (x uniform in 0..1023) collapse onto scaled code 0 — zero
    // x-resolution, the Morton curve becomes y-only, and x-slab
    // predicates stop pruning entirely. Quantile bins shrug: the
    // outliers own the top bin, the real mass keeps full resolution.
    val base = spark.range(4096)
      .select((col("id") * 2654435761L % 4096).as("k"))
      .select((col("k") % 1024).as("x"), (col("k") % 64).as("y"))
      .unionAll(spark.range(8).select((col("id") + (1L << 40)).as("x"),
        (col("id") % 64).as("y")))
    val lin = graft.queries.Scratch.dir("zorder_skew_lin_").toString + "/l"
    val eqd = graft.queries.Scratch.dir("zorder_skew_eq_").toString + "/e"
    ZOrder.writeLayout(base, lin, "x", "y", 16)
    ZOrder.writeLayoutEqDepth(base, eqd, "x", "y", 16, bins = 256)
    // x-slab = bottom eighth of the real x range, all y — the
    // dimension the collapsed layout cannot prune
    def hits(dir: String): (Int, Int) = {
      val boxes = ZOrder.fileBoxes(spark.read.parquet(dir), "x", "y").collect()
      (ZOrder.boxHits(boxes, Long.MinValue, 127L, Long.MinValue, Long.MaxValue),
        boxes.length)
    }
    val (eHits, eN) = hits(eqd)
    val (lHits, lN) = hits(lin)
    assert(eHits * 10 <= eN * 6, s"eqdepth x-slab hits $eHits/$eN")
    assert(lHits * 10 >= lN * 8, s"linear should have degenerated, hit $lHits/$lN")
    // rewrite exactness as a MULTISET compare — this fixture has every
    // (x, y) row at multiplicity 4, where count + set-except would miss
    // a duplication/loss that redistributes multiplicities
    val back = spark.read.parquet(eqd)
    val bm = back.groupBy("x", "y").count()
    val sm = base.groupBy("x", "y").count()
    assert(bm.except(sm).isEmpty && sm.except(bm).isEmpty)
  }

  test("empty and all-null inputs degrade to a plain write, never an NPE") {
    import spark.implicits._
    val empty = Seq.empty[(java.lang.Long, java.lang.Long)].toDF("a", "b")
    val nulls = Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(2L))).toDF("a", "b")
    for ((df, n) <- Seq((empty, 0L), (nulls, 2L)); eq <- Seq(false, true)) {
      val dir = graft.queries.Scratch.dir("zorder_null_").toString + "/t"
      if (eq) ZOrder.writeLayoutEqDepth(df, dir, "a", "b", 2, bins = 4)
      else ZOrder.writeLayout(df, dir, "a", "b", 2)
      assert(spark.read.parquet(dir).count() == n)
    }
  }

  test("writeLayout is an exact rewrite (no loss, no duplication)") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(col("id").as("a"), (col("id") * 7 % 97).as("b"))
    val dir = graft.queries.Scratch.dir("zorder_rt_").toString + "/t"
    ZOrder.writeLayout(df, dir, "a", "b", 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.select("a", "b").except(df).isEmpty &&
      df.except(back.select("a", "b")).isEmpty)
  }
}
