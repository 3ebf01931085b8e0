package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** GlobalRank must equal Spark's own single-partition window ntile on
  * every row — same formula, distributed plan.
  */
class GlobalRankSpec extends SparkSpec {

  test("global rank equals row_number over the unpartitioned window") {
    import spark.implicits._
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i)).toDF("v", "id")
      .repartition(13)
    val got = GlobalRank.withGlobalRank(df, Seq(col("v"), col("id")), "r")
    val want = df.withColumn("r",
      row_number().over(Window.orderBy("v", "id")).cast("long"))
    assert(got.select("v", "id", "r").except(want.select("v", "id", "r")).isEmpty)
    assert(want.select("v", "id", "r").except(got.select("v", "id", "r")).isEmpty)
  }

  test("ntileGlobal equals window ntile, including uneven buckets") {
    import spark.implicits._
    for (n <- Seq(7, 100, 1001); k <- Seq(3, 4)) {
      val df = (1 to n).map(i => ((i * 31) % 97, i)).toDF("v", "id")
        .repartition(7)
      // smallInputRows = 0 forces the DISTRIBUTED plan — the equality
      // under test; the default dispatch would route these tiny inputs
      // to the plain window and compare it against itself
      val got = GlobalRank.ntileGlobal(df, k, Seq(col("v"), col("id")), "q", 0L)
      val want = df.withColumn("q",
        ntile(k).over(Window.orderBy("v", "id")).cast("long"))
      assert(got.select("id", "q").except(want.select("id", "q")).isEmpty,
        s"n=$n k=$k")
      assert(want.select("id", "q").except(got.select("id", "q")).isEmpty,
        s"n=$n k=$k")
    }
  }

  test("adaptive dispatch: small input takes the plain window, large the range exchange") {
    import spark.implicits._
    val small = (1 to 500).map(i => (i % 50, i)).toDF("v", "id")
    val smallPlan = GlobalRank.ntileGlobal(small, 4, Seq(col("v"), col("id")), "q")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!smallPlan.contains("rangepartitioning"), "small input should use the plain window")

    val large = spark.range(2L << 20).select((col("id") % 1000).as("v"), col("id"))
    val largePlan = GlobalRank.ntileGlobal(large, 4, Seq(col("v"), col("id")), "q")
      .queryExecution.executedPlan.toString.toLowerCase
    assert(largePlan.contains("rangepartitioning"), "large input should use the distributed plan")

    // both dispatch targets agree on the small input
    val got = GlobalRank.ntileGlobal(small, 4, Seq(col("v"), col("id")), "q")
    val want = small.withColumn("q",
      ntile(4).over(Window.orderBy("v", "id")).cast("long"))
    assert(got.select("id", "q").except(want.select("id", "q")).isEmpty)
  }

  test("withGlobalRankReleasable hands back a working release handle") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i)).toDF("v", "id")
    val (ranked, release) = GlobalRank.withGlobalRankReleasable(
      df, Seq(col("v"), col("id")), "r")
    assert(ranked.count() == 100)
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    assert(cachedBefore > 0)
    release()
    assert(spark.sparkContext.getPersistentRDDs.size < cachedBefore)
  }

  test("plan range-partitions the data instead of a single partition") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i)).toDF("v", "id")
    val plan = GlobalRank.withGlobalRank(df, Seq(col("v"), col("id")), "r")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val df = Seq.empty[(Int, Int)].toDF("v", "id")
    assert(GlobalRank.ntileGlobal(df, 4, Seq(col("v")), "q").count() == 0)
  }

  test("global prefix sum equals the unpartitioned running-total window") {
    import spark.implicits._
    val df = (1 to 997).map(i => ((i * 7919) % 1000, i, (i % 13) + 1L))
      .toDF("v", "id", "toks").repartition(13)
    val got = GlobalRank.withGlobalPrefixSum(
      df, Seq(col("v"), col("id")), col("toks"), "cum")
    val want = df.withColumn("cum",
      sum("toks").over(Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("id", "cum").except(want.select("id", "cum")).isEmpty)
    assert(want.select("id", "cum").except(got.select("id", "cum")).isEmpty)
  }

  test("prefix-sum plan range-partitions; running sums stay partition-parallel") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i % 10, i, 1L)).toDF("v", "id", "toks")
    val plan = GlobalRank.withGlobalPrefixSum(
        df, Seq(col("v"), col("id")), col("toks"), "cum")
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
    // every window in the plan is keyed on __pid: the running sum is
    // PARTITIONED by it (parallel), and the only unpartitioned window
    // orders the ≤numPartitions-row offset table by it — no window
    // ever runs unpartitioned over the data itself
    val windowLines = plan.linesIterator.filter(_.contains("Window ")).toSeq
    assert(windowLines.nonEmpty && windowLines.forall(_.contains("__pid")), plan)
  }

  test("prefix sum with a descending sort key (best-first budget order)") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i % 7, i, i.toLong)).toDF("q", "id", "toks")
      .repartition(5)
    val got = GlobalRank.withGlobalPrefixSum(
      df, Seq(col("q").desc, col("id")), col("toks"), "cum")
    val want = df.withColumn("cum",
      sum("toks").over(Window.orderBy(col("q").desc, col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(got.select("id", "cum").except(want.select("id", "cum")).isEmpty)
    assert(want.select("id", "cum").except(got.select("id", "cum")).isEmpty)
  }
  test("bytes-only estimates assume 1 compressed byte per row (ADVICE r3)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("grank").toString
    (1 to 2000).map(i => (i.toLong, s"v$i")).toDF("id", "s")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val size = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val est = GlobalRank.estimatedRows(df)
    // parquet stats carry no rowCount here — the estimate must treat
    // every on-disk byte as a potential row (compressed sources), not
    // divide by a decompressed row width
    assert(est.isDefined && est.get >= size,
      s"estimate ${est} must be >= on-disk size $size")
  }
}
