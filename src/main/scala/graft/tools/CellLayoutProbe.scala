package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures WHY the `cell=<id>` directory-per-cell IVF layout dies at
  * high cell counts and what the bucketed-cell layout (cell_bucket =
  * cell % B partitions, cell a cell-sorted data column) buys — the
  * PERF.md before/after for the s26–s29 store tier (VERDICT r12
  * directive 1).
  *
  * Per (layout, ncells) rung it times, on a synthetic store of
  * 2 rows/cell:
  *   - `write`: landing the store (the flat layout opens one file per
  *     cell per task; the bucketed layout one file per bucket)
  *   - `list`: cold partition discovery — `spark.read.parquet(dir)`
  *     forces the InMemoryFileIndex listing of every partition dir
  *     (the object-store metadata wall; local ext4 is the FLOOR of
  *     this cost — S3-class stores pay 1–2 orders of magnitude more
  *     per directory call)
  *   - `serve`: a probed read of 4 cells through a FRESH session-less
  *     read (prune + scan + count)
  *   - `files`: total data files (the compaction/open-cost proxy)
  *
  * The flat ladder stops early once a rung's write exceeds the budget
  * (default 600 s) — the point is the curve, not waiting out the wall.
  * Output: one `CELLS ...` line per rung, machine-readable.
  */
object CellLayoutProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // partition discovery at 2e5 dirs exceeds the default 32MB
      // driver-side listing parallelism threshold — irrelevant here,
      // but keep the session vanilla otherwise
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val ladder = sys.env.get("SPARK_GRAFT_CELL_LADDER")
      .map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(10000, 50000, 100000, 200000))
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_CELL_BUDGET", "600").toDouble
    val buckets = sys.env.getOrElse("SPARK_GRAFT_CELL_BUCKETS", "4096").toInt
    // e.g. SPARK_GRAFT_CELL_LAYOUTS=bucketed to extend the bucketed
    // curve past cell counts the flat layout cannot finish at all
    val layouts = sys.env.getOrElse("SPARK_GRAFT_CELL_LAYOUTS", "flat,bucketed")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def countFiles(dir: java.io.File): Int =
      if (dir.isDirectory) dir.listFiles.map(countFiles).sum
      else if (dir.getName.endsWith(".parquet")) 1 else 0
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
    }

    // warmup: one tiny store per layout so JVM/codegen/committer
    // spin-up is not charged to the first rung
    locally {
      val wBase = graft.queries.Scratch.dir("cellprobe_warm_")
      val wdf = spark.range(0, 64)
        .select(col("id").as("vec_id"), (col("id") % 8).as("cell"))
      wdf.write.partitionBy("cell").parquet(wBase.resolve("f").toString)
      graft.operators.VectorOps.committedBucketedCellAppend(
        wdf, wBase.resolve("b").toString, -1L, buckets)
      spark.read.parquet(wBase.resolve("f").toString).count()
      spark.read.parquet(wBase.resolve("b").toString).count()
      rmrf(wBase)
    }

    var flatDead = false
    for (n <- ladder; layout <- layouts) {
      if (layout == "flat" && flatDead) {
        println(f"CELLS layout=flat     ncells=$n%7d SKIPPED (previous rung exceeded ${budgetSec}%.0f s write budget)")
      } else {
        val base = graft.queries.Scratch.dir(s"cellprobe_${layout}_${n}_")
        val dir = base.resolve("ivf").toString
        val df = spark.range(0, 2L * n)
          .select(col("id").as("vec_id"), (col("id") % n).as("cell"))
        val (_, wSec) = time {
          if (layout == "flat")
            df.repartition(col("cell") % 32).sortWithinPartitions("cell")
              .write.partitionBy("cell").parquet(dir)
          else
            graft.operators.VectorOps.committedBucketedCellAppend(
              df, dir, -1L, buckets)
        }
        // cold listing: a fresh read forces full partition discovery
        val (_, lSec) = time { spark.read.parquet(dir).schema }
        // probed serve: 4 cells; flat prunes dirs, bucketed prunes
        // buckets + pushes In(cell) into the scan
        val probedCells = Seq(3L, n / 3L, n / 2L, n - 1L)
        val (_, sSec) = time {
          val r = spark.read.parquet(dir)
          val pruned =
            if (layout == "flat")
              r.where(col("cell").isin(probedCells.map(_.toInt): _*))
            else
              r.where(col("cell_bucket").isin(
                  probedCells.map(c => (c % buckets).toInt).distinct: _*))
                .where(col("cell").isin(probedCells: _*))
          require(pruned.count() == 8L, "probe read lost rows")
        }
        val files = countFiles(new java.io.File(dir))
        println(f"CELLS layout=$layout%-8s ncells=$n%7d write=$wSec%8.2fs list=$lSec%7.2fs serve=$sSec%6.2fs files=$files%7d")
        if (layout == "flat" && wSec > budgetSec) flatDead = true
        rmrf(base)
      }
    }
    spark.stop()
  }
}
