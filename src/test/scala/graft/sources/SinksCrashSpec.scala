package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Crash-safety of the write layer: simulate dying in each window of
  * `compact`'s rename swap and mid-`upsertBucketed` (partial bucket
  * application), then assert the next call heals with zero data loss —
  * the durability story the code's recovery comments promise.
  */
class SinksCrashSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).resolve("out").toString

  private def rowsOf(path: String): Map[Long, String] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap

  private def fs = org.apache.hadoop.fs.FileSystem.get(
    spark.sparkContext.hadoopConfiguration)

  test("compact: crash BEFORE the first rename (stale tmp) is harmless") {
    import spark.implicits._
    val path = tmp("c1")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(path)
    val want = rowsOf(path)
    // leftover tmp from a compact that died mid-write: partial garbage
    Seq((999L, "garbage")).toDF("id", "v").write.parquet(path + "__compact_tmp")
    Sinks.compact(spark, path, targetFileBytes = 1L << 30)
    assert(rowsOf(path) == want)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__compact_tmp")))
  }

  test("compact: crash BETWEEN the renames (path absent, tmp complete) recovers from tmp") {
    import spark.implicits._
    val path = tmp("c2")
    (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(8).write.parquet(path)
    val want = rowsOf(path)
    // reproduce the exact crash window: tmp fully written, dst renamed
    // aside, second rename never happened
    val df = spark.read.parquet(path)
    df.repartition(1).write.parquet(path + "__compact_tmp")
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__compact_old"))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path)))

    Sinks.compact(spark, path, targetFileBytes = 1L << 30)
    assert(rowsOf(path) == want, "recovery must restore every row from tmp")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__compact_tmp")))
  }

  test("compact: crash with only the renamed-aside dir (no tmp) rolls back") {
    import spark.implicits._
    val path = tmp("c3")
    (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").write.parquet(path)
    val want = rowsOf(path)
    fs.rename(new org.apache.hadoop.fs.Path(path),
      new org.apache.hadoop.fs.Path(path + "__compact_old"))
    Sinks.compact(spark, path, targetFileBytes = 1L << 30)
    assert(rowsOf(path) == want, "rollback must restore the old dir")
  }

  test("compact: normal run preserves rows and reduces file count") {
    import spark.implicits._
    val path = tmp("c4")
    (1L to 200L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(16).write.parquet(path)
    val want = rowsOf(path)
    val filesBefore = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.endsWith(".parquet"))
    Sinks.compact(spark, path, targetFileBytes = 1L << 30)
    val filesAfter = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(rowsOf(path) == want)
    assert(filesAfter < filesBefore)
  }

  test("upsertBucketed: a partially-applied batch re-run heals with no loss or dupes") {
    import spark.implicits._
    val path = tmp("u1")
    val base = (1L to 40L).map(i => (i, s"old$i")).toDF("id", "v")
    Sinks.upsertBucketed(base, path, "id", numBuckets = 4)

    // the intended batch touches keys in SEVERAL buckets; a crash mid-
    // dynamic-overwrite applies only some buckets. Reproduce that state
    // by applying the batch restricted to one bucket's keys...
    val batch = Seq((1L, "new1"), (2L, "new2"), (3L, "new3"), (4L, "new4"))
      .toDF("id", "v")
    val bucketOf = batch
      .withColumn("__b", pmod(xxhash64(col("id")), lit(4)))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val someBucket = bucketOf(1L)
    val partial = batch.where(
      pmod(xxhash64(col("id")), lit(4)) === someBucket)
    Sinks.upsertBucketed(partial, path, "id", numBuckets = 4)

    // ...then re-run the FULL batch, as a restarted job would
    Sinks.upsertBucketed(batch, path, "id", numBuckets = 4)
    val got = Sinks.readUpserted(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    val want = (1L to 40L).map(i =>
      i -> (if (i <= 4) s"new$i" else s"old$i")).toMap
    assert(got == want)
    assert(Sinks.readUpserted(spark, path).count() == 40)
  }

  test("upsertBucketed: crash BETWEEN the swap renames (bucket aside, no replacement) rolls back") {
    import spark.implicits._
    val path = tmp("u2")
    val base = (1L to 40L).map(i => (i, s"old$i")).toDF("id", "v")
    Sinks.upsertBucketed(base, path, "id", numBuckets = 4)
    val want = Sinks.readUpserted(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    // reproduce the exact window: one bucket renamed aside to
    // __upsert_old, its replacement rename never happened, tmp partial
    val bucketDirs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("__bucket=")).map(_.getPath)
    assert(bucketDirs.nonEmpty)
    val old = new org.apache.hadoop.fs.Path(path + "__upsert_old")
    fs.mkdirs(old)
    fs.rename(bucketDirs.head,
      new org.apache.hadoop.fs.Path(old, bucketDirs.head.getName))
    Seq((999L, "garbage")).toDF("id", "v")
      .write.parquet(path + "__upsert_tmp/__bucket=99")
    // the next call must first heal (restore the aside bucket, drop tmp)
    Sinks.upsertBucketed(spark.emptyDataset[(Long, String)].toDF("id", "v"),
      path, "id", numBuckets = 4)
    val got = Sinks.readUpserted(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    assert(got == want, "heal must restore the renamed-aside bucket")
    assert(!fs.exists(old))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path + "__upsert_tmp")))
  }

  test("upsertBucketed: a completed-then-crashed swap (bucket replaced, old left) keeps new data") {
    import spark.implicits._
    val path = tmp("u3")
    val base = (1L to 40L).map(i => (i, s"old$i")).toDF("id", "v")
    Sinks.upsertBucketed(base, path, "id", numBuckets = 4)
    val batch = Seq((1L, "new1"), (2L, "new2")).toDF("id", "v")
    Sinks.upsertBucketed(batch, path, "id", numBuckets = 4)
    // crash AFTER both renames but before the old-dir cleanup: the aside
    // copy still exists while the live bucket already has the new data
    val live = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(_.getPath.getName.startsWith("__bucket=")).map(_.getPath).head
    val old = new org.apache.hadoop.fs.Path(path + "__upsert_old")
    fs.mkdirs(old)
    org.apache.hadoop.fs.FileUtil.copy(fs, live, fs,
      new org.apache.hadoop.fs.Path(old, live.getName), false,
      spark.sparkContext.hadoopConfiguration)
    Sinks.upsertBucketed(spark.emptyDataset[(Long, String)].toDF("id", "v"),
      path, "id", numBuckets = 4)
    val got = Sinks.readUpserted(spark, path).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("v")).toMap
    val want = (1L to 40L).map(i =>
      i -> (if (i <= 2) s"new$i" else s"old$i")).toMap
    assert(got == want, "heal must NOT clobber a completed bucket with the aside copy")
    assert(!fs.exists(old))
  }

  test("appendNewKeys: re-running the same batch after a crash-restart adds nothing") {
    import spark.implicits._
    val path = tmp("a1")
    val b1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    Sinks.appendNewKeys(b1, path, "id")
    // restart replays the same batch (at-least-once delivery)
    Sinks.appendNewKeys(b1, path, "id")
    assert(spark.read.parquet(path).count() == 2)
    // a mixed batch appends only the genuinely new key
    Sinks.appendNewKeys(Seq((2L, "b2"), (3L, "c")).toDF("id", "v"), path, "id")
    assert(rowsOf(path) == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  private def genRows(path: String): Set[(Long, String)] =
    spark.read.parquet(path).select("id", "v").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("v"))).toSet

  private def genCount(path: String): Int =
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(_.getPath.getName.startsWith("gen="))

  test("compactGenerations: folds gens to one, preserves rows, and folded ids stay skipped") {
    import spark.implicits._
    val path = tmp("cg1")
    assert(Sinks.committedAppend(Seq((1L, "a")).toDF("id", "v"), path, 0L))
    assert(Sinks.committedAppend(Seq((2L, "b")).toDF("id", "v"), path, 1L))
    assert(Sinks.committedAppend(Seq((3L, "c")).toDF("id", "v"), path, 2L))
    val want = genRows(path)
    Sinks.compactGenerations(spark, path, None)
    assert(genCount(path) == 1 && genRows(path) == want)
    // replay of every folded id: manifest tier must skip (its gen dir
    // is gone — a re-append would double the data)
    for (b <- 0L to 2L)
      assert(!Sinks.committedAppend(Seq((9L, "dup")).toDF("id", "v"), path, b))
    assert(genRows(path) == want)
    // a genuinely NEW id still lands, and a second compaction folds it
    // while keeping the earlier manifest entries
    assert(Sinks.committedAppend(Seq((4L, "d")).toDF("id", "v"), path, 3L))
    Sinks.compactGenerations(spark, path, None)
    assert(genCount(path) == 1 && genRows(path) == want + ((4L, "d")))
    for (b <- 0L to 3L)
      assert(!Sinks.committedAppend(Seq((9L, "dup")).toDF("id", "v"), path, b))
  }

  test("compactGenerations: crash windows (stale manifest tmp, half-swap) heal with no loss") {
    import spark.implicits._
    val path = tmp("cg2")
    assert(Sinks.committedAppend(Seq((1L, "a")).toDF("id", "v"), path, 0L))
    assert(Sinks.committedAppend(Seq((2L, "b")).toDF("id", "v"), path, 1L))
    val want = genRows(path)
    // window 1: manifest tmp written, publish not done — foldedIds
    // unions the tmp, so a listed id with NO gen dir is still skipped
    // (the gen dirs for 0/1 would skip on their own; id 7 only the
    // manifest tmp knows)
    val mTmp = new org.apache.hadoop.fs.Path(path + "__committed.tmp")
    val out = fs.create(mTmp, true)
    out.write("7\nEND:1".getBytes("UTF-8")); out.close()
    assert(!Sinks.committedAppend(Seq((9L, "dup")).toDF("id", "v"), path, 7L))
    // and a TORN tmp (no END frame — a crash mid-flush truncated it)
    // must be IGNORED, not parsed into a fabricated batch id
    val out2 = fs.create(mTmp, true)
    out2.write("7\n1".getBytes("UTF-8")); out2.close()
    assert(Sinks.committedAppend(Seq((7L, "g")).toDF("id", "v"), path, 7L))
    assert(genRows(path) == want + ((7L, "g")))
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/gen=7"), true)
    fs.delete(mTmp, false)
    // window 2: compaction died between its two renames — dir absent,
    // complete tmp present. Build that state from a real fold.
    Sinks.compactGenerations(spark, path, None)
    assert(genRows(path) == want)
    val aside = new org.apache.hadoop.fs.Path(path + "__crash_aside")
    fs.rename(new org.apache.hadoop.fs.Path(path), aside)
    fs.rename(aside, new org.apache.hadoop.fs.Path(path + "__compact_tmp"))
    Sinks.compactGenerations(spark, path, None) // recovery path
    assert(genCount(path) == 1 && genRows(path) == want)
    for (b <- 0L to 1L)
      assert(!Sinks.committedAppend(Seq((9L, "dup")).toDF("id", "v"), path, b))
    // window 3: half-swap again, but the NEXT TOUCH is an APPEND — it
    // must heal the root first; recreating a bare root here would bury
    // the complete tmp and the next compaction would delete it (the
    // entire pre-crash store silently gone)
    fs.rename(new org.apache.hadoop.fs.Path(path), aside)
    fs.rename(aside, new org.apache.hadoop.fs.Path(path + "__compact_tmp"))
    assert(Sinks.committedAppend(Seq((3L, "c")).toDF("id", "v"), path, 5L))
    assert(genRows(path) == want + ((3L, "c")))
    Sinks.compactGenerations(spark, path, None)
    assert(genCount(path) == 1 && genRows(path) == want + ((3L, "c")))
  }

  test("rewriteGenerations refuses a filter-to-empty, leaving the store intact") {
    import spark.implicits._
    val path = tmp("cg3")
    assert(Sinks.committedAppend(Seq((1L, "a")).toDF("id", "v"), path, 0L))
    val want = genRows(path)
    val e = intercept[IllegalArgumentException](
      Sinks.rewriteGenerations(spark, path, None, _.where(lit(false))))
    assert(e.getMessage.contains("EMPTY"))
    // nothing mutated: rows and replay markers both survive
    assert(genRows(path) == want)
    assert(!Sinks.committedAppend(Seq((9L, "dup")).toDF("id", "v"), path, 0L))
  }
}
