package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** DSIR staleness-loop cost curve (e31's trigger — VERDICT r8
  * directive 4), the RetrainProbe discipline applied to the selection
  * tier. Three costs are priced at 1×/10× the sf0.1 documents:
  *
  *  - DRIFT: the per-batch staleness metric (dsirDrift's
  *    cross-multiplied TV numerator) — two ≤4096-row bucket relations
  *    joined full-outer + one agg. The claim: evaluating it every
  *    batch is free relative to any scoring run, at any corpus size,
  *    because its inputs are the already-maintained partials, never
  *    the corpus.
  *  - REFRESH: re-fit from committed partials — merge #buckets×#gens
  *    tiny rows (here: the two halves' partials). The claim: a
  *    triggered refresh costs a bucket-relation agg, NOT a corpus
  *    re-scan (the additive-counts design from e29 is what buys this).
  *  - REFIT-FROM-CORPUS: the full dsirCounts scan — what a
  *    non-incremental design would pay per refresh, and the honest
  *    linear floor for comparison.
  *
  * Results feed PERF.md's e31 row.
  */
object DsirRefreshProbe {

  def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (n <- Seq(1, 10)) {
      val docs0 = graft.sources.Tables.documents(spark, d)
        .select("doc_id", "lang", "text")
      val docs = if (n == 1) docs0 else {
        // replicate with distinct ids so group cardinalities scale
        val copies = spark.range(n).select(col("id").as("rep"))
        docs0.crossJoin(copies)
          .select((col("doc_id") * n + col("rep")).as("doc_id"),
            col("lang"), col("text"))
      }
      val nd = docs.count()
      // partials for the two halves land once (the e31 world), then
      // each cost is timed against materialized inputs
      val dir = s"/tmp/dsir_probe_$n"
      org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
      graft.sources.Sinks.committedAppend(
        graft.queries.RelationalQueries.dsirCounts(
          docs.where(col("doc_id") % 2 === 0)), dir, 0L)
      graft.sources.Sinks.committedAppend(
        graft.queries.RelationalQueries.dsirCounts(
          docs.where(col("doc_id") % 2 === 1)), dir, 1L)
      val frozen = spark.read.parquet(s"$dir/gen=0").groupBy("b")
        .agg(sum("cr").as("cr"), sum("ct").as("ct"))
      val live = spark.read.parquet(dir).groupBy("b")
        .agg(sum("cr").as("cr"), sum("ct").as("ct"))
      val (_, tDrift) = time {
        graft.queries.RelationalQueries.dsirDrift(frozen, live, 1, 10).count()
      }
      val (_, tRefresh) = time { live.count() }
      val (_, tCorpus) = time {
        graft.queries.RelationalQueries.dsirCounts(docs).count()
      }
      // o18 economics: score ONE fixed-size batch against the model vs
      // re-score the corpus — the additive per-doc partials mean a
      // landing batch pays only its own tokenize pass, so the
      // incremental step should be ~flat in corpus size while the
      // monolithic re-score is the linear floor
      val model = graft.queries.RelationalQueries.dsirModel(frozen)
      // id < 500 is 500 docs at EITHER scale (replica ids pack as
      // doc_id·n + rep) — a genuinely fixed-size landing batch
      val batch = docs.where(col("doc_id") < 500)
      val (_, tScoreBatch) = time {
        graft.queries.RelationalQueries.dsirScore(batch, model).count()
      }
      val (_, tScoreAll) = time {
        graft.queries.RelationalQueries.dsirScore(docs, model).count()
      }
      println(f"DSIRREFRESH n=$n%2d docs=$nd%8d drift=$tDrift%6.2fs " +
        f"refresh_from_partials=$tRefresh%6.2fs refit_from_corpus=$tCorpus%6.2fs " +
        f"score_batch=$tScoreBatch%6.2fs score_corpus=$tScoreAll%6.2fs")
    }
    spark.stop()
  }
}
