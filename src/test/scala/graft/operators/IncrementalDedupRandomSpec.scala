package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Model-based fuzz for MinHashLSH.incrementalDedup: random band
  * topologies (random bucket assignments, random corpus/batch split,
  * multi-band docs, shared and disjoint buckets) checked against a
  * plain-Scala reference model computing the same three verdicts from
  * the raw edge sets. 12 seeded trials; any divergence prints the seed.
  */
class IncrementalDedupRandomSpec extends SparkSpec {

  import spark.implicits._

  test("random topologies match the set-model verdicts (12 seeded trials)") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val nDocs = 20 + rnd.nextInt(40)
      val nBuckets = 3 + rnd.nextInt(10)
      // each doc gets 1-3 (band, h) rows; band in {0,1}, h over a small
      // shared alphabet so collisions are frequent
      val rows = (0L until nDocs.toLong).flatMap { id =>
        (0 to rnd.nextInt(3)).map { _ =>
          (id, rnd.nextInt(2), s"h${rnd.nextInt(nBuckets)}")
        }
      }.distinct
      val isBatch = (0L until nDocs.toLong).map(id => id -> (rnd.nextInt(3) == 0)).toMap
      val corpus = rows.filter(r => !isBatch(r._1))
      val batch = rows.filter(r => isBatch(r._1))
      if (batch.nonEmpty) {
        val idx = graft.queries.Scratch.dir(s"inc_rand_$seed").resolve("i").toString
        corpus.toDF("doc_id", "band", "h").write.parquet(idx)
        val got = MinHashLSH.incrementalDedup(
            batch.toDF("doc_id", "band", "h"), "doc_id", idx,
            appendAdmitted = false)
          .collect()
          .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))))
          .toMap
        // reference model over plain sets
        val corpusKeys = corpus.map(r => (r._2, r._3)).toSet
        val batchIds = batch.map(_._1).distinct
        val keysOf = batch.groupBy(_._1).map { case (id, rs) =>
          id -> rs.map(r => (r._2, r._3)).toSet }
        val want = batchIds.map { id =>
          val dupC = keysOf(id).exists(corpusKeys.contains)
          val dupB = batchIds.exists(o =>
            o < id && keysOf(o).exists(keysOf(id).contains))
          id -> ((dupC, dupB, !dupC && !dupB))
        }.toMap
        assert(got === want, s"seed=$seed nDocs=$nDocs nBuckets=$nBuckets")
      }
    }
  }
}
