package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MinHashLSH
import graft.sources.Tables
object D2Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"D2 $label%-12s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$n")
    }
    val docs = Tables.documents(spark, d).withColumn("w", split(col("text"), " "))
    // old shape: no cap machinery
    t("old-shape") {
      MinHashLSH.bands(docs, "doc_id", col("w"), 4)
        .groupBy("band", "h")
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .where(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
             transform(slice(ids, i + 2, size(ids)), y -> struct(x AS ia, y AS ib))))"""))
          .as("p")).select(col("p.ia"), col("p.ib")).distinct().count()
    }
    t("capped") { MinHashLSH.candidatePairs(docs, "doc_id", col("w")).count() }
    t("capped-2nd") { MinHashLSH.candidatePairs(docs, "doc_id", col("w")).count() }
    spark.stop()
  }
}
