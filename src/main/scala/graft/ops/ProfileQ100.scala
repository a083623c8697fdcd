package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q100 dependency chain (tokenize →
  * shingle index → jaccard pair graph → source matrix) to locate the
  * dominant cost. */
object ProfileQ100 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    time("first-job")(spark.range(1000000).selectExpr("sum(id)").count())
    time("docs-scan")(Tables.documents(spark, sfDir).count())
    time("docs-fanout")(Tables.fanOut(
      Tables.documents(spark, sfDir)).count())
    time("tokenize-nocache")(Tables.fanOut(Tables.documents(spark, sfDir))
      .select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "").as("toks"))
      .select(sum(size(col("toks")))).count())
    time("withToks")(Text.withToks(spark, sfDir).count())
    time("shingleHashes")(Text.shingleHashes(spark, sfDir).count())
    time("jaccardPairs")(Text.jaccardPairs(spark, sfDir).count())
    time("q100 full")(
      graft.SparkEntry.queries("q100_cross_source_neardups")(spark, sfDir).count())
    time("q26 full")(
      graft.SparkEntry.queries("q26_minhash_lsh_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
