package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing of q102's star contraction: how much of the query is
  * the (cached) jaccard-pair build vs the contraction loop, and how
  * many rounds / seconds-per-round the loop costs at this SF.
  */
object ProfileQ102 {
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
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.cdc.GraftFunctions.register(spark)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    time("jaccardPairs (build)")(Text.jaccardPairs(spark, sfDir).count())
    time("jaccardPairs (cached)")(Text.jaccardPairs(spark, sfDir).count())
    time("starContraction")(Pipeline.starComponents(spark, sfDir).count())
    time("q102 full (warm)")(
      graft.SparkEntry.queries("q102_cc_star")(spark, sfDir).count())
    spark.stop()
  }
}
