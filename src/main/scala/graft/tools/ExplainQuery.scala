package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted plan of named queries (PLANS.md evidence). */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // PLANS.md dumps want AQE off; accept natural falsy spellings
      .config("spark.sql.adaptive.enabled",
        (!Set("false", "0", "off", "no").contains(
          sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
            .toLowerCase(java.util.Locale.ROOT))).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"==== $name")
      graft.SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
