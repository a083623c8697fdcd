package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the full result of named queries against SPARK_GRAFT_SF_DIR
  * — a fast eyeball check while iterating (the hash gate is Verify).
  */
object ShowQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"== $name @ $sfDir")
      graft.SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
