package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main: times each session-memo build separately at
  * SPARK_GRAFT_SF_DIR (the parts of Bench's `memo_build` entry). */
object MemoTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Prewarm.timed(spark, sfDir).foreach { case (n, s) =>
      println(f"MEMO $n%-10s $s%.2f s")
    }
    spark.stop()
  }
}
