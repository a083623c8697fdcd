package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Prints the whole-stage-codegen Java for one query (default q29) so
  * a CompileException can be diagnosed against real line numbers. */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val name = args.headOption.getOrElse("q29_knn_bruteforce")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, sfDir).debugCodegen()
    spark.stop()
  }
}
