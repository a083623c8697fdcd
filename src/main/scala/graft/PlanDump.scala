package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the physical plan of one or more registered
  * queries against the sf0.001 fixture —
  * `sbt "runMain graft.PlanDump q126_doc_repetition"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      println(s"==== $q ====")
      println(SparkEntry.queries(q)(s, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
    }
  }
}
