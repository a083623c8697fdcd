package graft.tools

import org.apache.spark.sql.SparkSession

/** memo → consumer census (r14 verdict ask 3): runs every registered
  * query against SPARK_GRAFT_SF_DIR with per-query touch attribution
  * (`Tables.withConsumer`) and prints which queries read which memo —
  * the evidence behind Prewarm's chain membership: a memo consumed by
  * one query belongs inside that query's own timing, not in the
  * shared memo_build every other query's prewarm pays for. */
object MemoCensus {
  def main(args: Array[String]): Unit = {
    val sfDir =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      try graft.ops.Tables.withConsumer(name) { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        System.err.println(s"CENSUS ERR $name: ${e.getMessage}")
      }
      graft.ops.Tables.dropTransientCaches()
    }
    graft.ops.Tables.memoConsumers().toSeq.sortBy(_._1)
      .foreach { case (m, qs) =>
        println(s"MEMO $m (${qs.size}): ${qs.mkString(" ")}")
      }
    spark.stop()
  }
}
