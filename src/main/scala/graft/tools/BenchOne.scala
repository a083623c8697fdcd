package graft.tools

import org.apache.spark.sql.SparkSession

/** Times named queries under BENCH conditions: memos prewarmed once,
  * transients dropped between runs — the marginal per-query cost the
  * bench reports, reproducible in isolation. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // parity with Bench: data-sized AQE coalescing (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "4m"))
      .config("spark.sql.codegen.aggregate.map.twolevel.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AGG_TWOLEVEL", "false"))
      // parity with Bench: production-path shuffle writer (see Bench)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS", "1"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ops.Prewarm.run(spark, sfDir)
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        graft.ops.Tables.dropTransientCaches()
        println(f"BENCH1 $name%-28s run$i=$sec%6.2f")
      }
    }
    spark.stop()
  }
}
