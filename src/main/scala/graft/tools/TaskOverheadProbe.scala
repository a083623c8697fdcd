package graft.ops

import org.apache.spark.sql.SparkSession

/** Micro-probe for the r16 "task-sec is 10-100x napkin math" anomaly:
  * times trivial fixed-shape jobs at several partition counts and
  * prints wall + executorRunTime per task, isolating the constant
  * per-task cost that multiplies across every 32-partition stage of
  * the suite. Diagnostic only — not part of the bench contract.
  */
object TaskOverheadProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "4m"))
      .config("spark.sql.codegen.aggregate.map.twolevel.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AGG_TWOLEVEL", "false"))
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("PROBE_BYPASS", "200"))
      .config("spark.shuffle.compress",
        sys.env.getOrElse("PROBE_SHUF_COMPRESS", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = org.apache.spark.graft.TaskTimeProbe.install(
      spark.sparkContext)
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Unit): Unit = {
      // warm once
      f
      (1 to 3).foreach { i =>
        val k0 = probe.taskSec(spark.sparkContext)
        val t0 = System.nanoTime()
        f
        val wall = (System.nanoTime() - t0) / 1e9
        val task = probe.taskSec(spark.sparkContext) - k0
        println(f"PROBE $name%-40s run$i wall=$wall%7.3f task=$task%8.3f")
      }
    }

    // 1. pure scheduling: N empty tasks
    Seq(1, 8, 32).foreach { n =>
      time(s"empty-rdd-$n-tasks") {
        spark.sparkContext.parallelize(1 to n, n).foreach(_ => ())
      }
    }
    // 2. trivial codegen pipeline over n partitions (range is splittable)
    Seq(1, 8, 32).foreach { n =>
      time(s"range-sum-$n-parts") {
        spark.range(0, 100000L, 1, n).selectExpr("sum(id)").collect(); ()
      }
    }
    // 3. cached memo scans (the suite's real base): toks (arrays),
    //    shingles (260k longs), pairs (2.7k rows)
    val toks = Text.withToks(spark, sfDir)
    toks.count()
    val sh = Text.shingleHashes(spark, sfDir)
    sh.count()
    val pairs = Text.jaccardPairs(spark, sfDir)
    pairs.count()
    time("toks-count (cached, 32 parts)") { toks.count(); () }
    time("toks-noop (cached, full cols)") {
      toks.write.format("noop").mode("overwrite").save()
    }
    time("shingles-count (cached)") { sh.count(); () }
    time("shingles-noop (cached)") {
      sh.write.format("noop").mode("overwrite").save()
    }
    time("pairs-noop (cached, 2.7k rows)") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    // 4. one shuffle of the shingle index (the suite's common shape)
    time("shingles-groupBy-h (1 exchange)") {
      sh.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .write.format("noop").mode("overwrite").save()
    }
    // 5. same with shuffle compression off (A/B for shuffleWriteTime)
    println("spark.shuffle.compress = " +
      spark.sparkContext.getConf.get("spark.shuffle.compress", "true"))
    spark.stop()
  }
}
