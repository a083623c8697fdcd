package graft.tools

import org.apache.spark.sql.SparkSession

/** Times named queries (default: all) twice each — cold then warm —
  * against SPARK_GRAFT_SF_DIR, after a session warm-up. Warm-minus-
  * cold separates planning/codegen/first-scan overhead from steady-
  * state compute. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // parity with Bench: data-sized AQE coalescing (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
      // sweepable for advisory-size experiments (r16): how AQE's
      // byte-based coalescing trades scheduling tax (too many tiny
      // tasks) against serialized CPU (too few)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "4m"))
      .config("spark.sql.codegen.aggregate.map.twolevel.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AGG_TWOLEVEL", "false"))
      // parity with Bench: production-path shuffle writer (see Bench)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS", "1"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.inMemoryColumnarStorage.compressed",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_COMPRESS", "true"))
      // experiment hook (r16): price ANSI-mode arithmetic checks
      .config("spark.sql.ansi.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ANSI", "true"))
      // experiment hook (r16): arbitrary extra confs, "k=v;k=v"
      .config(sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
        .flatMap(_.split(";")).filter(_.contains("="))
        .map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> (v: Any)
        }.toMap)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val names =
      if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"QT $name%-28s cold=$cold%6.2f warm=$warm%6.2f")
    }
    spark.stop()
  }
}
