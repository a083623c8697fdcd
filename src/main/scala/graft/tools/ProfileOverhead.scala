package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Decomposes per-query bench wall time into scheduled-job time vs
  * driver-side gaps (Catalyst planning, AQE replanning, result
  * handling) under exact Bench conditions. For each named query
  * (default: all), prints wall seconds, job/stage/task counts, the
  * summed job-span seconds, and the driver gap (wall - job spans).
  * A large gap with few tasks means the query is planning-bound; a
  * large job count with small stages means it is barrier-bound.
  */
object ProfileOverhead {
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
      // parity with Bench: production-path shuffle writer (see Bench)
      .config("spark.shuffle.sort.bypassMergeThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_BYPASS", "1"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-query job/stage/task census, listener-bus backed
    object L extends SparkListener {
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      val taskMs = new java.util.concurrent.atomic.AtomicLong
      val jobSpanMs = new java.util.concurrent.atomic.AtomicLong
      val starts =
        new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        starts.put(e.jobId, e.time); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { t0 =>
          jobSpanMs.addAndGet(e.time - t0); () }
      }
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); ()
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(e.taskMetrics).foreach { m =>
          taskMs.addAndGet(m.executorRunTime); () }
      }
      def reset(): Unit = {
        jobs.set(0); stages.set(0); tasks.set(0)
        taskMs.set(0); jobSpanMs.set(0); starts.clear()
      }
    }
    spark.sparkContext.addSparkListener(L)
    val probe = org.apache.spark.graft.TaskTimeProbe.install(
      spark.sparkContext)

    graft.ops.Prewarm.run(spark, sfDir)

    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    println("name wall_s build_s jobs stages tasks jobspan_s gap_s task_s")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def once(): Unit = {
        probe.flush(spark.sparkContext)
        L.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        graft.ops.Tables.dropTransientCaches()
        probe.flush(spark.sparkContext)
        println(f"PROF $name%-40s $wall%7.3f $tBuild%7.3f " +
          f"${L.jobs.get}%4d ${L.stages.get}%5d ${L.tasks.get}%6d " +
          f"${L.jobSpanMs.get / 1e3}%8.3f " +
          f"${wall - L.jobSpanMs.get / 1e3}%7.3f " +
          f"${L.taskMs.get / 1e3}%8.3f")
      }
      try { once(); once() } catch {
        case e: Throwable =>
          println(s"PROF $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
