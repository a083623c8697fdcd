package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Runs named queries under bench conditions and prints the FINAL
  * (post-AQE) physical plan with per-operator metrics — rows out,
  * codegen/op time where exposed, shuffle bytes — the SQL-tab view
  * for a UI-less sandbox. Use to find which operator owns a heavy
  * query's task-seconds. */
object QueryMetrics {
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
    // the noop write runs under its OWN QueryExecution — grab it from
    // the listener so the dumped nodes carry the executed metrics
    val lastQe = new java.util.concurrent.atomic.AtomicReference[
      org.apache.spark.sql.execution.QueryExecution]()
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = { lastQe.set(qe); () }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    val probe = org.apache.spark.graft.TaskTimeProbe.install(
      spark.sparkContext)
    graft.ops.Prewarm.run(spark, sfDir)

    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    def dump(p: SparkPlan, depth: Int): Unit = {
      val ms = p.metrics.map { case (k, m) =>
        s"$k=${m.value}"
      }.filter(s => !s.endsWith("=0") && !s.endsWith("=-1"))
      println(("  " * depth) + p.nodeName + "  " +
        ms.mkString(" "))
      p.children.foreach(dump(_, depth + 1))
      // descend into adaptive/stage/reuse wrappers (their plan is not
      // a `children` member)
      p match {
        case a: AdaptiveSparkPlanExec => dump(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          dump(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.exchange
            .ReusedExchangeExec => dump(r.child, depth + 1)
        case _ => ()
      }
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // warm run first so metrics reflect steady state
      fn(spark, sfDir).count()
      graft.ops.Tables.dropTransientCaches()
      val df = fn(spark, sfDir)
      // noop sink (guide §1.4): executes THIS df's plan — count()
      // would plan a different query and leave these metrics empty
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      probe.flush(spark.sparkContext)
      println(f"==== $name (final plan with metrics; noop $sec%.2f s)")
      Option(lastQe.get()) match {
        case Some(qe) => dump(finalPlan(qe.executedPlan), 0)
        case None => println("  (no QueryExecution captured)")
      }
      graft.ops.Tables.dropTransientCaches()
    }
    spark.stop()
  }
}
