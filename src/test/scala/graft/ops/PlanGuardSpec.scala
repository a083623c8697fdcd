package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards over EVERY registered query — the scale
  * properties that must survive refactors:
  *
  *  - no unpartitioned window (`WindowExec` with an empty
  *    partitionSpec funnels ALL data through one task — the exact
  *    degradation Spark logs as "No Partition Defined for Window
  *    operation"; at 100 TB it is a single-machine bottleneck);
  *  - no `CartesianProductExec` (an unkeyed all-pairs shuffle join;
  *    range/theta joins must ride a broadcast nested loop against a
  *    SMALL side instead, and similarity joins must be keyed —
  *    shingle/band equi-joins — never cross).
  *
  * AQE is disabled here so the guard sees the statically-planned
  * operators (AQE can only improve on them at runtime).
  */
class PlanGuardSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-plan-guard")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def offenders(
      plan: SparkPlan, bad: PartialFunction[SparkPlan, String]): Seq[String] =
    plan.collectWithSubqueries(bad)

  test("no query plans an unpartitioned window or a cartesian product") {
    val failures = SparkEntry_queriesInOrder.flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val hits = offenders(plan, {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          s"$name: unpartitioned WindowExec"
        case _: CartesianProductExec =>
          s"$name: CartesianProductExec"
      })
      hits
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  /** stable iteration order for reproducible failure output */
  private def SparkEntry_queriesInOrder =
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
}
