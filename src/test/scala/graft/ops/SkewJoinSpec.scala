package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join evidence: q77/q96 express salting EXPLICITLY (the
  * deterministic, oracle-checkable recipe); this spec proves the
  * ADAPTIVE path also fires — a runtime-detected hot key makes AQE
  * split the skewed partition (skew=true on the join) with no query
  * rewrite at all. At 100 TB the division of labor is: AQE handles
  * incidental skew transparently, the explicit salt handles the
  * known-pathological keys the planner must never gamble on. */
class SkewJoinSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-skew-join-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // thresholds scaled down so a ~MB hot partition counts as skewed
      // (production defaults are 256 MB / 5x)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("AQE splits a runtime-detected skewed partition (skew=true)") {
    // fact: 200k rows, 95% on key 7; dim: 100 keys, a few rows each
    val fact = spark.range(200000)
      .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100)
        .as("k"), concat(lit("payload-"), col("id")).as("pad"))
    val dim = spark.range(100).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("attr"))
    // correctness: every fact row survives the join
    val grouped = fact.join(dim, "k").groupBy(col("k"))
      .agg(count(lit(1)).as("n"))
    assert(grouped.collect().map(_.getLong(1)).sum == 200000L)
    // skew assert on a plan whose downstream needs NO particular
    // distribution (a global agg): a grouped consumer would require
    // hashpartitioning(k) and AQE then refuses to split the skewed
    // partition (splitting breaks the required distribution unless
    // forceOptimizeSkewedJoin pays an extra shuffle). The aggregate
    // must CONSUME the fact payload — aggregating only dim columns
    // lets column pruning shuffle nothing but the 8-byte key, whose
    // constant-heavy hot partition compresses below the skew
    // threshold and AQE correctly reports zero skew.
    val q = fact.join(dim, "k")
      .agg(sum(length(col("attr")) + length(col("pad"))).as("s"))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the join skewed in:\n$plan")
  }
}
