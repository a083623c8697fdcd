package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Bucketing evidence for the 100 TB design (SCALING.md): fact-fact
  * joins co-locate when both sides are bucketed on the join key —
  * the shuffle disappears from the physical plan entirely. This is
  * the storage-layout lever for repeated orders×lineitem-shaped joins
  * at scale (pay one bucketed write, skip the exchange on every
  * subsequent join). */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var warehouse: String = _

  override def beforeAll(): Unit = {
    warehouse = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bucketing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      // keep bucketed scans on even for filter-only plans, so bucket
      // pruning (SelectedBucketsCount) is observable
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val d = "/root/testdata/sf0.001"
    spark.read.parquet(s"$d/orders.parquet")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$d/lineitem.parquet")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")
  }

  override def afterAll(): Unit = if (spark != null) {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    spark.stop()
  }

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        spark.table("orders_b")("o_orderkey") ===
          spark.table("lineitem_b")("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")
    // same rows as the shuffled join over the raw parquet
    val d = "/root/testdata/sf0.001"
    val raw = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/lineitem.parquet"),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
    assert(joined.count() == raw.count())
  }

  test("bucket pruning: an equality filter reads one bucket") {
    val one = spark.table("orders_b")
      .filter(org.apache.spark.sql.functions.col("o_orderkey") === 7L)
    // SelectedBucketsCount appears in the scan when pruning kicks in
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
      s"expected bucket pruning in:\n$plan")
  }
}
