package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tables helpers every text/dedup query rides on: fanOut (the
  * single-split fix — a one-split scan would serialize tokenization
  * and pin every cached descendant to one partition) and the bounded
  * DfMemo (evicted entries must release their cached blocks). */
class TablesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tables-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fanOut spreads a single-partition input to the shuffle width") {
    val one = spark.range(1000).coalesce(1).toDF("id")
    assert(one.rdd.getNumPartitions == 1)
    val out = Tables.fanOut(one)
    assert(out.rdd.getNumPartitions == 4)
    // row-preserving, content unchanged
    assert(out.count() == 1000)
    assert(out.agg(sum(col("id"))).head().getLong(0) == 499500L)
    // round-robin: no partition holds everything (the point of the fix)
    val sizes = out.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.forall(_ < 1000) && sizes.sum == 1000)
  }

  test("DfMemo evicts least-recently-used entries and unpersists them") {
    // distinct ranges per key: Spark's CacheManager dedupes cache
    // entries BY LOGICAL PLAN, so identical plans would share one
    // entry and eviction of any alias would unpersist all of them
    val memo = new Tables.DfMemo("spec_lru", max = 2)
    val a = memo.getOrElseUpdate((spark, "a"))(
      spark.range(10).toDF("x").cache())
    a.count()
    assert(a.storageLevel.useMemory)
    memo.getOrElseUpdate((spark, "b"))(spark.range(20).toDF("x").cache())
      .count()
    memo.getOrElseUpdate((spark, "c"))(spark.range(30).toDF("x").cache())
      .count()
    // capacity 2: inserting c evicted a (the eldest) and unpersisted it
    assert(!a.storageLevel.useMemory,
      "evicted entry should have been unpersisted")
    // re-requesting a rebuilds rather than returning the evicted frame
    val a2 = memo.getOrElseUpdate((spark, "a"))(
      spark.range(40).toDF("x").cache())
    a2.count()
    assert(a2.storageLevel.useMemory)
  }

  test("tcache registers per-query transients; drop unpersists them all") {
    import Tables.TransientCacheOps
    Tables.dropTransientCaches() // isolate from other suites' leftovers
    val t1 = spark.range(50).toDF("x").tcache()
    val t2 = spark.range(60).toDF("x").tcache()
    t1.count(); t2.count()
    assert(t1.storageLevel.useMemory && t2.storageLevel.useMemory)
    Tables.dropTransientCaches()
    assert(!t1.storageLevel.useMemory && !t2.storageLevel.useMemory,
      "dropTransientCaches must unpersist every registered transient")
    // drop is a drain: a second call is a no-op, and new registrations
    // after a drop are tracked independently
    Tables.dropTransientCaches()
    val t3 = spark.range(70).toDF("x").tcache()
    t3.count()
    assert(t3.storageLevel.useMemory)
    Tables.dropTransientCaches()
    assert(!t3.storageLevel.useMemory)
  }
}
