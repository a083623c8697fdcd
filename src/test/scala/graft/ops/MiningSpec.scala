package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the mining/sketching operators that the value-level
  * oracle compare can't express:
  *
  *  - Count-Min NEVER undercounts (estimate ≥ exact, structurally —
  *    every bucket sums a superset of each key's mass);
  *  - min-wise per-group sampling is deterministic across evaluations
  *    and caps every group at k;
  *  - the Bloom-pruned join returns exactly the plain semi-join's
  *    rows regardless of filter quality (the exact join removes all
  *    false positives — fpp is a performance knob, not a correctness
  *    one).
  */
class MiningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  private def q(name: String) =
    graft.SparkEntry.queries(name)(spark, sfDir)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-mining-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("count-min estimate never undercounts") {
    val rows = q("q81_countmin_audit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cm_est")
      assert(est >= exact, s"CMS undercounted: est=$est exact=$exact")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
  }

  test("min-wise sample caps each group at k and is re-run stable") {
    val a = q("q85_group_hash_sample").collect()
    val b = q("q85_group_hash_sample").collect()
    assert(a.toSeq == b.toSeq) // no RNG: identical across evaluations
    val perLang = a.groupBy(_.getAs[String]("lang"))
    assert(perLang.values.forall(_.length <= 5))
    perLang.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rk")).sorted.toSeq ==
        (1 to g.length).toSeq)
    }
  }

  test("bloom-pruned join equals the plain semi-join row-for-row") {
    val pruned = q("q87_bloom_pruned_join").collect().toSeq
    Tables.lineitem(spark, sfDir).createOrReplaceTempView("li_ms")
    Tables.orders(spark, sfDir).createOrReplaceTempView("o_ms")
    val plain = spark.sql(
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM li_ms WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM o_ms WHERE o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect().toSeq
    assert(pruned == plain)
  }

  test("decontamination percentages are consistent with their counts") {
    q("q82_ngram_decontamination").collect().foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val c = r.getAs[Long]("n_contam")
      assert(c <= n && c * 2 >= n)
      assert(r.getAs[Long]("contam_pct") == c * 100 / n)
    }
  }
}
