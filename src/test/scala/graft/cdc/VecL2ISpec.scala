package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** vec_l2i (native integer squared-L2) must agree with the
  * `aggregate(zip_with(...))` fold it replaced — including the
  * null-poisoning and length-mismatch edge semantics — and stay
  * usable from SQL through both registration paths. */
class VecL2ISpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-vec-l2i-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("matches the zip_with fold on random integer vectors") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextInt(2001).toLong),
      Seq.fill(64)(rnd.nextInt(2001).toLong)))
    val df = rows.toDF("a", "b").selectExpr(
      "vec_l2i(a, b) AS nat",
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, " +
        "(acc, x) -> acc + x) AS hof")
    assert(df.filter(col("nat") =!= col("hof")).count() == 0)
    assert(df.filter(col("nat").isNull).count() == 0)
  }

  test("null element or length mismatch yields null, like the fold") {
    val r = spark.sql(
      "SELECT vec_l2i(array(1L, 2L), array(1L, CAST(NULL AS BIGINT))) " +
        "AS n1, vec_l2i(array(1L, 2L), array(1L)) AS n2, " +
        "vec_l2i(array(1L, 2L), array(3L, 5L)) AS v").head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getLong(2) == 4L + 9L)
  }

  test("stays inside whole-stage codegen") {
    // non-constant input, or the optimizer folds the whole projection
    val df = spark.range(5)
      .selectExpr("vec_l2i(array(id, id + 1L), array(id + 2L, id + 4L)) AS d")
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into a codegen stage
    assert(plan.contains("*(1) Project [vec_l2i"), s"plan:\n$plan")
    assert(df.collect().forall(_.getLong(0) == 4L + 9L))
  }
}
