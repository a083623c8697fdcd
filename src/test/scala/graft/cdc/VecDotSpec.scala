package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Native `vec_dot` kernel: value-identical to the declarative
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, _+_)` fold (same
  * ascending-index accumulation order, so bit-identical doubles, not
  * just approximately equal), evaluable from SQL, and codegen-safe.
  */
class VecDotSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-vec-dot-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bit-identical to the aggregate/zip_with fold") {
    val s = spark
    import s.implicits._
    val rows = (1 to 100).map { i =>
      (Seq.tabulate(64)(j => math.sin(i * 64 + j).toFloat),
        Seq.tabulate(64)(j => math.cos(i * 64 + j).toFloat))
    }
    val df = rows.toDF("a", "b")
      .select(
        transform(col("a"), x => x.cast("double")).as("a"),
        transform(col("b"), x => x.cast("double")).as("b"))
    val out = df.select(
      GraftFunctions.vec_dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0.0),
        (acc, x) => acc + x).as("fold")).collect()
    out.foreach { r =>
      // exact bit compare — same fold order must mean same double
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("implicit-casts float arrays, resolves in SQL, null-safe") {
    val r = spark.sql(
      """SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0)) AS n
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 4.0)
    assert(r.isNullAt(1))
  }

  test("length mismatch folds over the common prefix") {
    val r = spark.sql(
      "SELECT vec_dot(array(2.0, 3.0, 99.0), array(10.0, 10.0)) AS d")
      .collect().head
    assert(r.getDouble(0) == 50.0)
  }
}
