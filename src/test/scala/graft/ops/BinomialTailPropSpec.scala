package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q281's significance spine pinned against independent arithmetic
  * (r13 verdict ask 7): the sign test's one output row hash-matches
  * the oracle forever even if BOTH engines shared a wrong-but-stable
  * tail constant, because the two engines run the same
  * multiplicative-C(n,k) recipe. These tests break that circularity:
  *
  *  - a ScalaCheck property checks the exact recipe the query runs —
  *    partial products with TRUNCATING integer division at every
  *    step, `acc * (n - i + 1) / i` — against BigInt binomial
  *    coefficients and tail sums (the division is exact only because
  *    each partial product is itself C(n, i); that identity is the
  *    thing under test);
  *  - one exhaustive Spark evaluation runs the query's actual SQL
  *    expression (`aggregate(sequence(...), ... DIV i)`) over every
  *    (n, lo) pair with n ≤ 30 and compares to BigInt truth, so the
  *    codegen'd kernel itself — not just its Scala mirror — is
  *    pinned. */
class BinomialTailPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-binomial-tail")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The query's kernel, verbatim in Scala: Long partial products
    * with truncating division, k = 0 short-circuiting to 1. */
  private def multiplicativeC(n: Long, k: Long): Long =
    if (k == 0) 1L
    else (1L to k).foldLeft(1L) { (acc, i) => acc * (n - i + 1) / i }

  private def bigC(n: Int, k: Int): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (BigInt(1) to BigInt(k)).foldLeft(BigInt(1)) { (acc, i) =>
      acc * (BigInt(n) - i + 1) / i
    }

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("multiplicative C(n,k) with truncating division is exact " +
      "(every partial product is itself a binomial coefficient)") {
    check(Prop.forAll(
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.chooseNum(0, n).map(k => (n, k)))) { case (n, k) =>
      BigInt(multiplicativeC(n.toLong, k.toLong)) == bigC(n, k)
    })
  }

  test("tail sums from any lower bound match BigInt summation") {
    check(Prop.forAll(
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.chooseNum(0, n).map(lo => (n, lo)))) { case (n, lo) =>
      val viaQueryRecipe =
        (lo to n).map(k => BigInt(multiplicativeC(n.toLong, k.toLong))).sum
      val truth = (lo to n).map(k => bigC(n, k)).sum
      viaQueryRecipe == truth
    })
  }

  test("the Spark SQL kernel itself matches BigInt truth for every " +
      "(n, lo) with n <= 30") {
    val ss = spark
    import ss.implicits._
    val pairs = for { n <- 0 to 30; lo <- 0 to n } yield (n.toLong, lo.toLong)
    // q281's expression verbatim: explode the k-spine, build C(n,k)
    // multiplicatively with DIV, sum the tail
    val got = pairs.toDF("n", "lo")
      .select(col("n"), col("lo"),
        explode(sequence(col("lo"), col("n"))).as("k"))
      .withColumn("c", when(col("k") === 0, lit(1L)).otherwise(
        expr("aggregate(sequence(CAST(1 AS BIGINT), k)," +
          " CAST(1 AS BIGINT), (acc, i) -> acc * (n - i + 1) DIV i)")))
      .groupBy(col("n"), col("lo")).agg(sum(col("c")).as("tail"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size == pairs.size)
    pairs.foreach { case (n, lo) =>
      val truth = (lo to n).map(k => bigC(n.toInt, k.toInt)).sum
      assert(BigInt(got((n, lo))) == truth,
        s"tail(n=$n, lo=$lo): got ${got((n, lo))}, want $truth")
    }
  }
}
