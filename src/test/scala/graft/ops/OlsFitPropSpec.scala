package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q290/q294's shared integer-OLS fold pinned against independent
  * arithmetic (the BinomialTailPropSpec recipe applied to the
  * corpus-law fits): both engines run the same milli/DIV formulas,
  * so a wrong-but-stable constant would hash-match the oracle
  * forever. The property drives `Text.integerOlsFit` — the actual
  * Spark fold, windows to codegen — over random small band
  * relations and compares slope, intercept, and residual MSE to
  * BigInt closed forms with explicit truncate-toward-zero division
  * (the semantics DIV and DuckDB `//` share). Negative numerators
  * are exercised on purpose: descending y makes the slope numerator
  * negative, the case where floor-vs-truncate divergence would
  * bite. */
class OlsFitPropSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ols-prop")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** BigInt truncate-toward-zero quotient (BigInt./ already
    * truncates toward zero, like Long division — stated here so the
    * property is explicit about the semantics under test). */
  private def tdiv(a: BigInt, b: BigInt): BigInt = a / b

  private def reference(pts: Seq[(Long, Long)])
      : Option[(Long, Long, Long)] = {
    val n = BigInt(pts.length)
    if (n < 2) None
    else {
      val sx = pts.map(p => BigInt(p._1)).sum
      val sy = pts.map(p => BigInt(p._2)).sum
      val sxx = pts.map(p => BigInt(p._1) * p._1).sum
      val sxy = pts.map(p => BigInt(p._1) * p._2).sum
      val den = n * sxx - sx * sx
      val slope = tdiv((n * sxy - sx * sy) * 1000, den)
      val icept = tdiv((sy * sxx - sx * sxy) * 1000, den)
      val sse = pts.map { case (x, y) =>
        val e = BigInt(1000) * y - slope * x - icept
        e * e
      }.sum
      Some((slope.toLong, icept.toLong, tdiv(sse, n).toLong))
    }
  }

  test("integerOlsFit matches BigInt closed forms on random band " +
      "relations, including negative slopes") {
    // dyadic-band shape: distinct x in 0..20, y in 0..30 — the
    // magnitudes q290/q294 feed it (bit lengths of counts)
    val genPts = for {
      k <- Gen.choose(2, 12)
      xs <- Gen.pick(k, 0L to 20L)
      ys <- Gen.listOfN(k, Gen.choose(0L, 30L))
    } yield xs.sorted.zip(ys).toList
    val prop = Prop.forAll(genPts) { pts =>
      val s = spark
      import s.implicits._
      val b = pts.toDF("x", "y").withColumn("lang", lit("zz"))
      val row = Text.integerOlsFit(b, "n_pts").collect()
      val got = row.map(r => (r.getAs[Long]("slope_milli"),
        r.getAs[Long]("icept_milli"), r.getAs[Long]("mse_micro"))).headOption
      got == reference(pts.map(p => (p._1, p._2)))
    }
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }

  test("a descending series fits slope -1000 exactly") {
    val s = spark
    import s.implicits._
    val b = (0L to 10L).map(x => (x, 30L - x)).toDF("x", "y")
      .withColumn("lang", lit("zz"))
    val r = Text.integerOlsFit(b, "n_pts").head
    assert(r.getAs[Long]("slope_milli") == -1000L)
    assert(r.getAs[Long]("icept_milli") == 30000L)
    assert(r.getAs[Long]("mse_micro") == 0L)
  }
}
