package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** The Misra-Gries contract q103's oracle audits, exercised directly:
  * for ANY stream, ANY chunking into partial buffers, and a left-fold
  * merge tree (exactly Spark's partial/final aggregation shape),
  * every key satisfies 0 ≤ exact − estimate ≤ n/(k+1), and keys with
  * frequency above n/(k+1) survive in the sketch. */
class MisraGriesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private def run(stream: Seq[String], k: Int, chunks: Int): Map[String, Long] = {
    val mg = new Aggregators.MisraGries(k)
    val parts = if (chunks <= 1) Seq(stream)
      else stream.grouped(math.max(1, stream.size / chunks)).toSeq
    val buffers = parts.map(_.foldLeft(mg.zero)(mg.reduce))
    buffers.reduceLeftOption(mg.merge).getOrElse(mg.zero)
  }

  private val streamGen = for {
    n <- Gen.chooseNum(1, 400)
    // skewed alphabet: small keyspace so some keys are heavy
    s <- Gen.listOfN(n, Gen.frequency(
      (5, Gen.const("hot")), (3, Gen.const("warm")),
      (2, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))))
  } yield s

  test("exact - estimate stays within [0, n/(k+1)] under any merge tree") {
    check(Prop.forAll(streamGen, Gen.chooseNum(1, 8), Gen.chooseNum(1, 7)) {
      (stream: List[String], k: Int, chunks: Int) =>
        val sketch = run(stream, k, chunks)
        val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
        val n = stream.size.toLong
        val bound = n / (k + 1)
        exact.foreach { case (key, c) =>
          val est = sketch.getOrElse(key, 0L)
          assert(est <= c, s"overcount for $key: est=$est exact=$c")
          assert(c - est <= bound,
            s"bound violated for $key: est=$est exact=$c n=$n k=$k")
          if (c > bound)
            assert(sketch.contains(key), s"heavy key $key evicted")
        }
        sketch.size <= k
    })
  }
}
