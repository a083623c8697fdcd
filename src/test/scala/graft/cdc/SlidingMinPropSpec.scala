package graft.cdc

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** The monotonic-deque sliding minimum equals the brute-force window
  * minimum on arbitrary input — including duplicates, monotone runs,
  * and extreme values — and degenerate windows yield empty output. */
class SlidingMinPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def brute(a: Seq[Long], w: Int): Seq[Long] =
    if (w <= 0 || a.length < w) Seq.empty
    else a.sliding(w).map(_.min).toSeq

  private def native(a: Seq[Long], w: Int): Seq[Long] =
    SlidingMin(ArrayData.toArrayData(a.toArray), w).toLongArray().toSeq

  test("deque minima equal brute-force minima on arbitrary arrays") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue)),
      Gen.chooseNum(1, 40)) { (a, w) =>
      native(a, w) == brute(a, w)
    })
  }

  test("duplicate-heavy and monotone runs") {
    for (a <- Seq(Seq.fill(10)(7L), (1L to 10L).toSeq,
        (10L to 1L by -1).toSeq, Seq(3L, 3L, 1L, 3L, 3L, 1L));
        w <- 1 to 6)
      assert(native(a, w) == brute(a, w), s"a=$a w=$w")
  }

  test("degenerate windows") {
    assert(native(Seq(1L, 2L), 3) == Seq.empty)
    assert(native(Seq.empty, 1) == Seq.empty)
    assert(native(Seq(5L), 0) == Seq.empty)
  }
}
