package graft.cdc

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** longest_repeat kernel vs an O(n^3) brute force — the rolling-hash
  * + verify path must be EXACT (a collision may cost time, never
  * correctness). Small alphabets force dense repeats; adversarial
  * hand cases pin the boundaries. */
class LongestRepeatSpec extends AnyFunSuite {

  private def lr(toks: Seq[String]): Long =
    LongestRepeat(new GenericArrayData(
      toks.map(t => if (t == null) null else UTF8String.fromString(t))
        .toArray[Any]))

  private def brute(toks: Seq[String]): Long = {
    val n = toks.length
    var best = 0
    for (k <- 1 until n; i <- 0 to n - k; j <- (i + 1) to (n - k))
      if (toks.slice(i, i + k) == toks.slice(j, j + k) && k > best)
        best = k
    best.toLong
  }

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("hand cases") {
    assert(lr(Nil) == 0L)
    assert(lr(Seq("a")) == 0L)
    assert(lr(Seq("a", "b")) == 0L)
    assert(lr(Seq("a", "a")) == 1L)
    assert(lr(Seq("a", "b", "a", "b")) == 2L)          // overlap-free
    assert(lr(Seq("a", "a", "a")) == 2L)               // overlapping runs
    assert(lr(Seq("x", "a", "b", "c", "y", "a", "b", "c")) == 3L)
    assert(lr(Seq.fill(6)("t")) == 5L)                 // all-equal: n-1
  }

  test("agrees with brute force on small random token arrays") {
    val tok = Gen.oneOf("a", "b", "c")
    check(Prop.forAll(Gen.choose(0, 24).flatMap(Gen.listOfN(_, tok))) {
      toks => lr(toks) == brute(toks)
    })
  }

  test("agrees with brute force on a larger alphabet") {
    val tok = Gen.oneOf((1 to 12).map(i => s"w$i"))
    check(Prop.forAll(Gen.choose(0, 40).flatMap(Gen.listOfN(_, tok))) {
      toks => lr(toks) == brute(toks)
    })
  }

  test("null elements compare equal to each other") {
    assert(lr(Seq("a", null, "b", null)) == 1L)
    assert(lr(Seq(null, null, null)) == 2L)
  }
}
