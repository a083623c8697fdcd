package graft.cdc

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Jump consistent hash (arXiv:1406.2294) — pinned vectors from an
  * independent big-integer reimplementation of the paper's loop, plus
  * the algorithm's two defining properties. */
class JumpHashSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val genKey = Gen.chooseNum(Long.MinValue, Long.MaxValue)

  test("pinned reference vectors (independent uint64 implementation)") {
    val cases = Seq(
      (0L, 32, 0L), (1L, 32, 17L), (42L, 32, 22L), (12345L, 7, 1L),
      (999999937L, 48, 3L), (2147483648L, 100, 94L),
      (4294967295L, 1, 0L), (87654321L, 1000, 966L),
      // -1L is 2^64-1 when treated as unsigned, the paper's key domain
      (-1L, 64, 10L))
    for ((k, n, want) <- cases)
      assert(JumpHash.shard(k, n) == want, s"jump($k, $n)")
  }

  test("range: result always lands in [0, n)") {
    check(Prop.forAll(genKey, Gen.choose(1, 2048)) { (k, n) =>
      val s = JumpHash.shard(k, n)
      s >= 0 && s < n
    })
  }

  test("consistency: growing n only moves keys to NEW buckets") {
    // the defining property — a key either stays put or moves to a
    // bucket in [n1, n2); it never reshuffles among the old buckets
    check(Prop.forAll(genKey, Gen.choose(1, 500), Gen.choose(1, 500)) {
      (k, a, b) =>
        val (n1, n2) = (math.min(a, b), math.max(a, b))
        val (s1, s2) = (JumpHash.shard(k, n1), JumpHash.shard(k, n2))
        s2 == s1 || s2 >= n1
    })
  }

  test("n = 1 maps everything to bucket 0") {
    check(Prop.forAll(genKey)(k => JumpHash.shard(k, 1) == 0L))
  }

  test("rejects non-positive bucket counts") {
    intercept[IllegalArgumentException](JumpHash.shard(1L, 0))
    intercept[IllegalArgumentException](JumpHash.shard(1L, -3))
  }
}
