package graft.cdc

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** The r17 native kernels equal the formulations they replaced:
  *
  *  - [[JsonDepth.delta]] == strip complete string literals with the
  *    original regex (`"([^"\\]|\\.)*"`), then count structural
  *    brackets — including the degenerate unterminated-literal and
  *    trailing-escape cases, where the regex leaves the opening quote
  *    (and everything after it) uncounted as a literal;
  *  - [[PairPack]] == the flatten(transform(transform(...))) packed
  *    i<j pair fanout (same order, same overflow wrap);
  *  - [[SortedInterCount]] == the set-intersection size on sorted
  *    distinct arrays.
  */
class NativeKernelsPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  // ---- JsonDepth vs the regex formula ------------------------------

  private def regexDelta(p: String): Long = {
    val stripped = p.replaceAll("\"([^\"\\\\]|\\\\.)*\"", "")
    stripped.count(c => c == '{' || c == '[').toLong -
      stripped.count(c => c == '}' || c == ']').toLong
  }

  private val frameChar =
    Gen.frequency(6 -> Gen.oneOf('{', '}', '[', ']', '"', '\\', ',', ':'),
      4 -> Gen.alphaNumChar)

  test("json_depth_delta equals the regex strip + bracket count") {
    check(Prop.forAll(Gen.listOf(frameChar).map(_.mkString)) { s =>
      JsonDepth.delta(s) == regexDelta(s)
    })
  }

  test("json_depth_delta on real wal2json chunk frames") {
    val header = """{"change":["""
    val change = """{"kind":"insert","schema":"public","table":"events","columnnames":["event_id","value_str"],"columnvalues":[7,"va{l]ue \" with brackets"]}"""
    val footer = """],"xid":42,"nextlsn":"0/16B3748"}"""
    assert(JsonDepth.delta(header) == 2L)
    assert(JsonDepth.delta(change) == 0L)
    assert(JsonDepth.delta(footer) == -2L)
    for (f <- Seq(header, change, footer))
      assert(JsonDepth.delta(f) == regexDelta(f))
  }

  test("json_depth_delta degenerate literals match the regex") {
    val cases = Seq(
      "\"unterminated {",       // unterminated: bracket counts
      "\"a\\\" {",              // escape eats the would-be closer
      "\"a\" { \"b",            // complete then unterminated
      "\"{\" {",                // bracket inside complete literal
      "\\\"{",                  // escape outside any literal
      "\"ab\\",                 // trailing escape, unterminated
      "\"\"{",                  // empty literal then bracket
      "\"a\"\"b\"[")            // adjacent literals
    for (s <- cases)
      assert(JsonDepth.delta(s) == regexDelta(s), s"frame: $s")
  }

  // ---- PairPack vs the higher-order-function fanout ----------------

  private def hofPairs(a: Seq[Long]): Seq[Long] =
    a.zipWithIndex.flatMap { case (x, i) =>
      a.drop(i + 1).map(y => x * 4294967296L + y)
    }

  test("pair_pack equals the packed i<j fanout, order included") {
    check(Prop.forAll(
      Gen.listOfN(12, Gen.chooseNum(0L, Int.MaxValue.toLong))
        .flatMap(l => Gen.choose(0, l.length).map(l.take))) { a =>
      PairPack(ArrayData.toArrayData(a.toArray)).toLongArray().toSeq ==
        hofPairs(a)
    })
  }

  test("pair_pack overflow wraps exactly like the long arithmetic") {
    val a = Seq(Long.MaxValue / 4294967296L + 1, 17L)
    assert(PairPack(ArrayData.toArrayData(a.toArray)).toLongArray().toSeq
      == hofPairs(a))
  }

  // ---- SortedInterCount vs set intersection ------------------------

  test("sorted_inter_count equals the intersection size") {
    check(Prop.forAll(
      Gen.listOf(Gen.chooseNum(-50L, 50L)),
      Gen.listOf(Gen.chooseNum(-50L, 50L))) { (a0, b0) =>
      val (a, b) = (a0.distinct.sorted, b0.distinct.sorted)
      SortedInterCount(ArrayData.toArrayData(a.toArray),
        ArrayData.toArrayData(b.toArray)) ==
        a.toSet.intersect(b.toSet).size.toLong
    })
  }

  test("sorted_inter_count edge cases") {
    def n(a: Seq[Long], b: Seq[Long]) =
      SortedInterCount(ArrayData.toArrayData(a.toArray),
        ArrayData.toArrayData(b.toArray))
    assert(n(Seq.empty, Seq.empty) == 0L)
    assert(n(Seq(1L, 2L, 3L), Seq.empty) == 0L)
    assert(n(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3L)
    assert(n(Seq(Long.MinValue, Long.MaxValue), Seq(Long.MaxValue)) == 1L)
  }
}
