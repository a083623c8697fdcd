package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property tests for test_decoding escaping: arbitrary values pass
  * through the single-quote + `''`-escape encoding and the recursive-
  * descent parser unchanged (the reference's PEG grammar quote rules,
  * `test_decoding/decoder.ts:31-37`). */
class TestDecodingPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  /** value → test_decoding single-quoted literal (`'` doubles). */
  private def quote(v: String): String =
    "'" + v.replace("'", "''") + "'"

  private val genValue: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString),
    Gen.oneOf("it's", "''", "a'b'c", "trailing'", "'leading",
      "spaces in value", "null", "[type]:"))

  test("quoted values roundtrip through the grammar") {
    check(Prop.forAll(genValue, genValue) { (v1, v2) =>
      val line = s"table public.props: INSERT: " +
        s"a[text]:${quote(v1)} b[text]:${quote(v2)}"
      val e = TestDecodingParser.parse(line)
      e.tag == "insert" && e.table == "props" &&
        e.after == Map("a" -> v1, "b" -> v2)
    })
  }

  test("null literal vs quoted 'null' string stay distinct") {
    val e = TestDecodingParser.parse(
      "table public.t: UPDATE: a[text]:null b[text]:'null'")
    assert(e.after("a") == null)
    assert(e.after("b") == "null")
  }
}
