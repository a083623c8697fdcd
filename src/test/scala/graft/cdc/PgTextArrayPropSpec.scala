package graft.cdc

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property: rendering any element list in postgres-array text form
  * (quoting/escaping per the PG array-output rules) and tokenizing it
  * back recovers the original elements — including embedded commas,
  * quotes, backslashes, braces, whitespace, empty strings, the
  * literal string "NULL" (must quote), and SQL NULLs. */
class PgTextArrayPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** PG's array_out quoting rule: quote unless the element is a
    * nonempty string free of specials and not (case-insensitively)
    * "null". Inside quotes, backslash-escape `\` and `"`. */
  private def render(elems: Seq[Option[String]]): String =
    elems.map {
      case None => "NULL"
      case Some(s) =>
        val needsQuote = s.isEmpty || s.equalsIgnoreCase("null") ||
          s.exists(c => c == ',' || c == '"' || c == '\\' || c == '{' ||
            c == '}' || c == ' ' || c == '\t' || c == '\n')
        if (!needsQuote) s
        else "\"" + s.flatMap {
          case '\\' => "\\\\"
          case '"' => "\\\""
          case c => c.toString
        } + "\""
    }.mkString("{", ",", "}")

  private def parse(s: String): Seq[Option[String]] = {
    val a = PgTextArray.tokens(UTF8String.fromString(s))
    assert(a != null, s"tokenizer rejected: $s")
    (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) None else Some(a.getUTF8String(i).toString))
  }

  private val element: Gen[Option[String]] = Gen.frequency(
    1 -> Gen.const(None),
    1 -> Gen.const(Some("")),
    1 -> Gen.const(Some("NULL")),
    7 -> Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf(',', '"', '\\', '{', '}', ' ', '\t'))).map(cs =>
      Some(cs.mkString)))

  test("render -> tokenize roundtrips arbitrary element lists") {
    check(Prop.forAll(Gen.listOf(element)) { elems =>
      parse(render(elems)) == elems
    })
  }

  test("the empty array is empty, not a single empty element") {
    assert(parse("{}") == Seq.empty)
    assert(parse("""{""}""") == Seq(Some("")))
  }

  test("2-D arrays roundtrip: outer tokens are re-tokenizable literals") {
    check(Prop.forAll(Gen.listOf(Gen.listOf(element))) { rows =>
      val rendered =
        rows.map(render).mkString("{", ",", "}")
      val outer = parse(rendered)
      outer.length == rows.length &&
        outer.zip(rows).forall { case (lit, row) =>
          lit.exists(l => parse(l) == row)
        }
    })
  }
}
