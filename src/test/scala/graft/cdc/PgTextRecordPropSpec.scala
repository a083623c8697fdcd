package graft.cdc

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

/** Property round-trip for the composite/record tokenizer: serialize
  * arbitrary field vectors exactly the way PostgreSQL's `record_out`
  * does (quote when the field contains a delimiter/quote/backslash/
  * whitespace/paren or is empty; double quotes inside quotes; NULL =
  * bare empty), then parse and demand the original fields back. The
  * array tokenizer has the same harness (PgTextArrayPropSpec); this
  * pins the grammar differences — no NULL keyword, parens not braces,
  * empty-vs-NULL disambiguated only by quoting. */
class PgTextRecordPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  /** record_out quoting (PostgreSQL rowtypes docs §8.16.6): a field
    * is quoted iff it is empty or contains `( ) , " \` or
    * whitespace; inside quotes, `"` and `\` are doubled. */
  private def serialize(fields: Seq[Option[String]]): String =
    fields.map {
      case None => ""
      case Some(v) =>
        val needsQuote = v.isEmpty ||
          v.exists(c => "(),\"\\ \t\n".contains(c))
        if (!needsQuote) v
        else "\"" + v.flatMap {
          case '"' => "\"\""
          case '\\' => "\\\\"
          case c => c.toString
        } + "\""
    }.mkString("(", ",", ")")

  private def parse(s: String): Option[Seq[Option[String]]] = {
    val a = PgTextRecord.tokens(UTF8String.fromString(s))
    if (a == null) None
    else Some((0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) None else Some(a.getUTF8String(i).toString)))
  }

  private val fieldGen: Gen[Option[String]] = Gen.frequency(
    2 -> Gen.const(None),
    2 -> Gen.const(Some("")),
    6 -> Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('(', ')', ',', '"', '\\', ' ', '\t'),
      1 -> Gen.oneOf('é', 'ß', '中'))).map(cs => Some(cs.mkString)))

  test("serialize -> tokenize round-trips arbitrary field vectors") {
    check(Prop.forAll(Gen.nonEmptyListOf(fieldGen)) {
      fields: List[Option[String]] =>
        parse(serialize(fields)) == Some(fields)
    })
  }

  test("nested composite round-trips through two applications") {
    check(Prop.forAll(Gen.nonEmptyListOf(fieldGen)) {
      inner: List[Option[String]] =>
        val innerText = serialize(inner)
        val outer = serialize(Seq(Some("x"), Some(innerText), None))
        parse(outer) == Some(Seq(Some("x"), Some(innerText), None)) &&
          parse(innerText) == Some(inner)
    })
  }
}
