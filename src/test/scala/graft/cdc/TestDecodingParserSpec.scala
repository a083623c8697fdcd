package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** test_decoding text parse — the grammar cases of
  * `src/output-plugins/test_decoding/decoder.ts:11-41`. */
class TestDecodingParserSpec extends AnyFunSuite {

  test("BEGIN / COMMIT with and without xid") {
    assert(TestDecodingParser.parse("BEGIN 1234").tag == "begin")
    assert(TestDecodingParser.parse("BEGIN 1234").xid == 1234L)
    assert(TestDecodingParser.parse("BEGIN").xid == 0L)
    val c = TestDecodingParser.parse(
      "COMMIT 1234 (at 2026-01-01 00:00:00.000000+00)")
    assert(c.tag == "commit" && c.xid == 1234L)
    assert(c.commitTimeMicros == 1767225600000000L)
  }

  test("INSERT with typed data and quoted value escapes") {
    val e = TestDecodingParser.parse(
      "table public.users: INSERT: id[bigint]:1 firstname[text]:'a''b' " +
        "deleted[boolean]:false created[timestamp with time zone]:" +
        "'2026-01-01 00:00:00+00'")
    assert(e.tag == "insert" && e.schema == "public" && e.table == "users")
    assert(e.after("id") == "1")
    assert(e.after("firstname") == "a'b") // '' unescapes to '
    assert(e.after("deleted") == "false")
    assert(e.after("created") == "2026-01-01 00:00:00+00")
    assert(e.columns.map(_.typeName) ==
      Seq("bigint", "text", "boolean", "timestamp with time zone"))
  }

  test("null literal becomes null value") {
    val e = TestDecodingParser.parse(
      "table public.users: UPDATE: id[bigint]:1 email[character varying]:null")
    assert(e.tag == "update")
    assert(e.after("email") == null)
  }

  test("DELETE data lands in before") {
    val e = TestDecodingParser.parse(
      "table public.users: DELETE: id[bigint]:7")
    assert(e.before("id") == "7")
    assert(e.after == null)
  }

  test("quoted identifiers with doubled-quote escapes") {
    val e = TestDecodingParser.parse(
      "table \"my schema\".\"weird\"\"tbl\": INSERT: \"col name\"[text]:'v'")
    assert(e.schema == "my schema")
    assert(e.table == "weird\"tbl")
    assert(e.after("col name") == "v")
  }

  test("(no-tuple-data) parenthesized case") {
    val e = TestDecodingParser.parse(
      "table public.users: INSERT: (no-tuple-data)")
    assert(e.tag == "insert")
    assert(new String(e.messageContent) == "no-tuple-data")
  }

  test("render/parse roundtrip with escapes") {
    val data = Seq(
      TestDecodingParser.Datum("id", "bigint", "1"),
      TestDecodingParser.Datum("note", "text", "it's 'quoted' here"),
      TestDecodingParser.Datum("gone", "text", null))
    val line = TestDecodingParser.render("public", "users", "UPDATE", data)
    val e = TestDecodingParser.parse(line)
    assert(e.after("note") == "it's 'quoted' here")
    assert(e.after("gone") == null)
  }
}
