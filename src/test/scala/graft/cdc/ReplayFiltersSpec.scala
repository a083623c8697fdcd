package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Pattern semantics of wal2json filter-tables / add-tables
  * (`wal2json-plugin-options.type.ts:86-98`). */
class ReplayFiltersSpec extends AnyFunSuite {
  import ReplayFilters._

  test("schema-qualified patterns with wildcards") {
    val ps = parseTablePatterns("public.users,*.foo,bar.*")
    assert(ps == Seq(
      TablePattern(Some("public"), Some("users")),
      TablePattern(None, Some("foo")),
      TablePattern(Some("bar"), None)))
    assert(ps(0).matches("public", "users"))
    assert(!ps(0).matches("other", "users"))
    assert(ps(1).matches("anything", "foo"))
    assert(ps(2).matches("bar", "anything"))
  }

  test("backslash escapes for space, comma, period") {
    // public.Foo\ bar == table "Foo bar" in schema public (doc example)
    val p = parseTablePatterns("""public.Foo\ bar""")
    assert(p == Seq(TablePattern(Some("public"), Some("Foo bar"))))
    // escaped period inside a name is not a qualifier split
    val q = parseTablePatterns("""sch\.ema.t\,bl""")
    assert(q == Seq(TablePattern(Some("sch.ema"), Some("t,bl"))))
  }

  test("escaped asterisk is a literal name, not a wildcard") {
    val r = parseTablePatterns("""public.\*""")
    assert(r == Seq(TablePattern(Some("public"), Some("*"))))
    assert(r.head.matches("public", "*"))
    assert(!r.head.matches("public", "anything"))
  }

  test("patterns are case-sensitive") {
    assert(!parseTablePatterns("public.Users").head.matches("public", "users"))
  }

  test("malformed pattern rejected") {
    intercept[IllegalArgumentException] { parseTablePatterns("no_schema") }
  }
}
