package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the whole query registry: the
  * driver consumes `SparkEntry.queries`/`oracleSql` as Maps, so a
  * DUPLICATE QueryDef name would silently shadow an earlier query
  * (one query vanishes from the gate with no error anywhere). Also
  * pins the conventions the correctness gate depends on: every query
  * ships an oracle, and names follow the stable `qNN_slug` shape the
  * bench's prefix-folding relies on. */
class ContractSpec extends AnyFunSuite {

  private lazy val defs = graft.SparkEntry.allDefs

  test("query names are unique (Map construction must not shadow)") {
    val dups = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    assert(dups.isEmpty, s"duplicate QueryDef names: ${dups.mkString(", ")}")
  }

  test("every query ships a DuckDB oracle") {
    val missing = defs.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: ${missing.mkString(", ")}")
    assert(defs.forall(_.oracle.get.trim.nonEmpty))
  }

  test("names follow the qNN_slug convention the bench folds on") {
    // q35b is a historical suffix-letter prefix; Bench's dup-prefix
    // fallback handles it by emitting the full name
    val bad = defs.map(_.name).filterNot(_.matches("q\\d+[a-z]?_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming names: ${bad.mkString(", ")}")
    // distinct numeric prefixes keep the bench's compact keys 1:1
    val prefixes = defs.map(_.name.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      "two queries share a qNN prefix — bench timings would collide")
  }

  test("registry is substantial and stable in shape") {
    assert(defs.size >= 241, s"query registry shrank to ${defs.size}")
    assert(graft.SparkEntry.queries.size == defs.size)
    assert(graft.SparkEntry.oracleSql.size == defs.size)
  }

  test("query numbering is contiguous; intended gaps are pinned here") {
    // r9 verdict ask 7: a silent numbering hole reads as a vanished
    // query. Any INTENTIONAL gap must be listed here with a reason;
    // everything else in [min, max] must exist. (q234 — the one r9
    // hole — is now the streaming contamination probe.)
    val pinnedGaps = Set.empty[Int]
    val nums = defs.map(_.name.drop(1).takeWhile(_.isDigit).toInt).toSet
    val missing = (nums.min to nums.max).toSet -- nums -- pinnedGaps
    assert(missing.isEmpty,
      s"unpinned numbering gaps: ${missing.toSeq.sorted.mkString(", ")}")
  }
}
