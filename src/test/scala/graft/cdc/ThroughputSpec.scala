package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Huge-transaction decode throughput (SURVEY §6 / BASELINE.md): the
  * reference's implied floor is ≥ 5,000 rows/s sustained for a
  * 500,000-row single-UPDATE transaction with 20 text columns
  * (fixture `infra/.../11-fill-data.sh`, budget
  * `decoder-pgoutput.spec.ts:6`). This spec decodes the same shape —
  * single-threaded, like the reference's Node loop — and asserts an
  * order of magnitude above that floor; Spark parallelizes decode
  * across executors on top of this per-core rate.
  */
class ThroughputSpec extends AnyFunSuite {

  test("pgoutput decode sustains >= 50k rows/s on 20-text-col updates") {
    val nCols = 20
    val cols = ColumnInfo("id", 1, 20, -1, null, null) +:
      (1 to nCols).map(i => ColumnInfo(s"column$i", 0, 25, -1, null, null))
    val rel = RelationInfo(4242, "public", "huge_transaction", "default",
      cols)

    val nRows = 100000
    // md5-ish 32-char values like the reference fixture
    val cellValue = "0123456789abcdef0123456789abcdef"
    val values = (i: Int) => i.toString +: Seq.fill(nCols)(cellValue)

    // pre-encode (encoding is not what the reference times)
    val relFrame = PgoutputWriter.relation(rel)
    val frames = new Array[Array[Byte]](nRows)
    var i = 0
    while (i < nRows) {
      frames(i) = PgoutputWriter.update(4242, 'N', Nil, values(i))
      i += 1
    }

    val parser = new PgoutputParser
    parser.parse(relFrame)
    // warm-up JIT
    var w = 0
    while (w < 10000) { parser.parse(frames(w)); w += 1 }

    val t0 = System.nanoTime()
    var n = 0
    var cells = 0L
    while (n < nRows) {
      val e = parser.parse(frames(n))
      cells += e.after.size
      n += 1
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val rate = nRows / secs
    info(f"decoded $nRows%,d rows × ${nCols + 1} cols in $secs%.2f s = $rate%,.0f rows/s (${cells}%,d cells)")
    assert(cells == nRows.toLong * (nCols + 1))
    assert(rate >= 50000,
      f"decode rate $rate%,.0f rows/s below 50k floor (reference floor is 5k)")
  }
}
