package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** LSN + PG-epoch codecs (reference binary-reader.ts:75-91, ack carry
  * logical-replication-service.ts:266-272). */
class LsnSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("parse known forms") {
    assert(Lsn.parse("0/0") == 0L)
    assert(Lsn.parse("0/00000000") == 0L)
    assert(Lsn.parse("16/B374D848") == (0x16L << 32 | 0xb374d848L))
    assert(Lsn.parse("FFFFFFFF/FFFFFFFF") == -1L) // max uint64
  }

  test("format pads to 8 hex chars per word, upper-case") {
    assert(Lsn.format(0L) == "00000000/00000000")
    assert(Lsn.format(0x16L << 32 | 0xb374d848L) == "00000016/B374D848")
  }

  test("roundtrip property") {
    check(Prop.forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue)) { l: Long =>
      Lsn.parse(Lsn.format(l)) == l && Lsn.parse(Lsn.formatUnpadded(l)) == l
    })
  }

  test("plusOne carries across the 32-bit word boundary") {
    val atBoundary = (5L << 32) | 0xffffffffL
    assert(Lsn.plusOne(atBoundary) == (6L << 32))
    assert(Lsn.format(Lsn.plusOne(atBoundary)) == "00000006/00000000")
  }

  test("signed hex words are rejected (not silently corrupted)") {
    intercept[IllegalArgumentException] { Lsn.parse("-1/0") }
    intercept[IllegalArgumentException] { Lsn.parse("16/-B374") }
    intercept[IllegalArgumentException] { Lsn.parse("100000000/0") } // > 32 bits
  }

  test("unsigned compare") {
    assert(Lsn.compare(-1L, 1L) > 0) // 0xFFFF.../... is the largest
    assert(Lsn.compare(1L, 2L) < 0)
  }

  test("PG epoch offset matches the reference constant") {
    // binary-reader.ts:90 — 946684800000000 µs between 1970 and 2000
    assert(PgEpoch.toUnixMicros(0L) == 946684800000000L)
    assert(PgEpoch.fromUnixMicros(PgEpoch.toUnixMicros(12345L)) == 12345L)
  }
}
