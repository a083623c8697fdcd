package graft.cdc

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property tests for the hand-rolled protobuf wire codec: arbitrary
  * xids/values (full int64 range incl. negatives → varint zig-zag-less
  * two's-complement encoding; NaN/inf doubles; unicode strings)
  * survive encode→decode. */
class DecoderbufsPropSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("int64 datums roundtrip the full range") {
    check(Prop.forAll(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(0L, 0xffffffffL)) { (v, xid) =>
      val row = Decoderbufs.encodeRow(xid, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumInt64("n", 20, v)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.tag == "insert" && e.xid == xid && e.after("n") == v.toString
    })
  }

  test("double datums roundtrip including special values") {
    check(Prop.forAll(Gen.oneOf(
      Gen.chooseNum(-1e300, 1e300),
      Gen.oneOf(0.0, -0.0, Double.MinPositiveValue,
        Double.PositiveInfinity, Double.NegativeInfinity))) { v =>
      val row = Decoderbufs.encodeRow(1L, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumDouble("d", 701, v)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.after("d") == v.toString
    })
  }

  test("unicode string datums roundtrip") {
    check(Prop.forAll(
      Gen.listOf(Gen.choose(0x20.toChar, 0x2FFF.toChar)).map(_.mkString)) { v =>
      val row = Decoderbufs.encodeRow(1L, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumString("s", 25, v)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.after("s") == v
    })
  }

  test("int32 datums roundtrip the full range including negatives") {
    check(Prop.forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { v =>
      val row = Decoderbufs.encodeRow(1L, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumInt32("i", 23, v)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.after("i") == v.toString
    })
  }

  test("float datums roundtrip") {
    check(Prop.forAll(Gen.chooseNum(-1e30f, 1e30f)) { v =>
      val row = Decoderbufs.encodeRow(1L, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumFloat("f", 700, v)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.after("f") == v.toDouble.toString
    })
  }

  test("bool and bytes datums roundtrip") {
    check(Prop.forAll(Gen.oneOf(true, false),
      Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { (b, bs) =>
      val bytes = bs.toArray
      val row = Decoderbufs.encodeRow(1L, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumBool("b", 16, b),
          Decoderbufs.encodeDatumBytes("y", 17, bytes)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.after("b") == b.toString &&
        e.after("y") == "\\x" + bytes.map("%02x".format(_)).mkString
    })
  }

  test("point datums roundtrip coordinates") {
    check(Prop.forAll(Gen.chooseNum(-1e6, 1e6), Gen.chooseNum(-1e6, 1e6)) {
      (x, y) =>
      val row = Decoderbufs.encodeRow(1L, 0L, "public.t", Decoderbufs.OpInsert,
        Seq(Decoderbufs.encodeDatumPoint("p", 600, x, y)))
      val e = Decoderbufs.toChangeEvent(Decoderbufs.decode(row))
      e.after("p") == s"($x,$y)"
    })
  }
}
