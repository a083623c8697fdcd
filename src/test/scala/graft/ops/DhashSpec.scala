package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** q167's dHash kernel against an independent recomputation straight
  * from the pixel formula (no codec involved) — catches drift in the
  * header walk, pixel indexing, grid sampling, or bit packing. */
class DhashSpec extends AnyFunSuite {
  import Multimodal._

  private def rec(id: Long): MediaRecord = {
    val w = (id % 16 + 1).toInt
    val h = (id % 12 + 1).toInt
    val payload = Ppm.encodeFrame(w, h, ((id * 31) % 256).toInt)
    MediaRecord(id, payload, "image/x-portable-pixmap", w, h)
  }

  // the synthesis formula, independent of the codec: encodeFrame fills
  // pixel (x, y) with channels ((x*7+y*13+s)%256, (x*3+y*5+2s)%256,
  // (x+y+3s)%256); lum = (2r+5g+b)/8
  private def lumFormula(x: Int, y: Int, s: Int): Int =
    (2 * ((x * 7 + y * 13 + s) % 256) + 5 * ((x * 3 + y * 5 + 2 * s) % 256) +
      ((x + y + 3 * s) % 256)) / 8

  private def expected(id: Long): (Long, Long) = {
    val w = (id % 16 + 1).toInt
    val h = (id % 12 + 1).toInt
    val s = ((id * 31) % 256).toInt
    def g(i: Int, j: Int) = lumFormula(j * w / 9, i * h / 8, s)
    var h1 = 0L
    var h2 = 0L
    for (i <- 0 until 8; j <- 0 until 8)
      if (g(i, j + 1) > g(i, j)) {
        val k = i * 8 + j
        if (k < 32) h1 |= 1L << k else h2 |= 1L << (k - 32)
      }
    (h1, h2)
  }

  test("codec-path dhash equals the formula recomputation") {
    for (id <- 0L until 200L) {
      val d = dhash(rec(id))
      assert((d.h1, d.h2) == expected(id), s"doc $id")
    }
  }

  test("halves stay within uint32 (no BIGINT overflow on the oracle side)") {
    for (id <- 0L until 200L) {
      val d = dhash(rec(id))
      assert(d.h1 >= 0L && d.h1 < (1L << 32))
      assert(d.h2 >= 0L && d.h2 < (1L << 32))
    }
  }

  test("identical images hash identically; dims classes collide as designed") {
    // ids congruent mod lcm(16,12,256-cycle) share (w, h, seed) and
    // must collapse — the exact-dup group q167 reports
    val a = dhash(rec(5L))
    val b = dhash(rec(5L))
    assert((a.h1, a.h2) == (b.h1, b.h2))
  }
}
