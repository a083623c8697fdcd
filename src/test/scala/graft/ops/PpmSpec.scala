package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal.{MediaRecord, Ppm}

/** The real PPM codec behind q32/q50: encode→parse roundtrip, comment
  * and whitespace handling, truncation/garbage rejection, multi-frame
  * scan, and the integer resize-fit math. */
class PpmSpec extends AnyFunSuite {

  test("encode -> parse roundtrip recovers dimensions and pixels") {
    val bytes = Ppm.encodeFrame(5, 3, seed = 42)
    val f = Ppm.parseFrame(bytes, 0)
    assert(f.width == 5 && f.height == 3)
    assert(f.end == bytes.length)
    // spot-check a pixel: (x=4, y=2)
    val expLum = Ppm.lum(Ppm.r(4, 2, 42), Ppm.g(4, 2, 42), Ppm.b(4, 2, 42))
    assert(f.lumAt(bytes, 4, 2) == expLum)
  }

  test("header parser skips comment lines and arbitrary whitespace") {
    val manual = ("P6\n# one comment\n#another\n  12\t7\n# late comment\n255\n"
      .getBytes("US-ASCII")) ++ new Array[Byte](3 * 12 * 7)
    val f = Ppm.parseFrame(manual, 0)
    assert(f.width == 12 && f.height == 7)
  }

  test("garbage and truncation are rejected loudly") {
    intercept[IllegalArgumentException] {
      Ppm.parseFrame("JFIF-not-a-ppm".getBytes("US-ASCII"), 0)
    }
    val truncated = Ppm.encodeFrame(4, 4, 1).dropRight(5)
    intercept[IllegalArgumentException] { Ppm.parseFrame(truncated, 0) }
    intercept[IllegalArgumentException] {
      Ppm.parseFrame("P6\n2 2\n999\n".getBytes("US-ASCII"), 0) // bad maxval
    }
  }

  test("multi-frame payload scans sequentially; every 2nd frame sampled") {
    val payload = Ppm.encodeFrame(3, 2, 10) ++ Ppm.encodeFrame(3, 2, 27) ++
      Ppm.encodeFrame(3, 2, 44)
    val rec = MediaRecord(7L, payload, "image/x-portable-pixmap", 3, 2)
    val s = Multimodal.sample(rec)
    assert(s.n_frames == 3 && s.n_sampled == 2) // frames 0 and 2
    // sampled sum = full-lum sums of frames seeded 10 and 44
    def frameLumSum(seed: Int): Long =
      (for (y <- 0 until 2; x <- 0 until 3)
        yield Ppm.lum(Ppm.r(x, y, seed), Ppm.g(x, y, seed),
          Ppm.b(x, y, seed)).toLong).sum
    assert(s.sampled_lum_sum == frameLumSum(10) + frameLumSum(44))
  }

  test("resize fit: aspect preserved, clamped to >= 1") {
    assert(Ppm.fit(4, 3, 8) == (4, 3))      // already inside the box
    assert(Ppm.fit(16, 12, 8) == (8, 6))    // exact 2:1 shrink
    assert(Ppm.fit(16, 1, 8) == (8, 1))     // thin strip stays >= 1
    assert(Ppm.fit(1, 16, 8) == (1, 8))
  }

  test("decode computes pixel-derived features from the bytes only") {
    // metadata lies about dimensions: the parser must not trust it
    val payload = Ppm.encodeFrame(6, 4, 99)
    val rec = MediaRecord(1L, payload, "image/x-portable-pixmap", 999, 999)
    val f = Multimodal.decode(rec)
    assert(f.width == 6 && f.height == 4)
    assert(f.n_bytes == payload.length)
    val lums = for (y <- 0 until 4; x <- 0 until 6)
      yield Ppm.lum(Ppm.r(x, y, 99), Ppm.g(x, y, 99), Ppm.b(x, y, 99))
    assert(f.mean_lum == lums.map(_.toLong).sum / lums.size)
    assert(f.n_bright == lums.count(_ >= 128))
  }
}
