package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** q151's scene-cut kernel, exercised directly on hand-built payloads
  * (no Spark session needed — the kernel is a plain function over the
  * bytes, which is exactly why it can run partition-local). */
class SceneCutSpec extends AnyFunSuite {
  import Multimodal.{Ppm, MediaRecord, sceneCuts}

  private def video(w: Int, h: Int, seeds: Seq[Int]): Array[Byte] =
    seeds.map(Ppm.encodeFrame(w, h, _)).reduce(_ ++ _)

  test("constant-seed frames yield zero cuts") {
    val r = MediaRecord(1L, video(8, 6, Seq(10, 10, 10, 10)),
      "video/x-ppm-stream", 8, 6)
    val c = sceneCuts(r)
    assert(c.n_frames == 4 && c.n_cuts == 0 && c.first_cut == -1L &&
      c.max_delta_milli == 0L)
  }

  test("a seed jump is detected at the exact frame index") {
    // frames 0-2 seed 10, frames 3-4 seed 200: one cut at frame 3
    val r = MediaRecord(2L, video(8, 6, Seq(10, 10, 10, 200, 200)),
      "video/x-ppm-stream", 8, 6)
    val c = sceneCuts(r)
    assert(c.n_frames == 5 && c.n_cuts == 1 && c.first_cut == 3L)
    assert(c.max_delta_milli > 0L)
  }

  test("sub-threshold luminance drift is not a cut") {
    // adjacent seeds: mean-lum shift of a +1 seed step is 1 (the lum
    // mix weights sum to 8/8), well under the 10-lum threshold
    val r = MediaRecord(3L, video(8, 6, Seq(10, 11, 12, 13)),
      "video/x-ppm-stream", 8, 6)
    val c = sceneCuts(r)
    assert(c.n_cuts == 0 && c.first_cut == -1L)
  }

  test("a truncated final frame is rejected loudly, not skipped") {
    val full = video(8, 6, Seq(10, 200))
    val torn = java.util.Arrays.copyOf(full, full.length - 5)
    val r = MediaRecord(4L, torn, "video/x-ppm-stream", 8, 6)
    val e = intercept[IllegalArgumentException] { sceneCuts(r) }
    assert(e.getMessage.contains("truncated"))
  }
}
