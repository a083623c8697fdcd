package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: media as opaque `binary` payloads with
  * typed metadata, and a batched per-partition decode stage — the
  * shape an image/audio pipeline needs on Spark (schema, partitioning,
  * batch iteration). The codec is REAL: payloads are binary P6 PPM
  * images (multi-frame, concatenated — the "video" analogue) and the
  * decode parses headers (magic, comments, dimensions, maxval) and raw
  * RGB pixels with no library dependency. Payload pixels are a
  * deterministic function of `doc_id`, so the DuckDB oracle recomputes
  * every pixel-derived feature closed-form — any parser defect breaks
  * the hash match.
  *
  * Scale notes (100 TB): payloads never leave their partition — both
  * synthesis and decode run inside `mapPartitions`-shaped Dataset
  * passes (the JVM analogue of `mapInPandas` batches), feature-only
  * columns flow to downstream relational ops, and nothing is collected
  * to the driver.
  */
object Multimodal {
  import Tables._

  /** Minimal real P6 (binary) PPM codec. */
  object Ppm {
    val Comment = "# graft synthetic"

    /** Deterministic pixel channels — integer formulas kept simple so
      * the oracle can restate them in SQL. */
    @inline def r(x: Int, y: Int, seed: Int): Int = (x * 7 + y * 13 + seed) % 256
    @inline def g(x: Int, y: Int, seed: Int): Int = (x * 3 + y * 5 + 2 * seed) % 256
    @inline def b(x: Int, y: Int, seed: Int): Int = (x + y + 3 * seed) % 256
    /** Integer luminance: weights 2/5/1 of 8 (a BT.601-shaped mix that
      * stays exact in integer math on both engines). */
    @inline def lum(r: Int, g: Int, b: Int): Int = (2 * r + 5 * g + b) / 8

    /** One frame: header (with a comment line — decoders must skip
      * them) + row-major RGB bytes. */
    def encodeFrame(w: Int, h: Int, seed: Int): Array[Byte] = {
      val header = s"P6\n$Comment\n$w $h\n255\n"
        .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val px = new Array[Byte](3 * w * h)
      var i = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          px(i) = r(x, y, seed).toByte
          px(i + 1) = g(x, y, seed).toByte
          px(i + 2) = b(x, y, seed).toByte
          i += 3
          x += 1
        }
        y += 1
      }
      header ++ px
    }

    final case class Frame(width: Int, height: Int, pixelsOffset: Int) {
      def end: Int = pixelsOffset + 3 * width * height
      @inline def lumAt(payload: Array[Byte], x: Int, y: Int): Int = {
        val i = pixelsOffset + 3 * (y * width + x)
        lum(payload(i) & 0xff, payload(i + 1) & 0xff, payload(i + 2) & 0xff)
      }
    }

    /** Parse one frame starting at `off`: P6 magic, whitespace and
      * `#` comment lines, width/height/maxval, then the single
      * whitespace byte preceding raw pixel data. */
    def parseFrame(bytes: Array[Byte], off0: Int): Frame = {
      var off = off0
      require(off + 2 <= bytes.length &&
        bytes(off) == 'P' && bytes(off + 1) == '6',
        s"not a P6 ppm at offset $off0")
      off += 2
      def skipWs(): Unit = {
        var go = true
        while (go && off < bytes.length) {
          val c = bytes(off)
          if (c == '#') while (off < bytes.length && bytes(off) != '\n') off += 1
          else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') off += 1
          else go = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = 0
        require(off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9',
          s"expected digit at offset $off")
        while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') {
          v = v * 10 + (bytes(off) - '0')
          off += 1
        }
        v
      }
      val w = readInt()
      val h = readInt()
      val maxval = readInt()
      require(maxval == 255, s"unsupported maxval $maxval")
      off += 1 // exactly one whitespace byte before pixel data
      require(off + 3 * w * h <= bytes.length, "truncated pixel data")
      Frame(w, h, off)
    }

    /** Fit (w, h) into a box×box square, aspect-preserving, integer
      * nearest-neighbor; degenerate 0 clamped to 1. */
    def fit(w: Int, h: Int, box: Int): (Int, Int) = {
      val m = math.max(w, h)
      if (m <= box) (w, h)
      else (math.max(1, w * box / m), math.max(1, h * box / m))
    }
  }

  /** Minimal real RIFF/WAVE PCM codec — the audio analogue of [[Ppm]]:
    * a correct chunk-walking parser (ids, little-endian sizes, odd-size
    * pad bytes, unknown chunks skipped) with no library dependency. */
  object Wav {
    val SampleRate = 8000

    /** Deterministic 16-bit waveform — restated closed-form by the
      * oracle. */
    @inline def sampleAt(id: Long, i: Int): Int =
      ((id * 7 + i * 13) % 2048).toInt - 1024

    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
      b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
    }
    private def tag(b: Array[Byte], off: Int, s: String): Unit = {
      var i = 0
      while (i < 4) { b(off + i) = s.charAt(i).toByte; i += 1 }
    }

    /** Mono 16-bit PCM with a junk LIST chunk BETWEEN fmt and data —
      * a parser that assumes "data follows fmt" breaks on it. Layout:
      * RIFF(12) fmt(24) LIST(12) data(8 + 2n) = 56 + 2n bytes. */
    def encode(id: Long, n: Int): Array[Byte] = {
      val total = 56 + 2 * n
      val b = new Array[Byte](total)
      tag(b, 0, "RIFF"); le32(b, 4, total - 8); tag(b, 8, "WAVE")
      tag(b, 12, "fmt "); le32(b, 16, 16)
      b(20) = 1; b(21) = 0 // PCM
      b(22) = 1; b(23) = 0 // mono
      le32(b, 24, SampleRate)
      le32(b, 28, SampleRate * 2) // byte rate
      b(32) = 2; b(33) = 0        // block align
      b(34) = 16; b(35) = 0       // bits per sample
      tag(b, 36, "LIST"); le32(b, 40, 4); tag(b, 44, "INFO")
      tag(b, 48, "data"); le32(b, 52, 2 * n)
      var i = 0
      while (i < n) {
        val v = sampleAt(id, i)
        b(56 + 2 * i) = v.toByte
        b(56 + 2 * i + 1) = (v >> 8).toByte
        i += 1
      }
      b
    }

    final case class Pcm(sampleRate: Int, bitsPerSample: Int,
        channels: Int, dataOffset: Int, dataSize: Int)

    private def readLe32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    private def readLe16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
    private def tagAt(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Walk the chunk list: fmt and data located by id, every other
      * chunk skipped (odd sizes padded to even, per RIFF). */
    def parse(b: Array[Byte]): Pcm = {
      require(b.length >= 12 && tagAt(b, 0) == "RIFF" &&
        tagAt(b, 8) == "WAVE", "not a RIFF/WAVE payload")
      var off = 12
      var rate = -1; var bits = -1; var chans = -1
      var dOff = -1; var dSize = -1
      while (off + 8 <= b.length) {
        val id = tagAt(b, off)
        val size = readLe32(b, off + 4)
        val body = off + 8
        id match {
          case "fmt " =>
            require(readLe16(b, body) == 1, "not PCM")
            chans = readLe16(b, body + 2)
            rate = readLe32(b, body + 4)
            bits = readLe16(b, body + 14)
          case "data" => dOff = body; dSize = size
          case _ => () // junk chunk: skipped, never interpreted
        }
        off = body + size + (size & 1) // odd chunks pad to even
      }
      require(rate > 0 && dOff >= 0, "missing fmt or data chunk")
      require(bits == 16 && chans == 1, s"unsupported pcm $bits/$chans")
      Pcm(rate, bits, chans, dOff, dSize)
    }

    @inline def sampleAtOffset(b: Array[Byte], off: Int): Int =
      (((b(off + 1) & 0xff) << 8) | (b(off) & 0xff)).toShort.toInt
  }

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  /** q32 decode output — everything pixel- or header-derived. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      mean_lum: Long,
      n_bright: Long,
      mime: String)

  /** q167 dHash output: 64 gradient bits split into two uint32 halves
    * (a single 64-bit hash would set bit 63 and overflow DuckDB's
    * BIGINT sum on the oracle side). */
  final case class ImageDhash(doc_id: Long, h1: Long, h2: Long)

  /** Difference hash over the REAL decoded frame 0: nearest-neighbor
    * sample a 9×8 luminance grid, emit one bit per horizontal
    * gradient (left < right). Identical images hash equal; small
    * seed drift flips few bits — the perceptual-dedup primitive. */
  def dhash(rec: MediaRecord): ImageDhash = {
    val f = Ppm.parseFrame(rec.payload, 0)
    val g = Array.ofDim[Int](8, 9)
    var i = 0
    while (i < 8) {
      var j = 0
      while (j < 9) {
        g(i)(j) = f.lumAt(rec.payload,
          j * f.width / 9, i * f.height / 8)
        j += 1
      }
      i += 1
    }
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < 8) {
      var j = 0
      while (j < 8) {
        if (g(i)(j + 1) > g(i)(j)) {
          val k = i * 8 + j
          if (k < 32) h1 |= 1L << k else h2 |= 1L << (k - 32)
        }
        j += 1
      }
      i += 1
    }
    ImageDhash(rec.doc_id, h1, h2)
  }

  /** q147 audio decode output — everything byte- or sample-derived. */
  final case class AudioFeatures(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Long,
      n_samples: Long,
      duration_ms: Long,
      peak_abs: Long,
      power: Long,
      zero_crossings: Long)

  /** documents → WAV records: (doc_id % 50 + 10) mono PCM samples. */
  def wavTable(s: SparkSession, d: String): Dataset[(Long, Array[Byte])] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long]
      .map(id => (id, Wav.encode(id, (id % 50 + 10).toInt)))
  }

  /** REAL audio decode: chunk-walk the RIFF container (rate and sample
    * count come from the bytes, not metadata), then one pass over the
    * PCM samples for peak, integer power (sum of squares DIV n) and
    * zero crossings. */
  def decodeWav(rec: (Long, Array[Byte])): AudioFeatures = {
    val (id, bytes) = rec
    val pcm = Wav.parse(bytes)
    val n = pcm.dataSize / 2
    var peak = 0L
    var sumSq = 0L
    var zc = 0L
    var prev = 0
    var i = 0
    while (i < n) {
      val v = Wav.sampleAtOffset(bytes, pcm.dataOffset + 2 * i)
      if (math.abs(v) > peak) peak = math.abs(v)
      sumSq += v.toLong * v
      if (i > 0 && prev * v < 0) zc += 1
      prev = v
      i += 1
    }
    AudioFeatures(id, bytes.length.toLong, pcm.sampleRate.toLong,
      n.toLong, n.toLong * 1000 / pcm.sampleRate, peak, sumSq / n, zc)
  }

  /** q168 audio fingerprint: 8 windows × 4-bit quantized energy share
    * packed into one 32-bit value — an energy-contour hash. */
  final case class AudioFingerprint(doc_id: Long, fp: Long)

  /** Energy-contour fingerprint over the REAL decoded PCM: samples
    * split into 8 equal windows by `(idx * 8) DIV n`, per-window sum
    * of squares quantized to its 4-bit share of total energy —
    * clips with the same loudness shape collide, the audio analogue
    * of q167's image dHash. */
  def audioFingerprint(rec: (Long, Array[Byte])): AudioFingerprint = {
    val (id, bytes) = rec
    val pcm = Wav.parse(bytes)
    val n = pcm.dataSize / 2
    val win = new Array[Long](8)
    var total = 0L
    var i = 0
    while (i < n) {
      val v = Wav.sampleAtOffset(bytes, pcm.dataOffset + 2 * i).toLong
      win((i * 8 / n).toInt) += v * v
      total += v * v
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 8) {
      val q = win(k) * 16 / (total + 1)
      fp |= q << (4 * k)
      k += 1
    }
    AudioFingerprint(id, fp)
  }

  /** q50 frame-sample + resize output. */
  final case class MediaSample(
      doc_id: Long,
      n_frames: Long,
      n_sampled: Long,
      sampled_lum_sum: Long,
      new_w: Long,
      new_h: Long,
      resize_checksum: Long)

  /** q151 scene-cut detection output. */
  final case class SceneCuts(
      doc_id: Long,
      n_frames: Long,
      n_cuts: Long,
      first_cut: Long,
      max_delta_milli: Long)

  /** documents → shot-structured "videos": (doc_id % 8 + 4) frames
    * grouped into 3-frame shots, shot s seeded (doc_id*31 + s*53) %
    * 256 — luminance statistics are constant inside a shot and jump
    * at shot boundaries (mostly; the threshold decides from the
    * BYTES, not the shot arithmetic). */
  def videoTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val w = (id % 16 + 1).toInt
      val h = (id % 12 + 1).toInt
      val f = (id % 8 + 4).toInt
      val payload = (0 until f).iterator
        .map(fr => Ppm.encodeFrame(w, h,
          ((id * 31 + (fr / 3) * 53) % 256).toInt))
        .reduce(_ ++ _)
      MediaRecord(id, payload, "video/x-ppm-stream", w, h)
    }
  }

  /** REAL scene-cut detection: frames discovered by sequential header
    * parsing, per-frame luminance summed from the pixel bytes, a cut
    * flagged where the mean-luminance delta between consecutive
    * frames exceeds 10 (compared as integer sums: |Δsum| > 10·n_px,
    * no division until the report). */
  def sceneCuts(rec: MediaRecord): SceneCuts = {
    var off = 0
    var prevSum = 0L
    var nPx = 0L
    var nFrames = 0L
    var nCuts = 0L
    var firstCut = -1L
    var maxDelta = 0L
    while (off < rec.payload.length) {
      val fr = Ppm.parseFrame(rec.payload, off)
      nPx = fr.width.toLong * fr.height
      var lumSum = 0L
      var y = 0
      while (y < fr.height) {
        var x = 0
        while (x < fr.width) {
          lumSum += fr.lumAt(rec.payload, x, y)
          x += 1
        }
        y += 1
      }
      if (nFrames > 0) {
        val delta = math.abs(lumSum - prevSum)
        if (delta > 10 * nPx) {
          nCuts += 1
          if (firstCut < 0) firstCut = nFrames
        }
        if (delta > maxDelta) maxDelta = delta
      }
      prevSum = lumSum
      off = fr.end
      nFrames += 1
    }
    SceneCuts(rec.doc_id, nFrames, nCuts, firstCut,
      maxDelta * 1000 / nPx)
  }

  /** documents → media records: a (doc_id % 3 + 1)-frame P6 "video",
    * frame f seeded with (doc_id*31 + f*17) % 256, dimensions
    * (doc_id % 16 + 1) × (doc_id % 12 + 1). Synthesis is executor-side
    * and partition-local. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    documents(s, d).select(col("doc_id")).as[Long].map { id =>
      val w = (id % 16 + 1).toInt
      val h = (id % 12 + 1).toInt
      val k = (id % 3 + 1).toInt
      val payload = (0 until k).iterator
        .map(f => Ppm.encodeFrame(w, h, ((id * 31 + f * 17) % 256).toInt))
        .reduce(_ ++ _)
      MediaRecord(id, payload, "image/x-portable-pixmap", w, h)
    }
  }

  /** REAL decode of the first frame: parse the header (dimensions come
    * from the bytes, not the metadata), walk the RGB triples, compute
    * integer mean luminance and the bright-pixel count. */
  def decode(rec: MediaRecord): MediaFeatures = {
    val frame = Ppm.parseFrame(rec.payload, 0)
    var lumSum = 0L
    var nBright = 0L
    var i = frame.pixelsOffset
    val end = frame.end
    while (i < end) {
      val l = Ppm.lum(rec.payload(i) & 0xff, rec.payload(i + 1) & 0xff,
        rec.payload(i + 2) & 0xff)
      lumSum += l
      if (l >= 128) nBright += 1
      i += 3
    }
    val nPixels = frame.width.toLong * frame.height
    MediaFeatures(rec.doc_id, rec.payload.length.toLong,
      frame.width.toLong, frame.height.toLong,
      lumSum / nPixels, nBright, rec.mime)
  }

  /** REAL frame scan + sample + resize: frames are discovered by
    * sequential header parsing (n_frames is not metadata), every 2nd
    * frame is decoded and luminance-summed, and frame 0 is resized
    * into an 8×8 box by integer nearest-neighbor with a checksum over
    * the resampled luminances. */
  def sample(rec: MediaRecord): MediaSample = {
    var off = 0
    var nFrames = 0L
    var nSampled = 0L
    var lumSum = 0L
    var frame0: Ppm.Frame = null
    while (off < rec.payload.length) {
      val fr = Ppm.parseFrame(rec.payload, off)
      if (nFrames == 0) frame0 = fr
      if (nFrames % 2 == 0) {
        nSampled += 1
        var y = 0
        while (y < fr.height) {
          var x = 0
          while (x < fr.width) {
            lumSum += fr.lumAt(rec.payload, x, y)
            x += 1
          }
          y += 1
        }
      }
      off = fr.end
      nFrames += 1
    }
    val (nw, nh) = Ppm.fit(frame0.width, frame0.height, 8)
    var checksum = 0L
    var i = 0
    while (i < nh) {
      var j = 0
      while (j < nw) {
        val sx = j * frame0.width / nw
        val sy = i * frame0.height / nh
        checksum += frame0.lumAt(rec.payload, sx, sy)
        j += 1
      }
      i += 1
    }
    MediaSample(rec.doc_id, nFrames, nSampled, lumSum,
      nw.toLong, nh.toLong, checksum)
  }

  // ---- oracle SQL building blocks (closed-form restatements of the
  // synthesized pixels; `//` keeps everything integer) ----
  private val dimsSql =
    """SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h,
      |    doc_id % 3 + 1 AS k FROM documents""".stripMargin
  private def lumSql(seed: String): String =
    s"(2*((x*7 + y*13 + $seed) % 256) + 5*((x*3 + y*5 + 2*($seed)) % 256)" +
      s" + ((x + y + 3*($seed)) % 256)) // 8"

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q32_multimodal_decode",
      s"""WITH d AS ($dimsSql),
         |px AS (SELECT doc_id, ${lumSql("(doc_id * 31) % 256")} AS lum
         |  FROM d, UNNEST(range(0, h)) t(y), UNNEST(range(0, w)) u(x)),
         |st AS (SELECT doc_id, count(*) AS n_px, sum(lum) AS lum_sum,
         |    sum(CASE WHEN lum >= 128 THEN 1 ELSE 0 END) AS n_bright
         |  FROM px GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(k * (3 + 18 + length(CAST(w AS VARCHAR)) + 1
         |    + length(CAST(h AS VARCHAR)) + 1 + 4 + 3*w*h) AS BIGINT)
         |    AS n_bytes,
         |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
         |  CAST(lum_sum // n_px AS BIGINT) AS mean_lum,
         |  CAST(n_bright AS BIGINT) AS n_bright,
         |  'image/x-portable-pixmap' AS mime
         |FROM d JOIN st ON d.doc_id = st.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      // batched per-partition decode: payload bytes never move; the
      // oracle's n_bytes term is the exact P6 header length (magic 3 +
      // comment 18 + dims + maxval 4) so a synthesis/parse drift in
      // either header or pixels breaks the match
      mediaTable(s, d).map(decode)(
        org.apache.spark.sql.Encoders.product[MediaFeatures])
        .toDF()
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q50_multimodal_frame_sample",
      s"""WITH d AS ($dimsSql),
         |dim AS (SELECT doc_id, w, h, k, greatest(w, h) AS m FROM d),
         |rs AS (SELECT doc_id, w, h, k,
         |    CASE WHEN m <= 8 THEN w ELSE greatest(1, w * 8 // m) END AS nw,
         |    CASE WHEN m <= 8 THEN h ELSE greatest(1, h * 8 // m) END AS nh
         |  FROM dim),
         |samp AS (SELECT doc_id, sum(lum) AS lum_sum FROM (
         |    SELECT rs.doc_id, ${lumSql("(doc_id * 31 + f * 17) % 256")} AS lum
         |    FROM rs, UNNEST(range(0, k)) fr(f),
         |      UNNEST(range(0, h)) t(y), UNNEST(range(0, w)) u(x)
         |    WHERE f % 2 = 0) GROUP BY doc_id),
         |rz AS (SELECT doc_id, sum(lum) AS cks FROM (
         |    SELECT doc_id, ${lumSql("(doc_id * 31) % 256")} AS lum
         |    FROM (SELECT doc_id, j * w // nw AS x, i * h // nh AS y
         |      FROM rs, UNNEST(range(0, nh)) t(i), UNNEST(range(0, nw)) u(j))
         |  ) GROUP BY doc_id)
         |SELECT rs.doc_id, CAST(k AS BIGINT) AS n_frames,
         |  CAST((k + 1) // 2 AS BIGINT) AS n_sampled,
         |  CAST(samp.lum_sum AS BIGINT) AS sampled_lum_sum,
         |  CAST(nw AS BIGINT) AS new_w, CAST(nh AS BIGINT) AS new_h,
         |  CAST(rz.cks AS BIGINT) AS resize_checksum
         |FROM rs JOIN samp ON rs.doc_id = samp.doc_id
         |JOIN rz ON rs.doc_id = rz.doc_id
         |ORDER BY rs.doc_id""".stripMargin) { (s, d) =>
      // frame discovery is a real sequential header scan; sampling
      // decodes every 2nd frame; resize is integer nearest-neighbor
      // over frame 0 — all reproduced closed-form by the oracle
      mediaTable(s, d).map(sample)(
        org.apache.spark.sql.Encoders.product[MediaSample])
        .toDF()
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q147_audio_features",
      s"""WITH d AS (SELECT doc_id, doc_id % 50 + 10 AS n FROM documents),
         |s AS (SELECT doc_id, n, i,
         |    ((doc_id * 7 + i * 13) % 2048) - 1024 AS v
         |  FROM d, UNNEST(range(0, n)) u(i)),
         |zc AS (SELECT a.doc_id,
         |    count(CASE WHEN a.v * b.v < 0 THEN 1 END) AS z
         |  FROM s a JOIN s b ON b.doc_id = a.doc_id AND b.i = a.i + 1
         |  GROUP BY a.doc_id),
         |st AS (SELECT doc_id, max(n) AS n, max(abs(v)) AS peak,
         |    sum(v * v) AS sq
         |  FROM s GROUP BY doc_id)
         |SELECT st.doc_id,
         |  CAST(56 + 2 * st.n AS BIGINT) AS n_bytes,
         |  CAST(8000 AS BIGINT) AS sample_rate,
         |  CAST(st.n AS BIGINT) AS n_samples,
         |  CAST(st.n * 1000 // 8000 AS BIGINT) AS duration_ms,
         |  CAST(peak AS BIGINT) AS peak_abs,
         |  CAST(sq // st.n AS BIGINT) AS power,
         |  CAST(coalesce(zc.z, 0) AS BIGINT) AS zero_crossings
         |FROM st LEFT JOIN zc ON zc.doc_id = st.doc_id
         |ORDER BY st.doc_id""".stripMargin) { (s, d) =>
      // the audio arm of the multimodal surface: payloads are REAL
      // RIFF/WAVE containers (with a junk LIST chunk the parser must
      // skip by walking ids+sizes, never by assuming layout); rate and
      // sample count are read from the bytes. The oracle's n_bytes
      // term is the exact container length (56 + 2n), so any drift in
      // either the writer or the chunk walker breaks the hash match.
      // Same scale shape as q32/q50: payloads never leave their
      // partition, only fixed-width features flow downstream.
      wavTable(s, d).map(decodeWav)(
        org.apache.spark.sql.Encoders.product[AudioFeatures])
        .toDF()
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q151_scene_cuts",
      s"""WITH d AS (SELECT doc_id, doc_id % 16 + 1 AS w,
         |    doc_id % 12 + 1 AS h, doc_id % 8 + 4 AS f FROM documents),
         |fi AS (SELECT doc_id, w, h, fr
         |  FROM d, UNNEST(range(0, f)) t(fr)),
         |px AS (SELECT doc_id, w, h, fr,
         |    ${lumSql("(doc_id * 31 + (fr // 3) * 53) % 256")} AS lum
         |  FROM fi, UNNEST(range(0, h)) t(y), UNNEST(range(0, w)) u(x)),
         |ls AS (SELECT doc_id, w, h, fr, sum(lum) AS ml
         |  FROM px GROUP BY 1, 2, 3, 4),
         |dl AS (SELECT doc_id, w, h, fr, ml,
         |    lag(ml) OVER (PARTITION BY doc_id ORDER BY fr) AS pml
         |  FROM ls),
         |ct AS (SELECT doc_id, w, h, fr, abs(ml - pml) AS delta,
         |    CASE WHEN abs(ml - pml) > 10 * w * h THEN 1 ELSE 0 END AS cut
         |  FROM dl WHERE pml IS NOT NULL)
         |SELECT d.doc_id, CAST(f AS BIGINT) AS n_frames,
         |  CAST(sum(cut) AS BIGINT) AS n_cuts,
         |  CAST(coalesce(min(CASE WHEN cut = 1 THEN fr END), -1) AS BIGINT)
         |    AS first_cut,
         |  CAST(max(delta) * 1000 // (d.w * d.h) AS BIGINT)
         |    AS max_delta_milli
         |FROM d JOIN ct ON ct.doc_id = d.doc_id
         |GROUP BY d.doc_id, f, d.w, d.h
         |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      // the video arm: shot-structured multi-frame payloads, cuts
      // detected from the BYTES (sequential header walk + pixel sums,
      // |Δ lum_sum| > 10·n_px — integer throughout). The oracle
      // recomputes every frame's luminance sum closed-form and runs
      // the same lag/threshold, so parser drift on ANY frame breaks
      // the match. Partition-local like q32/q50: payloads never
      // shuffle, five integers per doc flow downstream.
      videoTable(s, d).map(sceneCuts)(
        org.apache.spark.sql.Encoders.product[SceneCuts])
        .toDF()
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q167_image_dhash_dedup",
      s"""WITH d AS ($dimsSql),
         |grid AS (SELECT doc_id, i, j,
         |    ${lumSql("(doc_id * 31) % 256")} AS lum
         |  FROM (SELECT doc_id, i, j, (j * w) // 9 AS x, (i * h) // 8 AS y,
         |          w, h
         |        FROM d, UNNEST(range(0, 8)) t(i), UNNEST(range(0, 9)) u(j))),
         |bits AS (SELECT a.doc_id, a.i * 8 + a.j AS k,
         |    CASE WHEN b.lum > a.lum THEN 1 ELSE 0 END AS bit
         |  FROM grid a JOIN grid b
         |    ON b.doc_id = a.doc_id AND b.i = a.i AND b.j = a.j + 1
         |  WHERE a.j < 8),
         |hs AS (SELECT doc_id,
         |    sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
         |        ELSE 0 END) AS h1,
         |    sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
         |        ELSE 0 END) AS h2
         |  FROM bits GROUP BY doc_id)
         |SELECT CAST(h1 AS BIGINT) AS h1, CAST(h2 AS BIGINT) AS h2,
         |  count(*) AS n_images,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM hs GROUP BY h1, h2 HAVING count(*) >= 2
         |ORDER BY h1, h2""".stripMargin) { (s, d) =>
      // Perceptual image dedup — the multimodal arm of the dedup
      // north star: dHash (9×8 nearest-neighbor luminance grid, one
      // bit per horizontal gradient) over the REAL decoded frame-0
      // bytes, then exact-hash grouping exactly like q28's text
      // fingerprints. Identical renders collapse regardless of how
      // their doc ids differ; the oracle recomputes the same 64 bits
      // closed-form from the pixel formula, so a drift anywhere in
      // the codec path (header walk, pixel indexing, grid sampling,
      // bit packing) breaks the hash match. Per-partition decode —
      // payloads never shuffle; only (doc_id, h1, h2) moves into the
      // keyed group. At 100 TB this is the image analogue of exact
      // text dedup: one map-side decode pass + one hash groupBy;
      // near-dup (hamming ≤ t) layers the q27 band join on top of
      // the same 64 bits.
      mediaTable(s, d).map(dhash)(
        org.apache.spark.sql.Encoders.product[ImageDhash])
        .toDF()
        .groupBy(col("h1"), col("h2"))
        .agg(count(lit(1)).as("n_images"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .filter(col("n_images") >= 2)
        .orderBy(col("h1"), col("h2"))
    },

    QueryDef(
      "q168_audio_fingerprint_dedup",
      s"""WITH d AS (SELECT doc_id, doc_id % 50 + 10 AS n FROM documents),
         |s AS (SELECT doc_id, n, i, (i * 8) // n AS k,
         |    ((doc_id * 7 + i * 13) % 2048) - 1024 AS v
         |  FROM d, UNNEST(range(0, n)) u(i)),
         |w AS (SELECT doc_id, k, sum(v * v) AS e FROM s
         |      GROUP BY doc_id, k),
         |tot AS (SELECT doc_id, sum(e) AS te FROM w GROUP BY doc_id),
         |fp AS (SELECT w.doc_id,
         |    sum((e * 16 // (te + 1)) * (1::BIGINT << (4 * k))) AS fp
         |  FROM w JOIN tot ON tot.doc_id = w.doc_id GROUP BY w.doc_id)
         |SELECT CAST(fp AS BIGINT) AS fp, count(*) AS n_clips,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM fp GROUP BY fp HAVING count(*) >= 2
         |ORDER BY fp""".stripMargin) { (s, d) =>
      // Audio fingerprint dedup — the WAV arm of perceptual dedup
      // beside q167's image dHash: the REAL chunk-walked PCM stream
      // splits into 8 equal windows, each window's sum-of-squares
      // energy quantizes to its 4-bit share of the clip's total, and
      // the 8 nibbles pack into one 32-bit energy-contour hash.
      // Clips with the same loudness shape collide regardless of doc
      // id; the oracle rebuilds the identical integer pipeline from
      // the sample formula, so drift in the chunk walker, sample
      // indexing, window split, or nibble packing breaks the match.
      // Per-partition decode, one keyed groupBy — the exact-dedup
      // shape at any scale; near-dup layers a nibble-band join on
      // the same 32 bits.
      wavTable(s, d).map(audioFingerprint)(
        org.apache.spark.sql.Encoders.product[AudioFingerprint])
        .toDF()
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_clips"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .filter(col("n_clips") >= 2)
        .orderBy(col("fp"))
    }
  )
}
