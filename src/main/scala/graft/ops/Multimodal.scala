package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * a typed metadata struct, and a batched per-partition "decode"
  * stage — the shape a real image/audio pipeline needs on Spark
  * (schema, partitioning, batch iteration), with the actual codec
  * STUBBED deterministically because no media libraries exist in this
  * container. The stub derives the payload from `documents.text`
  * bytes so the DuckDB oracle can recompute every output.
  *
  * Scale notes (100 TB): payloads never leave their partition — the
  * decode is `mapPartitions` over the typed Dataset (one JVM pass,
  * batch-shaped like `mapInPandas`), metadata-only columns flow to
  * downstream relational ops, and nothing is collected to the driver.
  */
object Multimodal {
  import Tables._

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      payload: Array[Byte],
      mime: String,
      width: Int,
      height: Int)

  /** Extracted features (decode output). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      brightness: Long,
      aspect_millis: Long,
      mime: String)

  /** STUB decode — stands in for an image/audio codec. Deterministic:
    * "brightness" is the sum of the first 16 payload bytes mod 256;
    * a real implementation would decode pixels here. */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val head = rec.payload.take(16)
    val brightness = head.foldLeft(0L)((a, b) => a + (b & 0xff)) % 256
    MediaFeatures(
      doc_id = rec.doc_id,
      n_bytes = rec.payload.length.toLong,
      brightness = brightness,
      aspect_millis = if (rec.height == 0) 0L
        else rec.width.toLong * 1000L / rec.height,
      mime = rec.mime)
  }

  /** documents → media records (payload = utf-8 text bytes, metadata
    * derived deterministically). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      lit("text/plain").as("mime"),
      (col("n_chars") % 640).cast("int").as("width"),
      ((col("doc_id") * 37) % 480 + 1).cast("int").as("height"))

  /** Resize + frame-sample output (stub codec, real plumbing). */
  final case class MediaSample(
      doc_id: Long,
      n_frames: Long,
      n_sampled: Long,
      frame_checksum: Long,
      new_w: Int,
      new_h: Int)

  /** STUB resize/frame-sample — stands in for pixel resampling and
    * video frame extraction. Frames are 64-byte payload chunks; every
    * 4th frame is "sampled" and checksummed; resize fits (w, h) into a
    * 128×128 box preserving aspect ratio with integer arithmetic. */
  def sampleStub(rec: MediaRecord): MediaSample = {
    val frameLen = 64
    val nFrames = (rec.payload.length + frameLen - 1) / frameLen
    var checksum = 0L
    var sampled = 0L
    var f = 0
    while (f < nFrames) {
      if (f % 4 == 0) {
        sampled += 1
        var i = f * frameLen
        val end = math.min(i + frameLen, rec.payload.length)
        while (i < end) { checksum += (rec.payload(i) & 0xff); i += 1 }
      }
      f += 4
    }
    val m = math.max(rec.width, rec.height)
    val (nw, nh) =
      if (m <= 128) (rec.width, rec.height)
      else (rec.width * 128 / m, rec.height * 128 / m)
    MediaSample(rec.doc_id, nFrames.toLong, sampled, checksum, nw, nh)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q50_multimodal_frame_sample",
      """SELECT doc_id,
        |  (octet_length(encode(text)) + 63) // 64 AS n_frames,
        |  ((octet_length(encode(text)) + 63) // 64 + 3) // 4 AS n_sampled,
        |  CAST(list_sum(list_transform(range(1, length(text) + 1),
        |    i -> CASE WHEN ((i - 1) // 64) % 4 = 0
        |              THEN unicode(substr(text, i, 1)) ELSE 0 END))
        |    AS BIGINT) AS frame_checksum,
        |  CASE WHEN greatest(n_chars % 640, (doc_id * 37) % 480 + 1) <= 128
        |       THEN n_chars % 640
        |       ELSE (n_chars % 640) * 128
        |            // greatest(n_chars % 640, (doc_id * 37) % 480 + 1)
        |       END AS new_w,
        |  CASE WHEN greatest(n_chars % 640, (doc_id * 37) % 480 + 1) <= 128
        |       THEN (doc_id * 37) % 480 + 1
        |       ELSE ((doc_id * 37) % 480 + 1) * 128
        |            // greatest(n_chars % 640, (doc_id * 37) % 480 + 1)
        |       END AS new_h
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = mediaTable(s, d).as[MediaRecord]
      media.mapPartitions(_.map(sampleStub))
        .toDF()
        .select(col("doc_id"), col("n_frames"), col("n_sampled"),
          col("frame_checksum"), col("new_w").cast("long").as("new_w"),
          col("new_h").cast("long").as("new_h"))
        .orderBy(col("doc_id"))
    },

    QueryDef(
      "q32_multimodal_decode",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(list_sum(list_transform(
        |    range(1, least(17, length(text) + 1)),
        |    i -> unicode(substr(text, i, 1)))) % 256 AS BIGINT) AS brightness,
        |  (n_chars % 640) * 1000 // ((doc_id * 37) % 480 + 1) AS aspect_millis,
        |  'text/plain' AS mime
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      import s.implicits._
      val media = mediaTable(s, d).as[MediaRecord]
      // batched per-partition decode: the payload bytes never move
      media.mapPartitions(_.map(decodeStub))
        .toDF()
        .select(col("doc_id"), col("n_bytes"), col("brightness"),
          col("aspect_millis"), col("mime"))
        .orderBy(col("doc_id"))
    }
  )
}
