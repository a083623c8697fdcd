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

  val defs: Seq[QueryDef] = Seq(
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
