package graft.cdc

/** Plugin SPI — the Scala analogue of the reference's
  * `AbstractPlugin { name; start(client, slot, lsn); parse(buffer) }`
  * (`src/output-plugins/abstract.plugin.ts:3-9`). `parse` yields the
  * canonical [[ChangeEvent]] rows; `startReplicationSql` reproduces
  * each plugin's `START_REPLICATION` option serialization byte-for-
  * byte (no live PostgreSQL in this environment, but the strings are
  * part of the reference's tested surface).
  */
trait CdcFormat extends Serializable {
  def name: String
  def startReplicationSql(slotName: String, lastLsn: String): String
  def parse(payload: Array[Byte]): Seq[ChangeEvent]
}

/** pgoutput — options serialized per `pgoutput-plugin.ts:24-34`. */
final class PgoutputFormat(
    protoVersion: Int = 1,
    publicationNames: Seq[String] = Nil,
    messages: Boolean = false) extends CdcFormat {
  @transient private lazy val parser = new PgoutputParser

  def name = "pgoutput"

  def startReplicationSql(slotName: String, lastLsn: String): String = {
    val options = Seq(
      s"proto_version '$protoVersion'",
      s"publication_names '${publicationNames.mkString(",")}'",
      s"messages '$messages'")
    s"""START_REPLICATION SLOT "$slotName" LOGICAL $lastLsn (${options.mkString(", ")})"""
  }

  def parse(payload: Array[Byte]): Seq[ChangeEvent] = Seq(parser.parse(payload))
}

/** test_decoding — options per `test-decoding-plugin.ts:47-59`
  * (note the reference's ` , ` separator and fixed leading pair). */
final class TestDecodingFormat(
    includeXids: Boolean = false,
    includeTimestamp: Boolean = false,
    skipEmptyXacts: Boolean = false,
    includeRewrites: Boolean = false,
    includeSequences: Boolean = false,
    streamChanges: Boolean = false) extends CdcFormat {

  def name = "test_decoding"

  def startReplicationSql(slotName: String, lastLsn: String): String = {
    def onOff(b: Boolean) = if (b) "on" else "off"
    val options = Seq(
      s""""include-xids" '${onOff(includeXids)}'""",
      s""""include-timestamp" '${onOff(includeTimestamp)}'""") ++
      (if (skipEmptyXacts) Seq(""""skip-empty-xacts" 'on'""") else Nil) ++
      (if (includeRewrites) Seq(""""include-rewrites" 'on'""") else Nil) ++
      (if (includeSequences) Seq(""""include-sequences" 'on'""") else Nil) ++
      (if (streamChanges) Seq(""""stream-changes" 'on'""") else Nil)
    s"""START_REPLICATION SLOT "$slotName" LOGICAL $lastLsn (${options.mkString(" , ")})"""
  }

  def parse(payload: Array[Byte]): Seq[ChangeEvent] =
    Seq(TestDecodingParser.parse(new String(payload, "UTF-8")))
}

/** wal2json — camelCase→dash-case option names, string-valued vs
  * on/off-valued split per `wal2json-plugin.ts:18-29` and
  * `wal2json-plugin-options.type.ts:122-130`. Parsing happens in
  * Spark via `from_json` ([[CdcFunctions.wal2jsonChanges]]); this
  * class only carries the protocol-side surface.
  */
final class Wal2JsonFormat(options: Seq[(String, Any)] = Nil) extends CdcFormat {
  // option keys whose values serialize as strings, not on/off
  // (wal2json-plugin-options.type.ts:122-130)
  private val stringKeys = Set("filterOrigins", "filterTables", "addTables",
    "filterMsgPrefixes", "addMsgPrefixes", "formatVersion", "actions")

  def name = "wal2json"

  private def dashCase(s: String): String =
    s.flatMap(c => if (c.isUpper) "-" + c.toLower else c.toString)

  def startReplicationSql(slotName: String, lastLsn: String): String = {
    val opts = options.map { case (k, v) =>
      if (stringKeys(k)) s""""${dashCase(k)}" '$v'"""
      else s""""${dashCase(k)}" '${if (v == true) "on" else "off"}'"""
    }
    val base = s"""START_REPLICATION SLOT "$slotName" LOGICAL $lastLsn"""
    if (opts.isEmpty) base else s"$base (${opts.mkString(" , ")})"
  }

  def parse(payload: Array[Byte]): Seq[ChangeEvent] =
    throw new UnsupportedOperationException(
      "wal2json decodes via Spark from_json — CdcFunctions.wal2jsonChanges")
}

/** decoderbufs — no options (`decoderbufs-plugin.ts:29-36`). */
final class DecoderbufsFormat extends CdcFormat {
  def name = "decoderbufs"

  def startReplicationSql(slotName: String, lastLsn: String): String =
    s"""START_REPLICATION SLOT "$slotName" LOGICAL $lastLsn"""

  def parse(payload: Array[Byte]): Seq[ChangeEvent] =
    Seq(Decoderbufs.toChangeEvent(Decoderbufs.decode(payload)))
}
