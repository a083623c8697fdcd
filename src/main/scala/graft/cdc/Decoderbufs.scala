package graft.cdc

import scala.collection.mutable.ArrayBuffer

/** Hand-rolled protobuf wire codec for the tiny decoderbufs
  * `RowMessage` schema (reference embeds the descriptor at
  * `src/output-plugins/decoderbufs/pg_logicaldec.proto.ts:112-155`;
  * decode entry `decoderbufs-plugin.ts:38-40`). The schema is five
  * message types — hand-decoding ~100 lines beats dragging in a
  * protobuf runtime, and keeps the decode loop allocation-light for
  * executor-side use.
  */
object Decoderbufs {

  // Op enum (proto.ts:11-19)
  val OpInsert = 0; val OpUpdate = 1; val OpDelete = 2
  val OpBegin = 3; val OpCommit = 4

  final case class Datum(
      columnName: String,
      columnType: Long,
      kind: String,   // int32|int64|float|double|bool|string|bytes|point|missing|none
      int64Value: Long,
      doubleValue: Double,
      boolValue: Boolean,
      stringValue: String,
      bytesValue: Array[Byte],
      pointX: Double,
      pointY: Double) {
    /** Canonical text rendering for the ChangeEvent map transport. */
    def text: String = kind match {
      case "int32" | "int64" => int64Value.toString
      case "float" | "double" => doubleValue.toString
      case "bool" => boolValue.toString
      case "string" => stringValue
      case "bytes" => "\\x" + bytesValue.map("%02x".format(_)).mkString
      case "point" => s"($pointX,$pointY)"
      case _ => null
    }
  }

  final case class RowMessage(
      transactionId: Long,
      commitTimeMicros: Long,   // wire µs (unix epoch per debezium plugin)
      table: String,
      op: Int,
      newTuple: Seq[Datum],
      oldTuple: Seq[Datum])

  // ---- protobuf wire primitives ----

  private final class PbReader(buf: Array[Byte]) {
    var p = 0
    def hasMore: Boolean = p < buf.length
    def readVarint(): Long = {
      var shift = 0; var result = 0L
      while (true) {
        val b = buf(p); p += 1
        result |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      result
    }
    def readFixed64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (buf(p + i).toLong & 0xff) << (8 * i); i += 1 }
      p += 8
      v
    }
    def readFixed32(): Int = {
      val v = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8) |
        ((buf(p + 2) & 0xff) << 16) | ((buf(p + 3) & 0xff) << 24)
      p += 4
      v
    }
    def readBytes(): Array[Byte] = {
      val n = readVarint().toInt
      val out = java.util.Arrays.copyOfRange(buf, p, p + n); p += n; out
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => p += 8
      case 2 => p += readVarint().toInt
      case 5 => p += 4
      case other => throw new IllegalArgumentException(s"wire type $other")
    }
  }

  private def decodePoint(b: Array[Byte]): (Double, Double) = {
    val r = new PbReader(b)
    var x = 0.0; var y = 0.0
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >> 3).toInt match {
        case 1 => x = java.lang.Double.longBitsToDouble(r.readFixed64())
        case 2 => y = java.lang.Double.longBitsToDouble(r.readFixed64())
        case _ => r.skip((tag & 7).toInt)
      }
    }
    (x, y)
  }

  private def decodeDatum(b: Array[Byte]): Datum = {
    val r = new PbReader(b)
    var name: String = null; var ctype = 0L; var kind = "none"
    var i64 = 0L; var dbl = 0.0; var bool = false
    var str: String = null; var bytes: Array[Byte] = null
    var px = 0.0; var py = 0.0
    while (r.hasMore) {
      val tag = r.readVarint()
      val field = (tag >> 3).toInt
      field match {
        case 1 => name = new String(r.readBytes(), "UTF-8")
        case 2 => ctype = r.readVarint()
        case 3 => kind = "int32"; i64 = r.readVarint().toInt.toLong
        case 4 => kind = "int64"; i64 = r.readVarint()
        case 5 => kind = "float"
          dbl = java.lang.Float.intBitsToFloat(r.readFixed32()).toDouble
        case 6 => kind = "double"
          dbl = java.lang.Double.longBitsToDouble(r.readFixed64())
        case 7 => kind = "bool"; bool = r.readVarint() != 0
        case 8 => kind = "string"; str = new String(r.readBytes(), "UTF-8")
        case 9 => kind = "bytes"; bytes = r.readBytes()
        case 10 => kind = "point"
          val (x, y) = decodePoint(r.readBytes()); px = x; py = y
        case 11 => kind = "missing"; r.readVarint()
        case _ => r.skip((tag & 7).toInt)
      }
    }
    Datum(name, ctype, kind, i64, dbl, bool, str, bytes, px, py)
  }

  def decode(buf: Array[Byte]): RowMessage = {
    val r = new PbReader(buf)
    var xid = 0L; var commitTime = 0L; var table: String = null
    var op = -1
    val newT = ArrayBuffer.empty[Datum]; val oldT = ArrayBuffer.empty[Datum]
    while (r.hasMore) {
      val tag = r.readVarint()
      (tag >> 3).toInt match {
        case 1 => xid = r.readVarint()
        case 2 => commitTime = r.readVarint()
        case 3 => table = new String(r.readBytes(), "UTF-8")
        case 4 => op = r.readVarint().toInt
        case 5 => newT += decodeDatum(r.readBytes())
        case 6 => oldT += decodeDatum(r.readBytes())
        case _ => r.skip((tag & 7).toInt)
      }
    }
    RowMessage(xid, commitTime, table, op, newT.toSeq, oldT.toSeq)
  }

  def toChangeEvent(m: RowMessage): ChangeEvent = {
    val tagName = m.op match {
      case OpInsert => "insert"; case OpUpdate => "update"
      case OpDelete => "delete"; case OpBegin => "begin"
      case OpCommit => "commit"; case _ => "unknown"
    }
    // decoderbufs table is "schema.table"
    val (sch, tbl) = m.table match {
      case null => (null, null)
      case t => t.indexOf('.') match {
        case -1 => (null, t)
        case i => (t.substring(0, i), t.substring(i + 1))
      }
    }
    val newMap =
      if (m.newTuple.isEmpty) null else m.newTuple.map(d => d.columnName -> d.text).toMap
    val oldMap =
      if (m.oldTuple.isEmpty) null else m.oldTuple.map(d => d.columnName -> d.text).toMap
    val cols =
      if (m.newTuple.isEmpty) null
      else m.newTuple.map(d => ColumnInfo(d.columnName, 0, d.columnType.toInt, -1, null, null))
    ChangeEvent.empty.copy(
      tag = tagName, xid = m.transactionId,
      commitTimeMicros = m.commitTimeMicros,
      schema = sch, table = tbl,
      before = oldMap, after = newMap, columns = cols)
  }

  // ---- encoder (fixtures + roundtrip query) ----

  private final class PbWriter {
    val out = new java.io.ByteArrayOutputStream()
    def writeVarint(v0: Long): this.type = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt); this
    }
    def writeTag(field: Int, wire: Int): this.type =
      writeVarint((field.toLong << 3) | wire)
    def writeFixed64(v: Long): this.type = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
      this
    }
    def writeFixed32(v: Int): this.type = {
      var i = 0
      while (i < 4) { out.write(((v >>> (8 * i)) & 0xff)); i += 1 }
      this
    }
    def writeBytes(field: Int, b: Array[Byte]): this.type = {
      writeTag(field, 2).writeVarint(b.length); out.write(b, 0, b.length); this
    }
    def writeString(field: Int, s: String): this.type =
      writeBytes(field, s.getBytes("UTF-8"))
    def result(): Array[Byte] = out.toByteArray
  }

  def encodeDatumString(name: String, columnType: Long, v: String): Array[Byte] = {
    val w = new PbWriter().writeString(1, name)
    w.writeTag(2, 0).writeVarint(columnType)
    if (v == null) w.writeTag(11, 0).writeVarint(1)
    else w.writeString(8, v)
    w.result()
  }

  def encodeDatumInt64(name: String, columnType: Long, v: Long): Array[Byte] =
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeTag(4, 0).writeVarint(v).result()

  /** negative int32 encodes as the 10-byte sign-extended varint, like
    * standard protobuf int32 (decode truncates back via toInt). */
  def encodeDatumInt32(name: String, columnType: Long, v: Int): Array[Byte] =
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeTag(3, 0).writeVarint(v.toLong).result()

  def encodeDatumFloat(name: String, columnType: Long, v: Float): Array[Byte] =
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeTag(5, 5).writeFixed32(java.lang.Float.floatToIntBits(v))
      .result()

  def encodeDatumBool(name: String, columnType: Long, v: Boolean): Array[Byte] =
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeTag(7, 0).writeVarint(if (v) 1L else 0L).result()

  def encodeDatumBytes(name: String, columnType: Long,
      v: Array[Byte]): Array[Byte] =
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeBytes(9, v).result()

  def encodeDatumDouble(name: String, columnType: Long, v: Double): Array[Byte] =
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeTag(6, 1).writeFixed64(java.lang.Double.doubleToLongBits(v))
      .result()

  def encodeDatumPoint(name: String, columnType: Long, x: Double,
      y: Double): Array[Byte] = {
    val point = new PbWriter()
      .writeTag(1, 1).writeFixed64(java.lang.Double.doubleToLongBits(x))
      .writeTag(2, 1).writeFixed64(java.lang.Double.doubleToLongBits(y))
      .result()
    new PbWriter().writeString(1, name)
      .writeTag(2, 0).writeVarint(columnType)
      .writeBytes(10, point).result()
  }

  def encodeRow(xid: Long, commitTimeMicros: Long, table: String, op: Int,
      newTuple: Seq[Array[Byte]], oldTuple: Seq[Array[Byte]] = Nil): Array[Byte] = {
    val w = new PbWriter()
    w.writeTag(1, 0).writeVarint(xid)
    w.writeTag(2, 0).writeVarint(commitTimeMicros)
    if (table != null) w.writeString(3, table)
    w.writeTag(4, 0).writeVarint(op.toLong)
    newTuple.foreach(d => w.writeBytes(5, d))
    oldTuple.foreach(d => w.writeBytes(6, d))
    w.result()
  }
}
