package graft.cdc

import java.nio.charset.StandardCharsets

/** Big-endian, bounds-checked reader over a byte array — the kernel
  * the pgoutput decoder runs on (mirrors the reference's
  * `src/output-plugins/pgoutput/binary-reader.ts:12-100`). Slices are
  * copies (JVM arrays can't alias safely across Spark rows, unlike the
  * reference's `subarray` views; the hot path wraps one frame at a
  * time so the copies are small and short-lived).
  */
final class BinaryReader(buf: Array[Byte]) {
  private var p = 0

  private def checkSize(n: Int): Unit =
    // n < 0 (corrupt length field) and p + n overflow must both fail
    // the decoder's "unexpected end" contract, not leak raw exceptions
    if (n < 0 || n > buf.length - p) throw new IllegalArgumentException(
      "unexpected end of message")

  def position: Int = p
  def remaining: Int = buf.length - p

  def readUint8(): Int = { checkSize(1); val v = buf(p) & 0xff; p += 1; v }

  def readInt16(): Int = { checkSize(2)
    val v = ((buf(p) & 0xff) << 8) | (buf(p + 1) & 0xff); p += 2; v.toShort.toInt }

  def readInt32(): Int = { checkSize(4)
    val v = ((buf(p) & 0xff) << 24) | ((buf(p + 1) & 0xff) << 16) |
      ((buf(p + 2) & 0xff) << 8) | (buf(p + 3) & 0xff)
    p += 4; v }

  def readUint32(): Long = readInt32().toLong & 0xffffffffL

  def readUint64(): Long = (readUint32() << 32) | readUint32()

  /** NUL-terminated UTF-8 string. */
  def readString(): String = {
    var end = p
    while (end < buf.length && buf(end) != 0) end += 1
    if (end >= buf.length) throw new IllegalArgumentException(
      "unexpected end of message")
    val s = new String(buf, p, end - p, StandardCharsets.UTF_8)
    p = end + 1
    s
  }

  def read(n: Int): Array[Byte] = { checkSize(n)
    val out = java.util.Arrays.copyOfRange(buf, p, p + n); p += n; out }

  def readText(n: Int): String = { checkSize(n)
    val s = new String(buf, p, n, StandardCharsets.UTF_8); p += n; s }

  /** 64-bit LSN; 0 encodes "null" like the reference's `readLsn`. */
  def readLsn(): Long = readUint64()

  /** PG-epoch µs on the wire → Unix-epoch µs. */
  def readTimeMicros(): Long = PgEpoch.toUnixMicros(readUint64())
}

/** Matching big-endian writer — used to synthesize wire fixtures and by
  * the pgoutput/transport encoders (the reference's standby-status
  * builder writes the same shapes, `logical-replication-service.ts:254-300`).
  */
final class BinaryWriter {
  private val out = new java.io.ByteArrayOutputStream()

  def writeUint8(v: Int): this.type = { out.write(v & 0xff); this }
  def writeInt16(v: Int): this.type = { out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
  def writeInt32(v: Int): this.type = {
    out.write((v >> 24) & 0xff); out.write((v >> 16) & 0xff)
    out.write((v >> 8) & 0xff); out.write(v & 0xff); this }
  def writeUint32(v: Long): this.type = writeInt32(v.toInt)
  def writeUint64(v: Long): this.type = { writeUint32(v >>> 32); writeUint32(v & 0xffffffffL) }
  def writeString(s: String): this.type = {
    out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0); this }
  def writeBytes(b: Array[Byte]): this.type = { out.write(b, 0, b.length); this }
  def writeLsn(lsn: Long): this.type = writeUint64(lsn)
  def writeTimeMicros(unixMicros: Long): this.type =
    writeUint64(PgEpoch.fromUnixMicros(unixMicros))

  def result(): Array[Byte] = out.toByteArray
}
