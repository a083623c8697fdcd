package graft.cdc

/** PostgreSQL Log Sequence Number codec.
  *
  * The reference renders LSNs as `XXXXXXXX/XXXXXXXX` (two 32-bit hex
  * words) and stores them as strings
  * (pg-logical-replication `src/output-plugins/pgoutput/binary-reader.ts:75-86`,
  * `src/logical-replication-service.ts:151-152`); the ack path adds one
  * with an explicit 32-bit carry
  * (`src/logical-replication-service.ts:266-272`). Here an LSN is a
  * single unsigned 64-bit value carried in a Scala `Long` — comparable,
  * sortable, and join-keyable in Spark — with parse/format helpers for
  * the wire shape.
  */
object Lsn {
  val InvalidLsn = 0L

  /** Accepts padded or unpadded hex words, e.g. "16/B374D848". */
  def parse(s: String): Long = {
    val i = s.indexOf('/')
    require(i > 0 && i < s.length - 1, s"malformed LSN: $s")
    val hi =
      try java.lang.Long.parseLong(s.substring(0, i), 16)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"malformed LSN: $s") }
    val lo =
      try java.lang.Long.parseLong(s.substring(i + 1), 16)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"malformed LSN: $s") }
    // signed parse accepts a leading '-'; reject it and the >32-bit range
    require(hi >= 0 && hi <= 0xffffffffL && lo >= 0 && lo <= 0xffffffffL,
      s"malformed LSN: $s")
    (hi << 32) | lo
  }

  /** Zero-padded upper-case, the `readLsn` rendering. */
  def format(lsn: Long): String =
    f"${lsn >>> 32}%08X/${lsn & 0xffffffffL}%08X"

  /** Unpadded rendering used for frame LSNs by the service demux. */
  def formatUnpadded(lsn: Long): String =
    java.lang.Long.toHexString(lsn >>> 32).toUpperCase + "/" +
      java.lang.Long.toHexString(lsn & 0xffffffffL).toUpperCase

  /** The ack path reports written/flushed/applied as lsn+1; on a Long
    * the 32-bit carry of the reference is plain unsigned increment. */
  def plusOne(lsn: Long): Long = lsn + 1

  /** Unsigned comparison (LSNs use the full 64-bit range). */
  def compare(a: Long, b: Long): Int = java.lang.Long.compareUnsigned(a, b)
}

/** PostgreSQL epoch (2000-01-01) µs ↔ Unix epoch µs
  * (`binary-reader.ts:88-91`, `logical-replication-service.ts:262-264`). */
object PgEpoch {
  val OffsetMicros = 946684800000000L
  def toUnixMicros(pgMicros: Long): Long = pgMicros + OffsetMicros
  def fromUnixMicros(unixMicros: Long): Long = unixMicros - OffsetMicros
  def toUnixMillis(pgMicros: Long): Long = toUnixMicros(pgMicros) / 1000L
}
