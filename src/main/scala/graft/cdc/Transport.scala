package graft.cdc

/** Replication-stream transport framing: the CopyData demux
  * (XLogData `0x77` / keepalive `0x6b`,
  * `src/logical-replication-service.ts:146-174`) and the 34-byte
  * standby-status acknowledge message (`:254-300`).
  */
object Transport {

  sealed trait Frame
  /** Payload starts at offset 25 of the CopyData body (`:158,:162`). */
  final case class XLogData(
      walStart: Long, walEnd: Long, serverTimeMicros: Long,
      payload: Array[Byte]) extends Frame
  /** Server keepalive: LSN + clock + reply-requested flag (`:165-172`). */
  final case class Keepalive(
      serverLsn: Long, serverTimeMicros: Long, shouldRespond: Boolean)
    extends Frame
  /** Unknown tag: the reference warns and drops (`:147-149`). */
  final case class Unknown(tag: Int) extends Frame

  def demux(copyData: Array[Byte]): Frame = {
    val r = new BinaryReader(copyData)
    r.readUint8() match {
      case 0x77 => // 'w' XLogData
        XLogData(r.readLsn(), r.readLsn(), r.readTimeMicros(),
          r.read(r.remaining))
      case 0x6b => // 'k' keepalive
        Keepalive(r.readLsn(), r.readTimeMicros(), r.readUint8() != 0)
      case other => Unknown(other)
    }
  }

  def encodeXLogData(walStart: Long, walEnd: Long, serverTimeMicros: Long,
      payload: Array[Byte]): Array[Byte] =
    new BinaryWriter().writeUint8(0x77).writeLsn(walStart).writeLsn(walEnd)
      .writeTimeMicros(serverTimeMicros).writeBytes(payload).result()

  def encodeKeepalive(serverLsn: Long, serverTimeMicros: Long,
      shouldRespond: Boolean): Array[Byte] =
    new BinaryWriter().writeUint8(0x6b).writeLsn(serverLsn)
      .writeTimeMicros(serverTimeMicros)
      .writeUint8(if (shouldRespond) 1 else 0).result()

  /** Standby status update ('r'): written/flushed/applied all set to
    * lsn+1 (the reference carries the 32-bit rollover by hand,
    * `:266-272`; on a uint64 Long that is a plain increment), then the
    * µs-since-2000 clock and the ping byte — 34 bytes total
    * (`:274-294`).
    */
  def standbyStatus(lsn: Long, nowUnixMicros: Long,
      ping: Boolean = false): Array[Byte] = {
    val next = Lsn.plusOne(lsn)
    val out = new BinaryWriter().writeUint8('r')
      .writeLsn(next).writeLsn(next).writeLsn(next)
      .writeTimeMicros(nowUnixMicros)
      .writeUint8(if (ping) 1 else 0).result()
    assert(out.length == 34, s"standby status must be 34 bytes, got ${out.length}")
    out
  }

  final case class StandbyStatus(
      written: Long, flushed: Long, applied: Long,
      clockUnixMicros: Long, ping: Boolean)

  def decodeStandbyStatus(b: Array[Byte]): StandbyStatus = {
    val r = new BinaryReader(b)
    require(r.readUint8() == 'r', "not a standby status message")
    StandbyStatus(r.readLsn(), r.readLsn(), r.readLsn(),
      r.readTimeMicros(), r.readUint8() != 0)
  }
}
