package graft.cdc

import scala.collection.mutable

/** Decoder for the `pgoutput` binary logical-replication format — all
  * ten message tags (`B O Y R I U D T M C`) of the reference parser
  * (`src/output-plugins/pgoutput/pgoutput-parser.ts:24-52`), with the
  * same stateful relation/type caches (`:21-22`), key-tuple projection
  * (`:215-229`) and unchanged-TOAST fallback (`:260-261`).
  *
  * Beyond the reference (which implements only the non-stream tags and
  * documents proto_version 2 as a gap — SURVEY.md §2 B3), this parser
  * also decodes the protocol-v2 in-progress-transaction stream tags
  * `S E c A` (Stream Start/Stop/Commit/Abort) and the per-message xid
  * prefix that every `R Y I U D T M` message carries inside a stream
  * block, per the PostgreSQL logical-replication message-format docs.
  *
  * One parser instance carries the registry for one ordered frame
  * sequence (relation messages must precede the rows that use them —
  * the reference throws `missing relation` likewise, `:151-153`). For
  * distributed decode, instantiate per partition after a broadcast
  * registry warm-up, or feed frames per (slot, table) group.
  */
final class PgoutputParser {
  val relationCache: mutable.Map[Int, RelationInfo] = mutable.Map.empty
  val typeCache: mutable.Map[Int, (String, String)] = mutable.Map.empty

  /** inside an S..E stream block (proto v2): data messages carry xid. */
  private var inStream: Boolean = false

  def parse(frame: Array[Byte]): ChangeEvent = parse(frame, 0L)

  def parse(frame: Array[Byte], lsn: Long): ChangeEvent = {
    val r = new BinaryReader(frame)
    val tag = r.readUint8()
    // proto v2: messages inside a stream block are prefixed with the
    // transaction id of the (interleavable) in-progress transaction
    val streamXid =
      if (inStream && "RYIUDTM".indexOf(tag) >= 0)
        r.readInt32().toLong & 0xffffffffL
      else 0L
    val base = ChangeEvent.empty.copy(lsn = lsn, xid = streamXid)

    tag match {
      case 'S' =>
        val xid = r.readInt32().toLong & 0xffffffffL
        val first = r.readUint8() == 1
        inStream = true
        base.copy(tag = "stream_start", xid = xid, streamFirstSegment = first)

      case 'E' =>
        inStream = false
        base.copy(tag = "stream_stop")

      case 'c' =>
        val xid = r.readInt32().toLong & 0xffffffffL
        r.readUint8() // flags, reserved
        base.copy(tag = "stream_commit", xid = xid,
          commitLsn = r.readLsn(),
          commitEndLsn = r.readLsn(),
          commitTimeMicros = r.readTimeMicros())

      case 'A' =>
        base.copy(tag = "stream_abort",
          xid = r.readInt32().toLong & 0xffffffffL,
          subXid = r.readInt32().toLong & 0xffffffffL)

      // two-phase commit tags (PG15+, `two_phase` subscription option):
      // prepared transactions surface as prepare / commit-prepared /
      // rollback-prepared envelopes identified by a user-visible gid
      case 'b' =>
        base.copy(tag = "begin_prepare",
          commitLsn = r.readLsn(),          // prepare LSN
          commitEndLsn = r.readLsn(),       // prepare end LSN
          commitTimeMicros = r.readTimeMicros(),
          xid = r.readInt32().toLong & 0xffffffffL,
          gid = r.readString())

      case 'P' =>
        r.readUint8() // flags, reserved
        base.copy(tag = "prepare",
          commitLsn = r.readLsn(),
          commitEndLsn = r.readLsn(),
          commitTimeMicros = r.readTimeMicros(),
          xid = r.readInt32().toLong & 0xffffffffL,
          gid = r.readString())

      case 'K' =>
        r.readUint8() // flags, reserved
        base.copy(tag = "commit_prepared",
          commitLsn = r.readLsn(),
          commitEndLsn = r.readLsn(),
          commitTimeMicros = r.readTimeMicros(),
          xid = r.readInt32().toLong & 0xffffffffL,
          gid = r.readString())

      case 'r' =>
        r.readUint8() // flags, reserved
        base.copy(tag = "rollback_prepared",
          commitLsn = r.readLsn(),          // prepare end LSN
          commitEndLsn = r.readLsn(),       // rollback end LSN
          commitTimeMicros = { r.readTimeMicros(); r.readTimeMicros() },
          xid = r.readInt32().toLong & 0xffffffffL,
          gid = r.readString())
      case 'B' =>
        base.copy(tag = "begin",
          commitLsn = r.readLsn(),
          commitTimeMicros = r.readTimeMicros(),
          xid = r.readInt32().toLong & 0xffffffffL)

      case 'O' =>
        base.copy(tag = "origin",
          originLsn = r.readLsn(), originName = r.readString())

      case 'Y' =>
        val oid = r.readInt32()
        val ts = r.readString()
        val tn = r.readString()
        typeCache.put(oid, (ts, tn))
        base.copy(tag = "type", typeOid = oid.toLong, typeSchema = ts,
          typeName = tn)

      case 'R' =>
        val oid = r.readInt32()
        val sch = r.readString()
        val nm = r.readString()
        val ident = r.readUint8() match {
          case 'd' => "default"
          case 'n' => "nothing"
          case 'f' => "full"
          case 'i' => "index"
          case other => throw new IllegalArgumentException(
            s"unknown replica identity ${other.toChar}")
        }
        val ncols = r.readInt16()
        val cols = (0 until ncols).map { _ =>
          val flags = r.readUint8()
          val cname = r.readString()
          val typeOid = r.readInt32()
          val typeMod = r.readInt32()
          val (tSch, tNm) = typeCache.getOrElse(typeOid, (null, null))
          ColumnInfo(cname, flags, typeOid, typeMod, tSch, tNm)
        }
        val rel = RelationInfo(oid, sch, nm, ident, cols)
        relationCache.put(oid, rel)
        base.copy(tag = "relation", schema = sch, table = nm,
          relationOid = oid.toLong, replicaIdentity = ident, columns = cols)

      case 'I' =>
        val rel = relation(r.readInt32())
        require(r.readUint8() == 'N', "expected N tuple")
        base.copy(tag = "insert", schema = rel.schema, table = rel.name,
          relationOid = rel.relationOid.toLong,
          replicaIdentity = rel.replicaIdentity,
          after = readTuple(r, rel, null))

      case 'U' =>
        val rel = relation(r.readInt32())
        var key: Map[String, String] = null
        var old: Map[String, String] = null
        val sub = r.readUint8()
        val newT = sub match {
          case 'K' =>
            key = keyTuple(readTuple(r, rel, null), rel)
            require(r.readUint8() == 'N', "expected N tuple")
            readTuple(r, rel, null)
          case 'O' =>
            old = readTuple(r, rel, null)
            require(r.readUint8() == 'N', "expected N tuple")
            readTuple(r, rel, old)
          case 'N' =>
            readTuple(r, rel, null)
          case other => throw new IllegalArgumentException(
            s"unknown submessage key ${other.toChar}")
        }
        base.copy(tag = "update", schema = rel.schema, table = rel.name,
          relationOid = rel.relationOid.toLong,
          replicaIdentity = rel.replicaIdentity,
          key = key, before = old, after = newT)

      case 'D' =>
        val rel = relation(r.readInt32())
        var key: Map[String, String] = null
        var old: Map[String, String] = null
        r.readUint8() match {
          case 'K' => key = keyTuple(readTuple(r, rel, null), rel)
          case 'O' => old = readTuple(r, rel, null)
          case other => throw new IllegalArgumentException(
            s"unknown submessage key ${other.toChar}")
        }
        base.copy(tag = "delete", schema = rel.schema, table = rel.name,
          relationOid = rel.relationOid.toLong,
          replicaIdentity = rel.replicaIdentity, key = key, before = old)

      case 'T' =>
        val nrels = r.readInt32()
        val flags = r.readUint8()
        val oids = (0 until nrels).map(_ => r.readInt32().toLong)
        base.copy(tag = "truncate",
          truncateCascade = (flags & 1) != 0,
          truncateRestartIdentity = (flags & 2) != 0,
          truncateRelationOids = oids)

      case 'M' =>
        val flags = r.readUint8()
        val messageLsn = r.readLsn()
        val prefix = r.readString()
        val content = r.read(r.readInt32())
        base.copy(tag = "message",
          messageTransactional = (flags & 1) != 0,
          lsn = if (lsn != 0) lsn else messageLsn,
          messagePrefix = prefix,
          messageContent = content)

      case 'C' =>
        r.readUint8() // flags, reserved
        base.copy(tag = "commit",
          commitLsn = r.readLsn(),
          commitEndLsn = r.readLsn(),
          commitTimeMicros = r.readTimeMicros())

      case other =>
        throw new IllegalArgumentException(s"unknown pgoutput message ${other.toChar}")
    }
  }

  private def relation(oid: Int): RelationInfo =
    relationCache.getOrElse(oid,
      throw new IllegalArgumentException("missing relation"))

  /** Key projection: nulls in a key-only tuple are placeholders for
    * non-key columns, not values (`pgoutput-parser.ts:215-229`). */
  private def keyTuple(tuple: Map[String, String],
      rel: RelationInfo): Map[String, String] =
    rel.keyColumns.iterator
      .map(k => k -> tuple.getOrElse(k, null))
      .filter(_._2 != null)
      .toMap

  /** Tuple kinds `'b'` binary / `'t'` text / `'n'` null / `'u'`
    * unchanged-TOAST-from-old (`pgoutput-parser.ts:231-269`). */
  private def readTuple(r: BinaryReader, rel: RelationInfo,
      toastFallback: Map[String, String]): Map[String, String] = {
    val nfields = r.readInt16()
    val b = Map.newBuilder[String, String]
    var i = 0
    while (i < nfields) {
      val name = rel.columns(i).name
      r.readUint8() match {
        case 'b' =>
          val bytes = r.read(r.readInt32())
          b += name -> ("\\x" + bytes.map("%02x".format(_)).mkString)
        case 't' =>
          b += name -> r.readText(r.readInt32())
        case 'n' =>
          b += name -> null
        case 'u' =>
          if (toastFallback != null && toastFallback.contains(name))
            b += name -> toastFallback(name)
        case other => throw new IllegalArgumentException(
          s"unknown attribute kind ${other.toChar}")
      }
      i += 1
    }
    b.result()
  }
}

/** Encoder for pgoutput frames — the inverse of [[PgoutputParser]],
  * used to synthesize wire fixtures for tests and the oracle-checked
  * roundtrip query (the reference has no encoder; layouts follow the
  * PostgreSQL protocol docs cited at `pgoutput-parser.ts:1`).
  */
object PgoutputWriter {
  def begin(commitLsn: Long, commitTimeUnixMicros: Long, xid: Long): Array[Byte] =
    new BinaryWriter().writeUint8('B').writeLsn(commitLsn)
      .writeTimeMicros(commitTimeUnixMicros).writeInt32(xid.toInt).result()

  def commit(commitLsn: Long, commitEndLsn: Long,
      commitTimeUnixMicros: Long): Array[Byte] =
    new BinaryWriter().writeUint8('C').writeUint8(0).writeLsn(commitLsn)
      .writeLsn(commitEndLsn).writeTimeMicros(commitTimeUnixMicros).result()

  def origin(originLsn: Long, name: String): Array[Byte] =
    new BinaryWriter().writeUint8('O').writeLsn(originLsn).writeString(name)
      .result()

  def typeMsg(oid: Int, typeSchema: String, typeName: String): Array[Byte] =
    new BinaryWriter().writeUint8('Y').writeInt32(oid)
      .writeString(typeSchema).writeString(typeName).result()

  def relation(rel: RelationInfo): Array[Byte] = {
    val w = new BinaryWriter().writeUint8('R').writeInt32(rel.relationOid)
      .writeString(rel.schema).writeString(rel.name)
      .writeUint8(rel.replicaIdentity match {
        case "default" => 'd'; case "nothing" => 'n'
        case "full" => 'f'; case "index" => 'i'
      })
      .writeInt16(rel.columns.size)
    rel.columns.foreach { c =>
      w.writeUint8(c.flags).writeString(c.name).writeInt32(c.typeOid)
        .writeInt32(c.typeMod)
    }
    w.result()
  }

  /** values aligned with the relation's columns; null → 'n' kind,
    * Some(null) not supported; pass (name -> None) for TOAST 'u'. */
  private def writeTuple(w: BinaryWriter, values: Seq[Option[String]]): Unit = {
    w.writeInt16(values.size)
    values.foreach {
      case None => w.writeUint8('u')
      case Some(s) if s == null => w.writeUint8('n')
      case Some(s) =>
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        w.writeUint8('t').writeInt32(bytes.length).writeBytes(bytes)
    }
  }

  /** Text-kind tuple; a null element encodes the 'n' kind. */
  private def writeTextTuple(w: BinaryWriter, values: Seq[String]): Unit = {
    w.writeInt16(values.size)
    values.foreach { s =>
      if (s == null) w.writeUint8('n')
      else {
        val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        w.writeUint8('t').writeInt32(bytes.length).writeBytes(bytes)
      }
    }
  }

  def insert(relOid: Int, values: Seq[String]): Array[Byte] = {
    val w = new BinaryWriter().writeUint8('I').writeInt32(relOid).writeUint8('N')
    writeTextTuple(w, values)
    w.result()
  }

  /** sub = 'N' (new only), 'K' (key + new) or 'O' (old full + new). */
  def update(relOid: Int, sub: Char, firstTuple: Seq[String],
      newTuple: Seq[String]): Array[Byte] = {
    val w = new BinaryWriter().writeUint8('U').writeInt32(relOid)
    sub match {
      case 'N' =>
        w.writeUint8('N'); writeTextTuple(w, newTuple)
      case 'K' | 'O' =>
        w.writeUint8(sub); writeTextTuple(w, firstTuple)
        w.writeUint8('N'); writeTextTuple(w, newTuple)
    }
    w.result()
  }

  /** TOAST variant: 'O' old tuple, then new tuple where None = 'u'. */
  def updateWithToast(relOid: Int, oldTuple: Seq[String],
      newTuple: Seq[Option[String]]): Array[Byte] = {
    val w = new BinaryWriter().writeUint8('U').writeInt32(relOid)
    w.writeUint8('O'); writeTextTuple(w, oldTuple)
    w.writeUint8('N'); writeTuple(w, newTuple)
    w.result()
  }

  def delete(relOid: Int, sub: Char, tuple: Seq[String]): Array[Byte] = {
    val w = new BinaryWriter().writeUint8('D').writeInt32(relOid).writeUint8(sub)
    writeTextTuple(w, tuple)
    w.result()
  }

  def truncate(cascade: Boolean, restartIdentity: Boolean,
      relOids: Seq[Int]): Array[Byte] = {
    val w = new BinaryWriter().writeUint8('T').writeInt32(relOids.size)
      .writeUint8((if (cascade) 1 else 0) | (if (restartIdentity) 2 else 0))
    relOids.foreach(w.writeInt32)
    w.result()
  }

  def logicalMessage(transactional: Boolean, lsn: Long, prefix: String,
      content: Array[Byte]): Array[Byte] =
    new BinaryWriter().writeUint8('M')
      .writeUint8(if (transactional) 1 else 0).writeLsn(lsn)
      .writeString(prefix).writeInt32(content.length).writeBytes(content)
      .result()

  // ---- proto v2 stream frames (S E c A) ----

  def streamStart(xid: Long, firstSegment: Boolean): Array[Byte] =
    new BinaryWriter().writeUint8('S').writeInt32(xid.toInt)
      .writeUint8(if (firstSegment) 1 else 0).result()

  def streamStop(): Array[Byte] =
    new BinaryWriter().writeUint8('E').result()

  def streamCommit(xid: Long, commitLsn: Long, commitEndLsn: Long,
      commitTimeUnixMicros: Long): Array[Byte] =
    new BinaryWriter().writeUint8('c').writeInt32(xid.toInt).writeUint8(0)
      .writeLsn(commitLsn).writeLsn(commitEndLsn)
      .writeTimeMicros(commitTimeUnixMicros).result()

  def streamAbort(xid: Long, subXid: Long): Array[Byte] =
    new BinaryWriter().writeUint8('A').writeInt32(xid.toInt)
      .writeInt32(subXid.toInt).result()

  // ---- two-phase commit frames (b P K r, PG15+ two_phase option) ----

  def beginPrepare(prepareLsn: Long, prepareEndLsn: Long,
      tsUnixMicros: Long, xid: Long, gid: String): Array[Byte] =
    new BinaryWriter().writeUint8('b').writeLsn(prepareLsn)
      .writeLsn(prepareEndLsn).writeTimeMicros(tsUnixMicros)
      .writeInt32(xid.toInt).writeString(gid).result()

  def prepare(prepareLsn: Long, prepareEndLsn: Long,
      tsUnixMicros: Long, xid: Long, gid: String): Array[Byte] =
    new BinaryWriter().writeUint8('P').writeUint8(0).writeLsn(prepareLsn)
      .writeLsn(prepareEndLsn).writeTimeMicros(tsUnixMicros)
      .writeInt32(xid.toInt).writeString(gid).result()

  def commitPrepared(commitLsn: Long, commitEndLsn: Long,
      tsUnixMicros: Long, xid: Long, gid: String): Array[Byte] =
    new BinaryWriter().writeUint8('K').writeUint8(0).writeLsn(commitLsn)
      .writeLsn(commitEndLsn).writeTimeMicros(tsUnixMicros)
      .writeInt32(xid.toInt).writeString(gid).result()

  def rollbackPrepared(prepareEndLsn: Long, rollbackEndLsn: Long,
      prepareTsUnixMicros: Long, rollbackTsUnixMicros: Long,
      xid: Long, gid: String): Array[Byte] =
    new BinaryWriter().writeUint8('r').writeUint8(0).writeLsn(prepareEndLsn)
      .writeLsn(rollbackEndLsn).writeTimeMicros(prepareTsUnixMicros)
      .writeTimeMicros(rollbackTsUnixMicros).writeInt32(xid.toInt)
      .writeString(gid).result()

  /** Splice the proto-v2 in-stream xid prefix into a data frame:
    * `[tag][rest]` → `[tag][xid:int32][rest]`. Valid for R Y I U D T M
    * frames emitted between streamStart and streamStop. */
  def streamed(xid: Long, frame: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](frame.length + 4)
    out(0) = frame(0)
    val x = xid.toInt
    out(1) = (x >>> 24).toByte
    out(2) = (x >>> 16).toByte
    out(3) = (x >>> 8).toByte
    out(4) = x.toByte
    System.arraycopy(frame, 1, out, 5, frame.length - 1)
    out
  }
}
