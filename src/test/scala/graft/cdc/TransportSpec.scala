package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** CopyData demux + standby-status ack layout
  * (logical-replication-service.ts:146-174, :254-300). */
class TransportSpec extends AnyFunSuite {

  test("XLogData frame roundtrips, payload at offset 25") {
    val payload = "hello".getBytes
    val frame = Transport.encodeXLogData(0x10L, 0x20L, 1700000000000000L,
      payload)
    assert(frame(0) == 0x77)
    assert(frame.length == 25 + payload.length)
    Transport.demux(frame) match {
      case Transport.XLogData(ws, we, t, p) =>
        assert(ws == 0x10L && we == 0x20L && t == 1700000000000000L)
        assert(new String(p) == "hello")
      case other => fail(s"expected XLogData, got $other")
    }
  }

  test("keepalive frame roundtrips including shouldRespond") {
    val frame = Transport.encodeKeepalive(0x99L, 1700000000000123L,
      shouldRespond = true)
    assert(frame(0) == 0x6b)
    Transport.demux(frame) match {
      case Transport.Keepalive(lsn, t, respond) =>
        assert(lsn == 0x99L && t == 1700000000000123L && respond)
      case other => fail(s"expected Keepalive, got $other")
    }
  }

  test("unknown tag is reported, not thrown (warn+drop semantics)") {
    assert(Transport.demux(Array[Byte]('q', 0, 0)) == Transport.Unknown('q'))
  }

  test("standby status is 34 bytes, acks lsn+1 in all three slots") {
    val msg = Transport.standbyStatus(0x0AL, 1700000000000000L, ping = true)
    assert(msg.length == 34)
    val st = Transport.decodeStandbyStatus(msg)
    assert(st.written == 0x0BL && st.flushed == 0x0BL && st.applied == 0x0BL)
    assert(st.clockUnixMicros == 1700000000000000L)
    assert(st.ping)
  }

  test("ack carry at the 32-bit boundary (service :266-272)") {
    val atBoundary = (2L << 32) | 0xffffffffL
    val st = Transport.decodeStandbyStatus(
      Transport.standbyStatus(atBoundary, 0L))
    assert(st.written == (3L << 32))
  }
}

/** START_REPLICATION option serialization parity (A2-A5). */
class CdcFormatSpec extends AnyFunSuite {

  test("pgoutput options (pgoutput-plugin.ts:24-34)") {
    val f = new PgoutputFormat(1, Seq("pub1", "pub2"), messages = true)
    assert(f.startReplicationSql("slot_a", "0/00000000") ==
      """START_REPLICATION SLOT "slot_a" LOGICAL 0/00000000 """ +
        """(proto_version '1', publication_names 'pub1,pub2', messages 'true')""")
  }

  test("test_decoding options (test-decoding-plugin.ts:47-59)") {
    val f = new TestDecodingFormat(includeXids = true, skipEmptyXacts = true)
    assert(f.startReplicationSql("s", "0/1") ==
      """START_REPLICATION SLOT "s" LOGICAL 0/1 """ +
        """("include-xids" 'on' , "include-timestamp" 'off' , "skip-empty-xacts" 'on')""")
  }

  test("wal2json dash-case + string/on-off option split (wal2json-plugin.ts:18-29)") {
    val f = new Wal2JsonFormat(Seq(
      "includeXids" -> true,
      "filterTables" -> "public.skip_me",
      "prettyPrint" -> false))
    assert(f.startReplicationSql("s", "0/1") ==
      """START_REPLICATION SLOT "s" LOGICAL 0/1 """ +
        """("include-xids" 'on' , "filter-tables" 'public.skip_me' , "pretty-print" 'off')""")
  }

  test("decoderbufs has no options (decoderbufs-plugin.ts:29-36)") {
    assert(new DecoderbufsFormat().startReplicationSql("s", "1/2") ==
      """START_REPLICATION SLOT "s" LOGICAL 1/2""")
  }
}

/** decoderbufs protobuf wire codec. */
class DecoderbufsSpec extends AnyFunSuite {

  test("insert row roundtrips typed datums") {
    val row = Decoderbufs.encodeRow(42L, 1700000000000000L, "public.users",
      Decoderbufs.OpInsert,
      Seq(
        Decoderbufs.encodeDatumInt64("id", 20, 7L),
        Decoderbufs.encodeDatumString("name", 25, "alice"),
        Decoderbufs.encodeDatumDouble("score", 701, 12.5),
        Decoderbufs.encodeDatumString("gone", 25, null)))
    val m = Decoderbufs.decode(row)
    assert(m.transactionId == 42L && m.table == "public.users")
    assert(m.op == Decoderbufs.OpInsert)
    assert(m.newTuple.map(_.columnName) == Seq("id", "name", "score", "gone"))
    assert(m.newTuple(0).int64Value == 7L)
    assert(m.newTuple(1).stringValue == "alice")
    assert(m.newTuple(2).doubleValue == 12.5)
    assert(m.newTuple(3).kind == "missing")
    val e = Decoderbufs.toChangeEvent(m)
    assert(e.tag == "insert" && e.schema == "public" && e.table == "users")
    assert(e.after("score") == "12.5")
    assert(e.after("gone") == null)
  }

  test("Point datum roundtrips through the oneof") {
    val row = Decoderbufs.decode(Decoderbufs.encodeRow(1L, 0L, "public.geo",
      Decoderbufs.OpInsert,
      Seq(Decoderbufs.encodeDatumPoint("loc", 600, 1.5, -2.25))))
    val d = row.newTuple.head
    assert(d.kind == "point" && d.pointX == 1.5 && d.pointY == -2.25)
    assert(Decoderbufs.toChangeEvent(row).after("loc") == "(1.5,-2.25)")
  }

  test("delete carries old tuple; begin/commit map to tags") {
    val del = Decoderbufs.decode(Decoderbufs.encodeRow(1L, 0L, "public.t",
      Decoderbufs.OpDelete, Nil,
      Seq(Decoderbufs.encodeDatumInt64("id", 20, 9L))))
    val e = Decoderbufs.toChangeEvent(del)
    assert(e.tag == "delete" && e.before("id") == "9")

    assert(Decoderbufs.toChangeEvent(Decoderbufs.decode(
      Decoderbufs.encodeRow(1L, 0L, null, Decoderbufs.OpBegin, Nil))).tag
      == "begin")
  }
}
