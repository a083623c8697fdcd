package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Protocol-v2 in-progress-transaction streaming (tags S E c A and the
  * per-message xid prefix inside a stream block) — beyond the
  * reference, which only serializes `proto_version` as an option and
  * implements none of the stream tags (SURVEY.md §2 B3;
  * pgoutput-parser.ts:28-51 has no S/E/c/A cases). Layouts follow the
  * PostgreSQL logical-replication message-format documentation.
  */
class PgoutputV2StreamSpec extends AnyFunSuite {

  private val usersRel = RelationInfo(16385, "public", "users", "default",
    Seq(
      ColumnInfo("id", 1, 20, -1, null, null),
      ColumnInfo("name", 0, 25, -1, null, null)))

  private def streamedTx(xid: Long, id: Long, name: String,
      abort: Boolean): Seq[Array[Byte]] = Seq(
    PgoutputWriter.streamStart(xid, firstSegment = true),
    PgoutputWriter.streamed(xid, PgoutputWriter.relation(usersRel)),
    PgoutputWriter.streamed(xid,
      PgoutputWriter.insert(usersRel.relationOid, Seq(id.toString, name))),
    PgoutputWriter.streamStop(),
    if (abort) PgoutputWriter.streamAbort(xid, xid)
    else PgoutputWriter.streamCommit(xid, 1000L, 1001L, 1700000000000000L))

  test("stream start/stop framing and xid-prefixed data messages") {
    val p = new PgoutputParser
    val events = streamedTx(42L, 7L, "ada", abort = false).map(p.parse(_))

    assert(events.map(_.tag) ==
      Seq("stream_start", "relation", "insert", "stream_stop", "stream_commit"))
    val start = events.head
    assert(start.xid == 42L)
    assert(start.streamFirstSegment)
    // in-stream messages carry the xid of the in-progress transaction
    assert(events(1).xid == 42L)
    assert(events(1).table == "users")
    assert(events(2).xid == 42L)
    assert(events(2).after == Map("id" -> "7", "name" -> "ada"))
    val commit = events.last
    assert(commit.xid == 42L)
    assert(commit.commitLsn == 1000L)
    assert(commit.commitEndLsn == 1001L)
    assert(commit.commitTimeMicros == 1700000000000000L)
  }

  test("stream abort carries xid and subxid") {
    val p = new PgoutputParser
    val events = streamedTx(99L, 1L, "x", abort = true).map(p.parse(_))
    val ab = events.last
    assert(ab.tag == "stream_abort")
    assert(ab.xid == 99L)
    assert(ab.subXid == 99L)
  }

  test("xid prefix only applies inside the stream block") {
    val p = new PgoutputParser
    streamedTx(5L, 1L, "in-stream", abort = false).foreach(p.parse(_))
    // after stream stop, plain (non-prefixed) frames parse as before
    val e = p.parse(PgoutputWriter.insert(usersRel.relationOid,
      Seq("2", "plain")))
    assert(e.tag == "insert")
    assert(e.xid == 0L)
    assert(e.after == Map("id" -> "2", "name" -> "plain"))
  }

  test("stream-aborted changes are invisible, committed ones are not") {
    val p = new PgoutputParser
    val events =
      (streamedTx(1L, 10L, "keep", abort = false) ++
        streamedTx(2L, 20L, "drop", abort = true)).map(p.parse(_))
    val visible = CdcFunctions.streamCommittedChanges(events)
    assert(visible.map(_.after("name")) == Seq("keep"))
    assert(visible.forall(_.xid == 1L))
  }

  test("subtransaction abort removes only the savepoint's changes") {
    // toplevel xid 7 opens a savepoint (subxact 8): the subxact's
    // change carries xid prefix 8 inside xid-7's stream block;
    // ROLLBACK TO SAVEPOINT emits stream_abort(7, 8) and only that
    // change disappears — the rest of the transaction commits
    val p = new PgoutputParser
    val frames = Seq(
      PgoutputWriter.streamStart(7L, firstSegment = true),
      PgoutputWriter.streamed(7L, PgoutputWriter.relation(usersRel)),
      PgoutputWriter.streamed(7L,
        PgoutputWriter.insert(usersRel.relationOid, Seq("1", "keep"))),
      PgoutputWriter.streamed(8L,
        PgoutputWriter.insert(usersRel.relationOid, Seq("2", "savepoint"))),
      PgoutputWriter.streamStop(),
      PgoutputWriter.streamAbort(7L, 8L),
      PgoutputWriter.streamStart(7L, firstSegment = false),
      PgoutputWriter.streamed(7L,
        PgoutputWriter.insert(usersRel.relationOid, Seq("3", "keep2"))),
      PgoutputWriter.streamStop(),
      PgoutputWriter.streamCommit(7L, 1000L, 1001L, 0L))
    val events = frames.map(p.parse(_))
    val visible = CdcFunctions.streamCommittedChanges(events)
    assert(visible.map(_.after("id")) == Seq("1", "3"))
  }

  test("interleaved stream segments resolve by per-message xid") {
    // two in-progress transactions interleave segments — the whole
    // point of proto v2; each data message resolves to its own xid
    val p = new PgoutputParser
    val frames = Seq(
      PgoutputWriter.streamStart(7L, firstSegment = true),
      PgoutputWriter.streamed(7L, PgoutputWriter.relation(usersRel)),
      PgoutputWriter.streamed(7L,
        PgoutputWriter.insert(usersRel.relationOid, Seq("1", "a"))),
      PgoutputWriter.streamStop(),
      PgoutputWriter.streamStart(8L, firstSegment = true),
      PgoutputWriter.streamed(8L,
        PgoutputWriter.insert(usersRel.relationOid, Seq("2", "b"))),
      PgoutputWriter.streamStop(),
      PgoutputWriter.streamStart(7L, firstSegment = false),
      PgoutputWriter.streamed(7L,
        PgoutputWriter.insert(usersRel.relationOid, Seq("3", "c"))),
      PgoutputWriter.streamStop(),
      PgoutputWriter.streamCommit(7L, 1000L, 1001L, 0L),
      PgoutputWriter.streamAbort(8L, 8L))
    val events = frames.map(p.parse(_))
    val visible = CdcFunctions.streamCommittedChanges(events)
    assert(visible.map(_.after("id")) == Seq("1", "3"))
  }
}
