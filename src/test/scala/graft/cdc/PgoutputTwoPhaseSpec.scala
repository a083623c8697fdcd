package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Two-phase-commit tags (`b P K r`, PG15+ `two_phase` subscription
  * option) — beyond the reference, which predates prepared-transaction
  * streaming entirely. Layouts follow the PostgreSQL
  * logical-replication message-format documentation. */
class PgoutputTwoPhaseSpec extends AnyFunSuite {

  private val usersRel = RelationInfo(16385, "public", "users", "default",
    Seq(
      ColumnInfo("id", 1, 20, -1, null, null),
      ColumnInfo("name", 0, 25, -1, null, null)))

  private def preparedTx(xid: Long, gid: String, id: Long,
      commit: Boolean): Seq[Array[Byte]] = Seq(
    PgoutputWriter.beginPrepare(100L, 101L, 1700000000000000L, xid, gid),
    PgoutputWriter.relation(usersRel),
    PgoutputWriter.insert(usersRel.relationOid, Seq(id.toString, s"row$id")),
    PgoutputWriter.prepare(100L, 101L, 1700000000000000L, xid, gid),
    if (commit)
      PgoutputWriter.commitPrepared(200L, 201L, 1700000001000000L, xid, gid)
    else
      PgoutputWriter.rollbackPrepared(101L, 202L, 1700000000000000L,
        1700000002000000L, xid, gid))

  test("begin_prepare / prepare / commit_prepared envelopes carry the gid") {
    val p = new PgoutputParser
    val events = preparedTx(31L, "tx-31", 7L, commit = true).map(p.parse(_))
    assert(events.map(_.tag) ==
      Seq("begin_prepare", "relation", "insert", "prepare", "commit_prepared"))
    val bp = events.head
    assert(bp.xid == 31L)
    assert(bp.gid == "tx-31")
    assert(bp.commitLsn == 100L)
    val cp = events.last
    assert(cp.xid == 31L)
    assert(cp.gid == "tx-31")
    assert(cp.commitLsn == 200L)
    assert(cp.commitTimeMicros == 1700000001000000L)
  }

  test("rollback_prepared parses both timestamps, keeps the rollback one") {
    val p = new PgoutputParser
    val rb = preparedTx(32L, "tx-32", 8L, commit = false).map(p.parse(_)).last
    assert(rb.tag == "rollback_prepared")
    assert(rb.gid == "tx-32")
    assert(rb.commitLsn == 101L)
    assert(rb.commitEndLsn == 202L)
    assert(rb.commitTimeMicros == 1700000002000000L)
  }

  test("commit-prepared changes visible, rolled-back invisible") {
    val p = new PgoutputParser
    val events =
      (preparedTx(1L, "gid-keep", 10L, commit = true) ++
        preparedTx(2L, "gid-drop", 20L, commit = false)).map(p.parse(_))
    val visible = CdcFunctions.preparedVisibleChanges(events)
    assert(visible.map(_.after("id")) == Seq("10"))
  }

  test("non-prepared changes pass through untouched") {
    val p = new PgoutputParser
    val events = Seq(
      PgoutputWriter.begin(500L, 0L, 9L),
      PgoutputWriter.relation(usersRel),
      PgoutputWriter.insert(usersRel.relationOid, Seq("1", "plain")),
      PgoutputWriter.commit(500L, 501L, 0L)).map(p.parse(_))
    val visible = CdcFunctions.preparedVisibleChanges(events)
    assert(visible.map(_.after("name")) == Seq("plain"))
  }
}
