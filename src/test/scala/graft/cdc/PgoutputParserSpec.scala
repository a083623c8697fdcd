package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** pgoutput decode against synthesized wire frames — covers the ten
  * message tags, relation caching, key projection, TOAST fallback and
  * the error paths the reference asserts
  * (decoder-pgoutput.spec.ts; pgoutput-parser.ts:24-305). */
class PgoutputParserSpec extends AnyFunSuite {

  private val usersRel = RelationInfo(16385, "public", "users", "default",
    Seq(
      ColumnInfo("id", 1, 20, -1, null, null),
      ColumnInfo("firstname", 0, 25, -1, null, null),
      ColumnInfo("deleted", 0, 16, -1, null, null)))

  private def parser(warm: Boolean = true): PgoutputParser = {
    val p = new PgoutputParser
    if (warm) p.parse(PgoutputWriter.relation(usersRel))
    p
  }

  test("begin / commit framing") {
    val p = parser()
    val b = p.parse(PgoutputWriter.begin(0x16b374d848L, 1700000000000000L, 777L))
    assert(b.tag == "begin")
    assert(b.commitLsn == 0x16b374d848L)
    assert(b.commitTimeMicros == 1700000000000000L)
    assert(b.xid == 777L)

    val c = p.parse(PgoutputWriter.commit(0x16b374d848L, 0x16b374d850L,
      1700000000000001L))
    assert(c.tag == "commit")
    assert(c.commitLsn == 0x16b374d848L)
    assert(c.commitEndLsn == 0x16b374d850L)
    assert(c.commitTimeMicros == 1700000000000001L)
  }

  test("relation message populates the cache with key columns") {
    val p = parser()
    val rel = p.relationCache(16385)
    assert(rel.name == "users" && rel.schema == "public")
    assert(rel.replicaIdentity == "default")
    assert(rel.keyColumns == Seq("id"))
    assert(rel.columns.map(_.name) == Seq("id", "firstname", "deleted"))
  }

  test("type message feeds the type cache and later relations") {
    val p = new PgoutputParser
    val t = p.parse(PgoutputWriter.typeMsg(99999, "public", "mood"))
    assert(t.tag == "type" && t.typeName == "mood")
    val rel = usersRel.copy(columns =
      usersRel.columns :+ ColumnInfo("m", 0, 99999, -1, null, null))
    val r = p.parse(PgoutputWriter.relation(rel))
    assert(r.columns.find(_.name == "m").get.typeName == "mood")
  }

  test("mid-stream relation re-announce (schema evolution) re-maps " +
      "subsequent decode") {
    // PostgreSQL re-sends the Relation message after an ALTER TABLE;
    // the cache must REPLACE the entry so tuples decoded before and
    // after the DDL each map against their own column set — the
    // mid-stream add-column case every long-lived CDC consumer hits.
    val p = parser()
    val before = p.parse(PgoutputWriter.insert(16385,
      Seq("1", "ann", "false")))
    assert(before.after == Map("id" -> "1", "firstname" -> "ann",
      "deleted" -> "false"))
    val evolved = usersRel.copy(columns = usersRel.columns :+
      ColumnInfo("email", 0, 25, -1, null, null))
    p.parse(PgoutputWriter.relation(evolved))
    assert(p.relationCache(16385).columns.map(_.name) ==
      Seq("id", "firstname", "deleted", "email"))
    val after = p.parse(PgoutputWriter.insert(16385,
      Seq("2", "bob", "true", "bob@example.com")))
    assert(after.after == Map("id" -> "2", "firstname" -> "bob",
      "deleted" -> "true", "email" -> "bob@example.com"))
  }

  test("insert decodes the new tuple (text + null kinds)") {
    val p = parser()
    val e = p.parse(PgoutputWriter.insert(16385, Seq("1", null, "false")))
    assert(e.tag == "insert" && e.table == "users")
    assert(e.after == Map("id" -> "1", "firstname" -> null,
      "deleted" -> "false"))
  }

  test("update 'O' submessage keeps before and resolves TOAST from old") {
    val p = parser()
    val e = p.parse(PgoutputWriter.updateWithToast(16385,
      oldTuple = Seq("1", "big-toasted-value", "false"),
      newTuple = Seq(Some("1"), None, Some("true"))))
    assert(e.tag == "update")
    assert(e.before("firstname") == "big-toasted-value")
    // 'u' kind resolved from the old tuple (pgoutput-parser.ts:260-261)
    assert(e.after("firstname") == "big-toasted-value")
    assert(e.after("deleted") == "true")
  }

  test("update 'K' submessage yields the key projection") {
    val p = parser()
    val e = p.parse(PgoutputWriter.update(16385, 'K',
      firstTuple = Seq("42", null, null),
      newTuple = Seq("42", "alice", "false")))
    assert(e.key == Map("id" -> "42"))
    assert(e.before == null)
    assert(e.after("firstname") == "alice")
  }

  test("delete 'K' projects only the key, dropping null placeholders") {
    val p = parser()
    val e = p.parse(PgoutputWriter.delete(16385, 'K', Seq("7", null, null)))
    assert(e.tag == "delete")
    assert(e.key == Map("id" -> "7"))
    assert(e.before == null && e.after == null)
  }

  test("delete 'O' carries the full old tuple") {
    val p = parser()
    val e = p.parse(PgoutputWriter.delete(16385, 'O', Seq("7", "bob", "true")))
    assert(e.before == Map("id" -> "7", "firstname" -> "bob",
      "deleted" -> "true"))
  }

  test("truncate flags and relation oids") {
    val p = parser()
    val e = p.parse(PgoutputWriter.truncate(cascade = true,
      restartIdentity = false, Seq(16385)))
    assert(e.tag == "truncate" && e.truncateCascade &&
      !e.truncateRestartIdentity)
    assert(e.truncateRelationOids == Seq(16385L))
  }

  test("logical message payload roundtrips") {
    val p = parser()
    val e = p.parse(PgoutputWriter.logicalMessage(transactional = true,
      lsn = 0xabcdL, prefix = "test_prefix", content = "test_content".getBytes))
    assert(e.tag == "message" && e.messageTransactional)
    assert(e.messagePrefix == "test_prefix")
    assert(new String(e.messageContent) == "test_content")
  }

  test("origin message") {
    val p = parser()
    val e = p.parse(PgoutputWriter.origin(0x55L, "origin_a"))
    assert(e.tag == "origin" && e.originLsn == 0x55L &&
      e.originName == "origin_a")
  }

  test("insert before relation throws 'missing relation'") {
    val p = parser(warm = false)
    val ex = intercept[IllegalArgumentException] {
      p.parse(PgoutputWriter.insert(16385, Seq("1", "x", "false")))
    }
    assert(ex.getMessage.contains("missing relation"))
  }

  test("unknown tag rejected") {
    val p = parser()
    intercept[IllegalArgumentException] { p.parse(Array[Byte]('Z')) }
  }

  test("binary 'b' kind hex-encodes with bytea prefix") {
    val w = new BinaryWriter().writeUint8('I').writeInt32(16385).writeUint8('N')
      .writeInt16(3)
      .writeUint8('b').writeInt32(2).writeBytes(Array[Byte](0xde.toByte, 0xad.toByte))
      .writeUint8('n')
      .writeUint8('t').writeInt32(4).writeBytes("true".getBytes)
    val p = parser()
    val e = p.parse(w.result())
    assert(e.after("id") == "\\xdead")
  }
}
