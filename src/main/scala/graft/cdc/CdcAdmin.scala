package graft.cdc

/** Slot admin SQL builders — the reference's test utilities issue
  * these against a live server (`src/test/test-common.ts:9-25`); with
  * no PostgreSQL in this environment the SQL strings are the tested
  * surface (a connector would run them over JDBC).
  */
object SlotAdmin {
  private def qident(s: String): String =
    "\"" + s.replace("\"", "\"\"") + "\""
  private def qlit(s: String): String =
    "'" + s.replace("'", "''") + "'"

  def createSlotSql(slotName: String, plugin: String): String =
    s"SELECT pg_create_logical_replication_slot(${qlit(slotName)}, ${qlit(plugin)})"

  def dropSlotSql(slotName: String): String =
    s"SELECT pg_drop_replication_slot(${qlit(slotName)})"

  def createPublicationSql(name: String, tables: Seq[String]): String =
    if (tables.isEmpty) s"CREATE PUBLICATION ${qident(name)} FOR ALL TABLES"
    else s"CREATE PUBLICATION ${qident(name)} FOR TABLE ${tables.map(qident).mkString(", ")}"

  def dropPublicationSql(name: String): String =
    s"DROP PUBLICATION IF EXISTS ${qident(name)}"
}

/** Periodic standby-status scheduler — the reference re-acks the last
  * LSN on a 1 s timer whenever `timeoutSeconds` has elapsed since the
  * last ack (`logical-replication-service.ts:231-248`). `send` is the
  * transport hook (writes the 34-byte status message); time is
  * injectable for tests.
  */
final class AckScheduler(
    timeoutSeconds: Int,
    send: Long => Unit,
    now: () => Long = () => System.currentTimeMillis()) {

  private var lastLsn: Long = Lsn.InvalidLsn
  private var lastAckMillis: Long = 0L

  /** Record a delivered LSN (A10 auto-ack updates the same state). */
  def delivered(lsn: Long): Unit = synchronized {
    if (Lsn.compare(lsn, lastLsn) > 0) lastLsn = lsn
  }

  /** Explicit ack (resets the timer like `acknowledge()`). */
  def ack(): Unit = synchronized {
    if (lastLsn != Lsn.InvalidLsn) {
      send(lastLsn)
      lastAckMillis = now()
    }
  }

  /** The 1 s poll body: re-ack if the timeout has lapsed (`:238-247`).
    * Returns true when a status message was sent. */
  def tick(): Boolean = synchronized {
    if (lastLsn == Lsn.InvalidLsn) false
    else if (now() - lastAckMillis >= timeoutSeconds * 1000L) {
      send(lastLsn)
      lastAckMillis = now()
      true
    } else false
  }
}
