package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** A11 over the live wire: the periodic standby timer
  * (`logical-replication-service.ts:231-248`) must re-send the
  * confirmed position when the connection goes quiet past
  * `acknowledge.timeoutSeconds` — the liveness signal that keeps a
  * real walsender from dropping the slot. */
class WalSocketTimerSpec extends AnyFunSuite {

  private val rel = RelationInfo(903, "public", "timer", "default",
    Seq(ColumnInfo("id", 1, 20, -1, null, null)))

  test("quiet wire: the re-ack timer repeats the confirmed position") {
    val lsn = 100L
    val tx = (lsn, Seq(
      PgoutputWriter.begin(lsn, 0L, 1L),
      PgoutputWriter.relation(rel),
      PgoutputWriter.insert(903, Seq("1")),
      PgoutputWriter.commit(lsn, lsn + 1, 0L)))
    // no final keepalive needed: the server holds the socket open
    // ~2.6 s of silence after the stream so the timer has room to fire
    val server = new LoopbackWalServer(Seq(tx), holdOpenMillis = 2600L)
    val dir = java.nio.file.Files.createTempDirectory("walsock-timer").toString
    try {
      val r = new WalSocketClient("127.0.0.1", server.port,
        new PgoutputFormat(), "slot_timer", dir, shard = 0,
        ackTimeoutSeconds = 1).run()
      assert(r.txs.map(_._1) == Seq(lsn))
      val repeats = server.receivedStatuses.count(_.flushed == lsn + 1)
      // delivery ack + at least one timer re-ack during the quiet period
      assert(repeats >= 2,
        s"expected the timer to re-ack during silence, saw $repeats " +
          s"status(es): ${server.receivedStatuses}")
      assert(r.acksSent >= 2)
    } finally server.close()
  }
}
