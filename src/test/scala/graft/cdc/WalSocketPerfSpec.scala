package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Live-loop throughput over a REAL loopback socket — the end-to-end
  * path the reference's 5,000 rows/s floor applies to
  * (BASELINE.md / `decoder-pgoutput.spec.ts:6`): TCP receive, wire
  * deframe, CopyData demux, transaction grouping, durable frame-log
  * append, and batched standby-status acks. Decode throughput alone
  * is ThroughputSpec's ~220k rows/s; this measures the transport +
  * delivery machinery around it. */
class WalSocketPerfSpec extends AnyFunSuite {

  test("socket delivery sustains >= 5k tx/s end-to-end (batched acks)") {
    val rel = RelationInfo(902, "public", "perf", "default",
      Seq(ColumnInfo("id", 1, 20, -1, null, null),
        ColumnInfo("v", 0, 25, -1, null, null)))
    val relFrame = PgoutputWriter.relation(rel)
    val nTx = 20000
    val log = (1 to nTx).map { i =>
      val lsn = i * 10L
      (lsn, Seq(
        PgoutputWriter.begin(lsn, i * 1000L, i.toLong),
        relFrame,
        PgoutputWriter.insert(902, Seq(i.toString, s"value-$i")),
        PgoutputWriter.commit(lsn, lsn + 1, i * 1000L)))
    }
    val server = new LoopbackWalServer(log)
    val dir = java.nio.file.Files.createTempDirectory("walsock-perf").toString
    try {
      val t0 = System.nanoTime()
      val r = new WalSocketClient("127.0.0.1", server.port,
        new PgoutputFormat(), "slot_perf", dir, shard = 0,
        ackEveryTxs = 256).run()
      val secs = (System.nanoTime() - t0) / 1e9
      val rate = nTx / secs
      assert(r.txs.size == nTx)
      assert(server.confirmedFlush == nTx * 10L + 1)
      info(f"$nTx%,d tx (4 frames each) over loopback in $secs%.2f s = " +
        f"$rate%,.0f tx/s (${r.acksSent} acks)")
      // reference floor is 5k rows/s for the whole live loop; each tx
      // here carries one row. Generous margin below measured rates to
      // keep CI stable.
      assert(rate >= 5000,
        f"live-loop rate $rate%,.0f tx/s below the 5k reference floor")
    } finally server.close()
  }
}
