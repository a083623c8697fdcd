package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Slot admin SQL parity (test-common.ts:9-25) + the periodic
  * standby-status scheduler (logical-replication-service.ts:231-248). */
class CdcAdminSpec extends AnyFunSuite {

  test("slot create/drop SQL matches the reference's statements") {
    assert(SlotAdmin.createSlotSql("slot_test", "pgoutput") ==
      "SELECT pg_create_logical_replication_slot('slot_test', 'pgoutput')")
    assert(SlotAdmin.dropSlotSql("slot_test") ==
      "SELECT pg_drop_replication_slot('slot_test')")
    // quote-escape hardening
    assert(SlotAdmin.dropSlotSql("we'ird") ==
      "SELECT pg_drop_replication_slot('we''ird')")
  }

  test("publication DDL") {
    assert(SlotAdmin.createPublicationSql("pub", Seq("users", "user_contents"))
      == "CREATE PUBLICATION \"pub\" FOR TABLE \"users\", \"user_contents\"")
    assert(SlotAdmin.createPublicationSql("pub", Nil)
      == "CREATE PUBLICATION \"pub\" FOR ALL TABLES")
  }

  test("ack scheduler re-acks only after timeoutSeconds (ref :238-247)") {
    var clock = 0L
    var sent = List.empty[Long]
    val s = new AckScheduler(10, lsn => sent :+= lsn, () => clock)

    assert(!s.tick()) // nothing delivered yet
    s.delivered(100L)
    clock = 1000L
    assert(!s.tick() && sent.isEmpty) // within timeout — no send
    clock = 10000L
    assert(s.tick()) // timeout lapsed — ack the last LSN
    assert(sent == List(100L))
    clock = 15000L
    assert(!s.tick()) // timer reset by the previous send
    clock = 20000L
    assert(s.tick())
    assert(sent == List(100L, 100L))
  }

  test("delivered keeps the max LSN (unsigned)") {
    var sent = List.empty[Long]
    val s = new AckScheduler(0, lsn => sent :+= lsn, () => 0L)
    s.delivered(5L)
    s.delivered(3L) // stale — ignored
    s.ack()
    assert(sent == List(5L))
    s.delivered(-1L) // 0xFFFF... = max uint64
    s.ack()
    assert(sent == List(5L, -1L))
  }
}

/** Typed refinement of the text-map transport (SURVEY §1.2 mapping). */
class TypedRefinementSpec extends AnyFunSuite {
  import org.apache.spark.sql.types._

  test("PG OIDs map to the SURVEY §1.2 Spark types") {
    assert(TypedRefinement.sparkTypeFor(16) == BooleanType)
    assert(TypedRefinement.sparkTypeFor(20) == LongType)     // int8 divergence
    assert(TypedRefinement.sparkTypeFor(23) == IntegerType)
    assert(TypedRefinement.sparkTypeFor(701) == DoubleType)
    assert(TypedRefinement.sparkTypeFor(1700) == DecimalType(38, 18))
    assert(TypedRefinement.sparkTypeFor(1184) == TimestampType)
    assert(TypedRefinement.sparkTypeFor(25) == StringType)
  }
}
