package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

object CdcProgressListener {
  /** One keepalive-equivalent observation: per-source LSN + clock +
    * that source's row count for the micro-batch. */
  final case class Heartbeat(
      queryName: String,
      lsn: Long,
      timestampMs: Long,
      numInputRows: Long)
}

/** Heartbeat/liveness surface for cdc-replay streams (SURVEY §2
  * A8/A11: the reference's keepalive events and 1 s standby timer
  * surface here as `StreamingQueryListener` progress events). Each
  * micro-batch progress carries the source's end offset — which for
  * cdc-replay IS the LSN — so downstream monitoring gets the same
  * (lsn, clock, rows) triple the reference emits per keepalive.
  *
  * The buffer is bounded (oldest dropped past `maxRetained`); use
  * [[drainHeartbeats]] for continuous consumption.
  */
final class CdcProgressListener(maxRetained: Int = 1024)
    extends StreamingQueryListener {
  import CdcProgressListener.Heartbeat

  private val events = new ConcurrentLinkedQueue[Heartbeat]()
  private val retained = new AtomicInteger(0)

  def heartbeats: Seq[Heartbeat] = events.asScala.toSeq

  /** Remove and return everything observed so far. */
  def drainHeartbeats(): Seq[Heartbeat] = {
    val out = Seq.newBuilder[Heartbeat]
    var h = events.poll()
    while (h != null) {
      retained.decrementAndGet()
      out += h
      h = events.poll()
    }
    out.result()
  }

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    p.sources
      // other sources (e.g. rate) also serialize digit-only offsets —
      // only cdc-replay streams feed the heartbeat surface (progress
      // descriptions carry the stream class name)
      .filter(s => Option(s.description).exists(_.contains("CdcReplayStream")))
      .foreach { s =>
        // cdc-replay offsets: per-shard ShardOffsets JSON (legacy
        // checkpoints: the bare LSN). The heartbeat position is the
        // GLOBAL delivered-through LSN — min across shard tails, the
        // same horizon commit() acks.
        val end = Option(s.endOffset).map(_.trim).filter(_.nonEmpty)
        val lsn = end.flatMap { e =>
          try {
            val so = ShardOffsets.parse(e)
            Some(if (so.shards.isEmpty) so.floor
              else math.max(so.floor, so.shards.values.min))
          } catch { case _: IllegalArgumentException => None }
        }
        lsn.foreach { l =>
          events.add(Heartbeat(
            Option(p.name).getOrElse(p.id.toString),
            l,
            java.time.Instant.parse(p.timestamp).toEpochMilli,
            s.numInputRows))
          if (retained.incrementAndGet() > maxRetained) {
            events.poll()
            retained.decrementAndGet()
          }
        }
      }
  }
}
