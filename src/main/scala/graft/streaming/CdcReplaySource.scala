package graft.streaming

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.cdc.Lsn

/** "cdc-replay" — a DataSource V2 source that replays a CDC frame log
  * with the reference's delivery semantics (SURVEY.md §2 A1, A9-A13,
  * B10):
  *
  *  - offsets are LSNs (`startingLsn` option ≡ `uptoLsn` resume;
  *    `0/00000000` replays everything, `acknowledge.spec.ts:70-75`);
  *  - `maxFramesPerTrigger` bounds a micro-batch (the pull-based
  *    analogue of the reference's flow control, A12);
  *  - `commit(offset)` emulates the standby-status ack by persisting
  *    the acked LSN to an `_acked_lsn` sidecar (A9/A10) — restart
  *    resumes from the checkpoint, replaying any unacked tail ⇒
  *    at-least-once, deduplicated downstream;
  *  - also exposes BATCH_READ so `spark.read` replays the same log.
  *
  * Log format: one JSON line per transaction:
  * `{"lsn":<commitLsn>,"frames":["<hex pgoutput frame>",...]}`.
  * One file ≈ one slot/publication shard: `planInputPartitions`
  * emits one partition per file, so replay parallelism scales with
  * shard count while preserving intra-shard LSN order (the same
  * trade the reference makes with one ordered stream per slot, O5).
  */
object CdcReplaySource {
  val schema: StructType = StructType(Seq(
    StructField("lsn", LongType, nullable = false),
    StructField("frames", ArrayType(BinaryType), nullable = false)))

  val FORMAT: String = classOf[CdcReplayProvider].getName

  /** Writes a frame log (driver-side test/fixture helper). */
  def writeLog(path: String, rows: Seq[(Long, Seq[Array[Byte]])]): Unit =
    writeLogShard(path, 0, rows)

  private val HexChars = "0123456789abcdef".toCharArray

  /** Fast lowercase hex — the frame-log append is the live client's
    * hot path; per-byte String.format costs ~1 µs/byte and dominates
    * socket throughput. */
  def hex(b: Array[Byte]): String = {
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      val v = b(i) & 0xff
      out(i * 2) = HexChars(v >> 4)
      out(i * 2 + 1) = HexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Writes one shard of a frame log; a shard ≈ one slot/publication
    * (replay parallelism = shard count, intra-shard LSN order). */
  def writeLogShard(path: String, shard: Int,
      rows: Seq[(Long, Seq[Array[Byte]])]): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(dir, s"part-$shard.jsonl"))
    try rows.sortBy(_._1).foreach { case (lsn, frames) =>
      val hexed = frames.map(f => "\"" + hex(f) + "\"")
      w.println(s"""{"lsn":$lsn,"frames":[${hexed.mkString(",")}]}""")
    } finally w.close()
  }

  def listLogFiles(path: String): Seq[String] = {
    val dir = new java.io.File(path)
    if (!dir.isDirectory) Seq(path)
    else dir.listFiles().filter(_.getName.endsWith(".jsonl"))
      .map(_.getPath).sorted.toSeq
  }

  /** A frame-log line is complete iff it has the writer's exact object
    * shape. The append path is line-buffered, so a crash can tear at
    * most the LAST line of a shard. */
  private[streaming] def isComplete(line: String): Boolean =
    line.startsWith("{\"lsn\":") && line.endsWith("]}")

  /** Torn-tail tolerance: a torn LAST line is a crash artifact — by
    * the durable-then-ack contract (the log flush precedes the
    * covering ack) it is never acked, so dropping it just replays the
    * transaction next session. A torn line FOLLOWED by more lines is
    * not a crash artifact; that file is corrupt — fail loudly rather
    * than silently delivering a truncated frame. */
  private[streaming] def completeLines(
      fileName: String, lines: Iterator[String]): Iterator[String] =
    new Iterator[String] {
      private var pending: String = if (lines.hasNext) lines.next() else null
      def hasNext: Boolean = pending != null && {
        if (isComplete(pending)) true
        else if (lines.hasNext) throw new IllegalStateException(
          s"$fileName has a corrupt frame-log line before end of file; " +
            "only a torn final line (crash artifact) is tolerated")
        else { pending = null; false }
      }
      def next(): String = {
        val l = pending
        pending = if (lines.hasNext) lines.next() else null
        l
      }
    }

  /** Driver-side index scan: all (file, lsn) pairs, lsn-sorted.
    * Enforces the per-shard LSN-sort format invariant (this reads
    * every line anyway, so the check is free here). */
  def lsnIndex(path: String): Seq[Long] =
    listLogFiles(path).flatMap(lsnIndexOfFile).sorted

  /** One shard file's LSNs, format-invariant-checked. */
  private[streaming] def lsnIndexOfFile(f: String): Seq[Long] = {
    val src = scala.io.Source.fromFile(f)
    try {
      val lsns = completeLines(f, src.getLines())
        .map(parseLsn).toList
      lsns.iterator.sliding(2).foreach {
        case Seq(a, b) if b < a => throw new IllegalStateException(
          s"$f is not LSN-sorted ($b after $a); " +
            "cdc-replay shards must be written in LSN order")
        case _ => ()
      }
      lsns
    } finally src.close()
  }

  private[streaming] def parseLsn(line: String): Long = {
    val i = line.indexOf("\"lsn\":") + 6
    var j = i
    while (j < line.length && line.charAt(j).isDigit) j += 1
    line.substring(i, j).toLong
  }

  private[streaming] def parseFrames(line: String): Seq[Array[Byte]] = {
    val start = line.indexOf("\"frames\":[") + 10
    val end = line.lastIndexOf("]")
    val body = line.substring(start, end)
    if (body.isEmpty) Nil
    else body.split(",").toSeq.map { q =>
      val hex = q.trim.stripPrefix("\"").stripSuffix("\"")
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    }
  }

  def ackSidecar(path: String) = new java.io.File(path, "_acked_lsn")

  /** Atomic, MONOTONIC sidecar advance — every ack path (stream
    * commit, manual acknowledge, re-ack timer, socket client) funnels
    * here so a stale writer can never regress a newer position. */
  def writeAckedLsn(path: String, lsn: Long): Unit = synchronized {
    if (lastAckedLsn(path).forall(_ < lsn)) {
      val dir = java.nio.file.Paths.get(path)
      val tmp = java.nio.file.Files.createTempFile(dir, "_acked_lsn", ".tmp")
      java.nio.file.Files.write(tmp,
        lsn.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, ackSidecar(path).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
  }

  def lastAckedLsn(path: String): Option[Long] = {
    val f = ackSidecar(path)
    if (!f.exists) None
    else {
      val src = scala.io.Source.fromFile(f)
      try Some(src.mkString.trim.toLong) finally src.close()
    }
  }
}

class CdcReplayProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CdcReplaySource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CdcReplayTable(properties.asScala.toMap)
}

class CdcReplayTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"cdc-replay(${props.getOrElse("path", "?")})"
  override def schema(): StructType = CdcReplaySource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    require(options.get("path") != null,
      "cdc-replay requires the 'path' option (directory of *.jsonl frame logs)")
    new CdcReplayScanBuilder(options)
  }
}

/** Scan builder with LSN-range filter pushdown (SURVEY §4 O1 made
  * real for this source): `lsn` comparisons become the partitions'
  * (startExclusive, endInclusive) bounds, which the reader turns into
  * skip-head / stop-early I/O on the LSN-sorted shard files — the
  * replay analogue of `START_REPLICATION ... <lsn>` doing the
  * filtering server-side. Accepted filters are applied *exactly*, so
  * they are consumed here and not re-evaluated post-scan. */
class CdcReplayScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  import org.apache.spark.sql.sources._

  private val path = options.get("path")
  private var lsnLowExclusive = Long.MinValue
  private var lsnHighInclusive = Long.MaxValue
  private var pushed = Array.empty[Filter]

  private def num(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // -1 adjustments must not wrap at Long.MinValue — a value at the
    // edge stays unconsumed (Spark evaluates it post-scan) rather
    // than flipping the bound to its opposite
    val remaining = filters.filter {
      case GreaterThan("lsn", v) if num(v).isDefined =>
        lsnLowExclusive = math.max(lsnLowExclusive, num(v).get); false
      case GreaterThanOrEqual("lsn", v)
          if num(v).exists(_ != Long.MinValue) =>
        lsnLowExclusive = math.max(lsnLowExclusive, num(v).get - 1); false
      case LessThan("lsn", v) if num(v).exists(_ != Long.MinValue) =>
        lsnHighInclusive = math.min(lsnHighInclusive, num(v).get - 1); false
      case LessThanOrEqual("lsn", v) if num(v).isDefined =>
        lsnHighInclusive = math.min(lsnHighInclusive, num(v).get); false
      case EqualTo("lsn", v) if num(v).exists(_ != Long.MinValue) =>
        lsnLowExclusive = math.max(lsnLowExclusive, num(v).get - 1)
        lsnHighInclusive = math.min(lsnHighInclusive, num(v).get); false
      case _ => true
    }
    pushed = filters.diff(remaining)
    remaining
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = CdcReplaySource.schema
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new CdcReplayStream(path,
        Option(options.get("startingLsn")).map(parseStart).getOrElse(0L),
        Option(options.get("maxFramesPerTrigger")).map(_.toLong)
          .getOrElse(Long.MaxValue))
    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        CdcReplaySource.listLogFiles(path)
          .map(f => CdcReplayPartition(f, lsnLowExclusive, lsnHighInclusive)
            : InputPartition).toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new CdcReplayReaderFactory
    }
  }

  private def parseStart(s: String): Long =
    if (s.contains("/")) Lsn.parse(s) else s.toLong
}

/** LSN offset: "frames with lsn <= value have been delivered". */
case class LsnOffset(lsn: Long) extends Offset {
  override def json(): String = lsn.toString
}

class CdcReplayStream(path: String, startingLsn: Long, maxPerTrigger: Long)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  // Incremental LSN index, REFRESHED at every offset poll — the live
  // loop decouples socket ingest from consumption, so frames keep
  // landing while the query runs and each micro-batch must see them
  // (the file-source listing pattern). Per-file cache keyed on file
  // length: only shards that grew (socket append) or appeared (new
  // client/slot) are re-read; an unchanged 100-shard log costs one
  // directory listing + length stats per trigger, no IO.
  private val fileCache =
    scala.collection.mutable.Map.empty[String, (Long, Seq[Long])]

  private def refreshIndex(): Seq[Long] = synchronized {
    val all = CdcReplaySource.listLogFiles(path).flatMap { f =>
      val len = new java.io.File(f).length()
      fileCache.get(f) match {
        case Some((cachedLen, lsns)) if cachedLen == len => lsns
        case _ =>
          val lsns = CdcReplaySource.lsnIndexOfFile(f)
          fileCache(f) = (len, lsns)
          lsns
      }
    }
    all.filter(_ > startingLsn).sorted
  }

  // Trigger.AvailableNow bound: fixed at query start
  private var availableNowEnd: Option[Long] = None

  override def initialOffset(): Offset = LsnOffset(startingLsn)

  override def prepareForTriggerAvailableNow(): Unit = {
    val idx = refreshIndex()
    availableNowEnd = Some(if (idx.isEmpty) startingLsn else idx.last)
  }

  /** Admission control (the pull-based analogue of the reference's
    * flow control, A12): each micro-batch admits at most
    * maxFramesPerTrigger transactions. */
  override def getDefaultReadLimit: ReadLimit =
    if (maxPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[LsnOffset].lsn
    val cap = availableNowEnd.getOrElse(Long.MaxValue)
    val pending = refreshIndex().filter(l => l > s && l <= cap)
    val taken = limit match {
      case r: ReadMaxRows =>
        pending.take(math.min(r.maxRows(), Int.MaxValue.toLong).toInt)
      case _ => pending
    }
    LsnOffset(if (taken.isEmpty) s else taken.last)
  }

  override def reportLatestOffset(): Offset = {
    val idx = refreshIndex()
    LsnOffset(if (idx.isEmpty) startingLsn else idx.last)
  }

  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "admission-control latestOffset(start, limit) is used")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[LsnOffset].lsn
    val e = end.asInstanceOf[LsnOffset].lsn
    CdcReplaySource.listLogFiles(path)
      .map(f => CdcReplayPartition(f, s, e): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcReplayReaderFactory

  override def deserializeOffset(json: String): Offset = LsnOffset(json.toLong)

  /** The standby-status analogue: persist the acked LSN (A9/A10). */
  override def commit(end: Offset): Unit =
    CdcReplaySource.writeAckedLsn(path, end.asInstanceOf[LsnOffset].lsn)

  override def stop(): Unit = ()
}

/** (start, end] slice of one log file. */
case class CdcReplayPartition(file: String, startExclusive: Long,
    endInclusive: Long) extends InputPartition

class CdcReplayReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[CdcReplayPartition]
    new PartitionReader[InternalRow] {
      private val source = scala.io.Source.fromFile(p.file)
      // log files are LSN-sorted per shard — a FORMAT INVARIANT that
      // both the streaming offsets and the pushed-down batch bounds
      // rely on. Monotonicity is checked on every line this reader
      // consumes (and over whole files in lsnIndex, which the stream
      // path always builds), so an out-of-order producer fails loudly
      // instead of silently losing rows. The sorted tail past
      // endInclusive terminates the scan early; the LSN is parsed
      // once per line.
      private var lastSeen = Long.MinValue
      private val rows = CdcReplaySource
        .completeLines(p.file, source.getLines())
        .map { l =>
          val lsn = CdcReplaySource.parseLsn(l)
          if (lsn < lastSeen) throw new IllegalStateException(
            s"${p.file} is not LSN-sorted ($lsn after $lastSeen); " +
              "cdc-replay shards must be written in LSN order")
          lastSeen = lsn
          (lsn, l)
        }
        .dropWhile(_._1 <= p.startExclusive)
        .takeWhile(_._1 <= p.endInclusive)
      private var current: InternalRow = _

      override def next(): Boolean = {
        if (!rows.hasNext) return false
        val (lsn, line) = rows.next()
        val frames = CdcReplaySource.parseFrames(line)
        current = InternalRow(
          lsn,
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            frames.toArray))
        true
      }
      override def get(): InternalRow = current
      override def close(): Unit = source.close()
    }
  }
}
