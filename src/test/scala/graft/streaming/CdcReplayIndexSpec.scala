package graft.streaming

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

/** The driver index's incremental-append contract: a growing shard
  * costs O(appended bytes) per poll, not O(file) — the live-tail
  * property that keeps a 100 GB shard's offset polls cheap. Torn
  * tails are retried from the same high-water mark; rewrites
  * (shrink, or same-length mtime change) fall back to a full
  * re-parse. */
class CdcReplayIndexSpec extends AnyFunSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("replay-index").toString

  private def frame(i: Int): Seq[Array[Byte]] =
    Seq(Array.fill[Byte](32)(i.toByte))

  private def poll(s: CdcReplayStream): ShardOffsets =
    ShardOffsets.from(
      s.latestOffset(s.initialOffset(), ReadLimit.allAvailable()))

  test("appends parse only the tail; torn tails retry; rewrites " +
      "re-parse fully") {
    val dir = tmpDir()
    CdcReplaySource.writeLogShard(dir, 0,
      (1 to 200).map(i => (i * 10L, frame(i % 120))))
    val f = new java.io.File(dir, "part-0.jsonl")
    val fullLen = f.length()

    val stream = new CdcReplayStream(dir,
      ShardOffsets(0L, Map.empty), Long.MaxValue)
    assert(poll(stream).of("part-0.jsonl") == 2000L)
    val afterFirst = stream.indexBytesParsed
    assert(afterFirst == fullLen, "first poll parses the whole shard")

    // append one transaction -> only its bytes are parsed
    val w = new java.io.PrintWriter(new java.io.FileWriter(f, true))
    w.println("""{"lsn":2010,"frames":["2a2b"]}""")
    w.close()
    assert(poll(stream).of("part-0.jsonl") == 2010L,
      "the appended transaction must be visible")
    val delta = stream.indexBytesParsed - afterFirst
    assert(delta == f.length() - fullLen,
      s"append must cost O(delta) bytes, parsed $delta")

    // torn tail: unfinished line is invisible and retried in place
    val lenBeforeTorn = f.length()
    val parsedBeforeTorn = stream.indexBytesParsed
    val w2 = new java.io.PrintWriter(new java.io.FileWriter(f, true))
    w2.print("""{"lsn":2020,"frames":["2c""") // no terminator
    w2.close()
    assert(poll(stream).of("part-0.jsonl") == 2010L,
      "a torn tail must not deliver")
    assert(stream.indexBytesParsed == parsedBeforeTorn,
      "nothing complete to parse past the high-water mark")
    // the writer finishes the line -> exactly the torn tx parses
    val w3 = new java.io.PrintWriter(new java.io.FileWriter(f, true))
    w3.println("""2d"]}""")
    w3.close()
    assert(poll(stream).of("part-0.jsonl") == 2020L)
    assert(stream.indexBytesParsed - parsedBeforeTorn ==
      f.length() - lenBeforeTorn)

    // rewrite (shrink): full re-parse of the rewritten file
    CdcReplaySource.writeLogShard(dir, 0,
      (1 to 3).map(i => (i * 10L, frame(i))))
    val parsedBeforeRewrite = stream.indexBytesParsed
    assert(poll(stream).of("part-0.jsonl") == 30L)
    assert(stream.indexBytesParsed - parsedBeforeRewrite == f.length())
  }

  test("an appended out-of-order LSN fails loudly at the boundary") {
    val dir = tmpDir()
    CdcReplaySource.writeLogShard(dir, 0, Seq((100L, frame(1))))
    val stream = new CdcReplayStream(dir,
      ShardOffsets(0L, Map.empty), Long.MaxValue)
    assert(poll(stream).of("part-0.jsonl") == 100L)
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(new java.io.FileWriter(f, true))
    w.println("""{"lsn":50,"frames":[]}""") // regresses
    w.close()
    val e = intercept[IllegalStateException] { poll(stream) }
    assert(e.getMessage.contains("LSN order"))
  }
}
