package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.{CdcFunctions, ColumnInfo, PgoutputWriter, RelationInfo}

/** Content-level frame scrub (`scrubFrameLog`) — the legal-hold escape
  * hatch behind the retention-bounded RTBF posture: positions are
  * sacred (line count, LSN sequence, transaction framing all
  * preserved), payloads carrying a forget subject are replaced by a
  * decodable `graft/redacted` logical message, untouched files stay
  * byte-identical, and reruns are no-ops. */
class FrameScrubSpec extends AnyFunSuite {

  private val rel = RelationInfo(
    relationOid = 60001, schema = "public", name = "docs",
    replicaIdentity = "default",
    columns = Seq(
      ColumnInfo("id", 1, 20, -1, null, null),
      ColumnInfo("owner", 0, 25, -1, null, null)))

  private def tx(lsn: Long, id: Long, owner: String) = lsn -> Seq(
    PgoutputWriter.begin(lsn, lsn * 1000L, id),
    PgoutputWriter.relation(rel),
    PgoutputWriter.insert(rel.relationOid, Seq(id.toString, owner)),
    PgoutputWriter.commit(lsn, lsn + 1, lsn * 1000L))

  private def bytesOf(p: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  test("scrub replaces only subject frames, preserves LSN sequence " +
      "and untouched files byte-for-byte, and reruns are no-ops") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-scrub").toString
    CdcReplaySource.writeLogShard(root, 0,
      Seq(tx(100L, 1L, "subject-7"), tx(200L, 2L, "other-1")))
    CdcReplaySource.writeLogShard(root, 1, Seq(tx(150L, 3L, "other-2")))
    val clean1 = bytesOf(s"$root/part-1.jsonl")
    val lsnsBefore = CdcReplaySource.lsnIndex(root)

    val counts = CdcReplaySource.scrubFrameLog(root,
      Seq("subject-7".getBytes("UTF-8")))
    assert(counts == Map("part-0.jsonl" -> 1L, "part-1.jsonl" -> 0L))

    // positions: same files, same LSNs, same per-line frame counts
    assert(CdcReplaySource.lsnIndex(root) == lsnsBefore)
    // the no-hit shard was not rewritten at all
    assert(bytesOf(s"$root/part-1.jsonl").sameElements(clean1))

    // the hit transaction still decodes: framing intact, the insert
    // replaced by the visible redaction message at the tx's own LSN
    val src = scala.io.Source.fromFile(s"$root/part-0.jsonl")
    val lines = try src.getLines().toList finally src.close()
    val hitFrames = CdcReplaySource.parseFrames(lines.head)
    assert(hitFrames.length == 4)
    val decoded = CdcFunctions.decodeFrameSequence(hitFrames)
    assert(decoded.map(_.tag) ==
      Seq("begin", "relation", "message", "commit"))
    val red = decoded.find(_.tag == "message").get
    assert(red.messagePrefix == "graft/redacted")
    assert(red.lsn == 100L)
    assert(!new String(CdcReplaySource.parseFrames(lines.head)
      .flatMap(_.toSeq).toArray, "ISO-8859-1").contains("subject-7"))
    // the neighbouring transaction's payload survived
    val other = CdcFunctions.decodeFrameSequence(
      CdcReplaySource.parseFrames(lines(1)))
    assert(other.exists(m => m.tag == "insert" &&
      m.after("owner") == "other-1"))

    // idempotent: the redaction frame carries no subject bytes
    val again = CdcReplaySource.scrubFrameLog(root,
      Seq("subject-7".getBytes("UTF-8")))
    assert(again.values.forall(_ == 0L))
  }

  test("a torn final line is preserved as-is and a crashed scrub's " +
      "scratch is swept on the next run") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-scrub-torn").toString
    CdcReplaySource.writeLogShard(root, 0,
      Seq(tx(100L, 1L, "subject-9"), tx(200L, 2L, "subject-9")))
    // tear the tail: chop the last line mid-object
    val p = java.nio.file.Paths.get(s"$root/part-0.jsonl")
    val all = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val torn = all.linesIterator.toList
    val tornText = torn.head + "\n" + torn(1).take(20) + "\n"
    java.nio.file.Files.write(p, tornText.getBytes("UTF-8"))
    // leak a scratch file from a "crashed" predecessor
    val stale = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(root), "part-0.jsonl", ".scrub")
    java.nio.file.Files.write(stale, "junk".getBytes("UTF-8"))

    val counts = CdcReplaySource.scrubFrameLog(root,
      Seq("subject-9".getBytes("UTF-8")))
    assert(counts("part-0.jsonl") == 1L) // the complete line only
    val after = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    // torn tail (no decodable subject bytes) byte-identical, still last
    assert(after.linesIterator.toList.last == torn(1).take(20))
    // no scratch files survive
    val leftovers = new java.io.File(root).listFiles()
      .filter(_.getName.endsWith(".scrub"))
    assert(leftovers.isEmpty)
  }

  test("a torn tail whose PARTIAL hex still decodes to subject bytes " +
      "is dropped, not preserved — no silent compliance hole") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-scrub-torn-hit").toString
    CdcReplaySource.writeLogShard(root, 0, Seq(
      tx(100L, 1L, "other-1"), tx(200L, 2L, "subject-9")))
    val p = java.nio.file.Paths.get(s"$root/part-0.jsonl")
    val all = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val lines = all.linesIterator.toList
    // tear AFTER the subject's payload hex: the partial line still
    // carries recoverable subject bytes
    val subjHex = "subject-9".getBytes("UTF-8")
      .map(b => f"${b & 0xff}%02x").mkString
    val cut = lines(1).indexOf(subjHex) + subjHex.length + 4
    assert(cut > subjHex.length, "fixture: subject hex must be present")
    java.nio.file.Files.write(p,
      (lines.head + "\n" + lines(1).take(cut) + "\n").getBytes("UTF-8"))

    val counts = CdcReplaySource.scrubFrameLog(root,
      Seq("subject-9".getBytes("UTF-8")))
    assert(counts("part-0.jsonl") == 1L) // the torn carrier
    val after = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(after.linesIterator.toList == List(lines.head),
      "the subject-bearing torn tail must be gone, the clean line kept")
    // idempotent
    assert(CdcReplaySource.scrubFrameLog(root,
      Seq("subject-9".getBytes("UTF-8"))).values.sum == 0L)
  }
}
