package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The tokenizer-health member of the per-batch drift family (r15
  * verdict ask 8; siblings: KS q255-live, LSH q300-live): every
  * ingest batch re-encodes its own words under the FROZEN trained
  * merge literals ([[StreamOps.bpeFertilityProbeBatch]] — q306's
  * map-side replay shape, no training jobs) and
  * [[StreamOps.bpeDriftAlarm]] fires when fertility leaves the
  * calibration envelope in two consecutive batches. A matching
  * arrival stream stays quiet; a PLANTED shifted stream (words the
  * vocab never merges — new language / encoding junk) alarms on its
  * second batch; batch ids are idempotent; and the verdict surfaces
  * as the `bpe_fertility` row of [[StreamOps.storeHealthReport]]. */
class StreamBpeProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-bpe-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"bpeprobe-$tag").toString

  /** Frozen tokenizer under test: merges a+b, ab+c — the word "abc"
    * encodes to ONE piece, so an on-distribution stream of "abc"
    * words has fertility exactly 1000 milli. */
  private val picks = Seq("a b", "ab c")

  private def batchDf(words: Seq[String], idBase: Long) = {
    val ss = spark
    import ss.implicits._
    words.zipWithIndex.map { case (w, i) =>
      (idBase + i, s"$w $w $w $w")
    }.toDF("doc_id", "text")
  }

  private def healthy(idBase: Long) =
    batchDf(Seq("abc", "abc", "abc"), idBase)

  /** Unmergeable words: no pick applies, pieces = chars = 5 →
    * fertility 5000 milli, far outside any sane envelope. */
  private def drifted(idBase: Long) =
    batchDf(Seq("qrstu", "vwxyz", "qrstu"), idBase)

  test("on-distribution stream stays quiet; shifted stream alarms " +
      "on its second batch; batch ids idempotent") {
    val okDir = tmpDir("ok")
    StreamOps.bpeFertilityProbeBatch(okDir, picks)(healthy(100L), 0L)
    StreamOps.bpeFertilityProbeBatch(okDir, picks)(healthy(200L), 1L)
    // idempotency: replaying batch 1 appends nothing
    val n1 = spark.read.parquet(okDir).count()
    StreamOps.bpeFertilityProbeBatch(okDir, picks)(healthy(200L), 1L)
    assert(spark.read.parquet(okDir).count() == n1)
    val ok = StreamOps.bpeDriftAlarm(spark, okDir,
      loMilli = 1000L, hiMilli = 1800L).head()
    assert(ok.getAs[Long]("last_fertility_milli") == 1000L,
      "the frozen vocab fully merges 'abc': fertility must be 1000")
    assert(!ok.getAs[Boolean]("drift_alarm"))

    val badDir = tmpDir("bad")
    StreamOps.bpeFertilityProbeBatch(badDir, picks)(drifted(100L), 0L)
    // one breaching batch never fires (n_recent = 1 < consecutive)
    assert(!StreamOps.bpeDriftAlarm(spark, badDir,
      loMilli = 1000L, hiMilli = 1800L).head()
      .getAs[Boolean]("drift_alarm"),
      "a single breaching batch must not alarm (consecutive = 2)")
    StreamOps.bpeFertilityProbeBatch(badDir, picks)(drifted(200L), 1L)
    val bad = StreamOps.bpeDriftAlarm(spark, badDir,
      loMilli = 1000L, hiMilli = 1800L).head()
    assert(bad.getAs[Long]("last_fertility_milli") == 5000L)
    assert(bad.getAs[Boolean]("drift_alarm"),
      "two consecutive out-of-envelope batches must alarm")

    // the verdict surfaces on the ops pane, with the breach census
    val pane = StreamOps.storeHealthReport(spark,
      bpeReportDir = Some(badDir), bpeEnvelopeMilli = (1000L, 1800L))
      .filter(col("store") === "bpe_fertility").collect()
    assert(pane.length == 1)
    assert(pane(0).getAs[Boolean]("compact_recommended"),
      "the pane's attention flag must carry the drift alarm")
    assert(pane(0).getAs[Long]("n_stale") == 2L) // both batches breach
    val paneOk = StreamOps.storeHealthReport(spark,
      bpeReportDir = Some(okDir), bpeEnvelopeMilli = (1000L, 1800L))
      .filter(col("store") === "bpe_fertility").collect()
    assert(paneOk.length == 1 &&
      !paneOk(0).getAs[Boolean]("compact_recommended"))
    assert(paneOk(0).getAs[Long]("n_live") == 2L)
  }

  test("probe rows carry the census shape and doc-level dedup") {
    val dir = tmpDir("shape")
    // duplicate doc_id rows in one batch count once (at-least-once
    // delivery upstream must not skew the census)
    val ss = spark
    import ss.implicits._
    val dup = Seq((1L, "abc abc"), (1L, "abc abc"), (2L, "abc de"))
      .toDF("doc_id", "text")
    StreamOps.bpeFertilityProbeBatch(dir, picks)(dup, 7L)
    val rows = spark.read.parquet(dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("batch_id") == 7L)
    // doc 1: abc(1 piece) x2; doc 2: abc(1) + de(2 pieces — only
    // "a b" then "ab c" apply, d+e never merges) → 4 words, 5 pieces
    assert(r.getAs[Long]("words") == 4L)
    assert(r.getAs[Long]("pieces") == 5L)
    assert(r.getAs[Long]("fertility_milli") == 1250L)
  }
}
