package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q300's live twin (r14 verdict ask 6): every ingest batch audits
  * the LSH banding scheme against 1 − (1 − s²)^8 on controlled
  * subset-pairs of its own docs. A healthy hash family tracks the
  * theory (no decile alarms after two batches); a PLANTED broken
  * family (constant hashes — every band fires at every J) trips
  * [[StreamOps.lshDriftAlarm]] on its second batch; batch ids are
  * idempotent; and the verdict surfaces as the `lsh_calibration` row
  * of [[StreamOps.storeHealthReport]]. */
class StreamLshProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-lsh-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"lshprobe-$tag").toString

  private def alpha(i: Int): String =
    i.toString.map(c => ('a' + (c - '0')).toChar).mkString

  /** A batch of docs with ~48 distinct shingles each (3-token
    * shingles need 50 tokens), seeded per batch so batches differ. */
  private def batchDf(seed: Int, nDocs: Int) = {
    val ss = spark
    import ss.implicits._
    val r = new scala.util.Random(seed)
    (1 to nDocs).map { i =>
      val toks = Seq.fill(50)("w" + alpha(r.nextInt(100000)))
      ((seed * 1000 + i).toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("healthy family tracks theory; broken family trips the " +
      "alarm; batch ids idempotent") {
    val healthyDir = tmpDir("healthy")
    val brokenDir = tmpDir("broken")

    // two batches through the production family
    StreamOps.lshCalibrationProbeBatch(healthyDir)(batchDf(1, 24), 0L)
    StreamOps.lshCalibrationProbeBatch(healthyDir)(batchDf(2, 24), 1L)
    // idempotency: replaying batch 1 appends nothing
    val n1 = spark.read.parquet(healthyDir).count()
    StreamOps.lshCalibrationProbeBatch(healthyDir)(batchDf(2, 24), 1L)
    assert(spark.read.parquet(healthyDir).count() == n1)

    val healthy = StreamOps.lshDriftAlarm(spark, healthyDir)
      .collect()
    assert(healthy.nonEmpty)
    assert(!healthy.exists(_.getAs[Boolean]("drift_alarm")),
      s"healthy family must not alarm: ${healthy.mkString(", ")}")

    // planted broken family: constant hash functions — every band
    // collides at every J, so low deciles observe ~1000 fire-rate
    // against a near-zero theory
    val zeros = Seq.fill(16)(0L)
    val ones = Seq.fill(16)(0L)
    StreamOps.lshCalibrationProbeBatch(brokenDir, zeros, ones)(
      batchDf(1, 24), 0L)
    StreamOps.lshCalibrationProbeBatch(brokenDir, zeros, ones)(
      batchDf(2, 24), 1L)
    val broken = StreamOps.lshDriftAlarm(spark, brokenDir).collect()
    assert(broken.exists(_.getAs[Boolean]("drift_alarm")),
      s"broken family must alarm: ${broken.mkString(", ")}")

    // one noisy batch never fires: a single-batch report has
    // n_recent = 1 < consecutive, so even a breach stays quiet
    val oneDir = tmpDir("one")
    StreamOps.lshCalibrationProbeBatch(oneDir, zeros, ones)(
      batchDf(1, 24), 0L)
    val one = StreamOps.lshDriftAlarm(spark, oneDir).collect()
    assert(!one.exists(_.getAs[Boolean]("drift_alarm")),
      "a single breaching batch must not alarm (consecutive = 2)")

    // the verdict surfaces on the ops pane
    val pane = StreamOps.storeHealthReport(spark,
      lshReportDir = Some(brokenDir))
      .filter(col("store") === "lsh_calibration").collect()
    assert(pane.length == 1)
    assert(pane(0).getAs[Boolean]("compact_recommended"),
      "the pane's attention flag must carry the drift alarm")
    assert(pane(0).getAs[Long]("n_stale") > 0)
    val paneH = StreamOps.storeHealthReport(spark,
      lshReportDir = Some(healthyDir))
      .filter(col("store") === "lsh_calibration").collect()
    assert(paneH.length == 1 &&
      !paneH(0).getAs[Boolean]("compact_recommended"))
  }

  test("probe rows carry the q300 shape and exact-J controlled arms") {
    val dir = tmpDir("shape")
    StreamOps.lshCalibrationProbeBatch(dir)(batchDf(7, 16), 5L)
    val rep = spark.read.parquet(dir)
    assert(rep.columns.toSeq == Seq("batch_id", "decile", "n_pairs",
      "obs_milli", "theo_milli", "gap_milli"))
    val rows = rep.collect()
    assert(rows.forall(_.getAs[Long]("batch_id") == 5L))
    // keep-rates k/8 for k = 1..7 target J ≈ 125..875 milli (each
    // doc's realized nsub/n is binomial around k/8, so edge deciles
    // can be brushed): the sweep must populate a broad mid-range
    // real corpus pairs never reach
    val deciles = rows.map(_.getAs[Long]("decile")).toSet
    assert(deciles.forall(d => d >= 0L && d <= 9L), s"deciles: $deciles")
    assert(deciles.size >= 5, s"controlled arms must sweep the " +
      s"mid-range deciles, got only: $deciles")
    // gap is definitionally obs - theo
    assert(rows.forall(r => r.getAs[Long]("gap_milli") ==
      r.getAs[Long]("obs_milli") - r.getAs[Long]("theo_milli")))
  }
}
