package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q238's live form: arriving `(event_type, value_c)` batches probe a
  * stored reference histogram and append one exact-integer
  * total-variation row per (batch, type) — matching distributions
  * score near 0, shifted ones near 1000, out-of-range mass clamps
  * into the edge bins, and replayed batch ids are no-ops. */
class StreamDriftProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-drift-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"drift-$tag").toString

  test("streamed batches score TV against the reference histogram; " +
      "batch ids are idempotent") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext

    // reference: 'view' values uniform over bins 0..9 (range 0..999,
    // 10 per bin); self-describing artifact carries the range
    val refDir = tmpDir("ref")
    val histRows = (0 until 10).map(b => ("view", b.toLong, 10L, 0L, 999L))
    histRows.toDF("event_type", "bin", "c_ref", "v0", "v1")
      .write.mode("overwrite").parquet(refDir)
    val reportDir = tmpDir("report")

    val input = MemoryStream[(String, Long)]
    val q = input.toDS().toDF("event_type", "value_c")
      .writeStream
      .foreachBatch(StreamOps.driftProbeBatch(refDir, reportDir) _)
      .start()
    try {
      // batch 0: same uniform distribution -> TV 0
      input.addData((0 until 1000).map(i => ("view", i.toLong)): _*)
      q.processAllAvailable()
      // batch 1: all mass at 5000 (outside the range -> clamps to
      // bin 9) -> TV = 1 - 1/10 = 900 milli
      input.addData((1 to 50).map(_ => ("view", 5000L)): _*)
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(reportDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(0L, 1L))
    assert(rows(0L) == ((1000L, 0L)), s"uniform batch must score TV 0")
    assert(rows(1L) == ((50L, 900L)),
      "a fully-shifted batch clamps to the edge bin and scores 900")

    // replaying a committed batch id appends nothing
    val before = spark.read.parquet(reportDir).count()
    StreamOps.driftProbeBatch(refDir, reportDir)(
      Seq(("view", 1L)).toDF("event_type", "value_c"), 0L)
    assert(spark.read.parquet(reportDir).count() == before)

    // a type with no reference histogram is skipped, not scored
    StreamOps.driftProbeBatch(refDir, reportDir)(
      Seq(("unknown", 1L)).toDF("event_type", "value_c"), 7L)
    assert(spark.read.parquet(reportDir)
      .filter(col("batch_id") === 7L).count() == 0)
  }
}
