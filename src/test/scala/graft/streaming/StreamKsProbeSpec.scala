package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q255's live form: arriving `(source, len)` batches are scored
  * against a stored reference length histogram with the exact
  * two-sample KS statistic — an in-distribution batch scores 0, a
  * fully-shifted one 1e6 ppm, a half-shifted one the hand-computed
  * sup, and replayed batch ids are no-ops. */
class StreamKsProbeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-ks-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ks-$tag").toString

  test("streamed batches score exact KS against the reference; " +
      "batch ids are idempotent") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext

    // reference: lengths 10..19, 10 docs each (N_ref = 100)
    val refDir = tmpDir("ref")
    (10 to 19).map(l => (l.toLong, 10L)).toDF("len", "c_ref")
      .write.mode("overwrite").parquet(refDir)
    val reportDir = tmpDir("report")

    val input = MemoryStream[(String, Long)]
    val q = input.toDS().toDF("source", "len")
      .writeStream
      .foreachBatch(StreamOps.ksProbeBatch(refDir, reportDir) _)
      .start()
    try {
      // batch 0: the reference shape exactly (2 docs per length)
      input.addData((10 to 19).flatMap(l =>
        Seq(("web", l.toLong), ("web", l.toLong))): _*)
      q.processAllAvailable()
      // batch 1: all mass far right of the reference -> sup = 1
      input.addData((1 to 5).map(_ => ("web", 100L)): _*)
      q.processAllAvailable()
      // batch 2: half in-distribution head (len 10), half far right:
      // sup at len in [10, 19]: |cum_b*100 - cum_r*4| peaks at len 19
      // (|200 - 400| = 200) -> 200 * 1e6 / (4 * 100) = 500000
      input.addData(("web", 10L), ("web", 10L),
        ("web", 100L), ("web", 100L))
      q.processAllAvailable()
    } finally q.stop()

    val rows = spark.read.parquet(reportDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.keySet == Set(0L, 1L, 2L))
    assert(rows(0L) == ((20L, 0L)),
      "an in-distribution batch must score KS 0")
    assert(rows(1L) == ((5L, 1000000L)),
      "a fully-shifted batch must score the full 1e6 ppm")
    assert(rows(2L) == ((4L, 500000L)),
      "the half-shifted batch must score the hand-computed sup")

    // replaying a committed batch id appends nothing
    val before = spark.read.parquet(reportDir).count()
    StreamOps.ksProbeBatch(refDir, reportDir)(
      Seq(("web", 10L)).toDF("source", "len"), 0L)
    assert(spark.read.parquet(reportDir).count() == before)
  }
}
