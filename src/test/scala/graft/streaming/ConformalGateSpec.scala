package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Conformal quality gate at ingest (q291's live twin): the floor is
  * the exact order statistic of the STANDING calibration store, a
  * batch never gates itself, bootstrap is open, zero-token docs fail
  * explicitly, replays converge, and erasure removes a forgotten
  * doc's influence on every future floor. */
class ConformalGateSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-conformal-gate")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def docs(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  // q = 10000: >= 100 distinct non-stop tokens (all-alphabetic — the
  // tokenizer splits on [^a-z], so digits would merge the types)
  private val richText = (0 until 120)
    .map(i => s"z${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
    .mkString(" ")
  // q = 4120: 3 tokens, 1 distinct, none stop ->
  // 10000*(0.4*0.03 + 0.3*1 + 0.3/3)
  private val poorText = "aaa aaa aaa"

  private def verd(dir: String, batch: Long): Map[Long, (Long, Long, Boolean)] =
    spark.read.parquet(dir).filter(col("batch_id") === batch)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("q"), r.getAs[Long]("thr_q"),
          r.getAs[Boolean]("pass")))).toMap

  test("bootstrap is open, the floor is the exact k-th smallest " +
      "calibration score, zero-token docs fail explicitly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-conformal").toString
    val cal = s"$root/cal"; val v = s"$root/verd"
    val run = StreamOps.qualityGateIngestBatch(cal, v) _

    // batch 0 on an empty store: floor -1, scored docs pass, the
    // zero-token doc fails with q = -1 rather than dropping silently
    run(docs(1L -> richText, 2L -> poorText, 3L -> "?!..."), 0L)
    val v0 = verd(v, 0L)
    assert(v0(1L) == ((10000L, -1L, true)))
    assert(v0(2L) == ((4120L, -1L, true)))
    assert(v0(3L) == ((-1L, -1L, false)))

    // seed a known store: 19 scores 5000..6800 -> at alpha = 100,
    // k = floor(100 * 20 / 1000) = 2, floor = the 2nd smallest 5100
    val s = spark; import s.implicits._
    val seeded = s"$root/cal2"; val v2 = s"$root/verd2"
    (0 until 19).map(i => (9000L + i, 5000L + 100L * i))
      .toDF("doc_id", "q").write.parquet(seeded)
    StreamOps.qualityGateIngestBatch(seeded, v2)(
      docs(10L -> richText, 11L -> poorText), 0L)
    val v1 = verd(v2, 0L)
    assert(v1(10L) == ((10000L, 5100L, true)))
    assert(v1(11L) == ((4120L, 5100L, false)), "4120 < floor 5100")
  }

  test("replays converge: marker short-circuits, a crash between the " +
      "calibration append and the verdict write re-runs cleanly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-conformal-replay").toString
    val cal = s"$root/cal"; val v = s"$root/verd"
    val run = StreamOps.qualityGateIngestBatch(cal, v) _
    run(docs(1L -> richText, 5L -> richText), 0L)
    val calAfter0 = spark.read.parquet(cal).count()
    assert(calAfter0 >= 1L) // the md5 1-in-5 split fed the store

    // full replay of a committed batch: nothing moves
    run(docs(1L -> richText, 5L -> richText), 0L)
    assert(spark.read.parquet(cal).count() == calAfter0)
    assert(spark.read.parquet(v).count() == 2L)

    // crash window: predecessor appended calibration for batch 1 but
    // died before the verdict marker — emulate by pre-appending the
    // batch's split rows, then run the "replay"
    val s = spark; import s.implicits._
    val b1 = docs(20L -> richText, 21L -> richText, 22L -> richText,
      23L -> richText, 24L -> richText, 25L -> richText)
    val split = graft.ops.Text.qualityScoresOf(b1)
      .filter(pmod(graft.cdc.GraftFunctions.md5_h32(
        col("doc_id").cast("string")), lit(5L)) === 0L)
      .select(col("doc_id"), col("q"))
    val nSplit = split.count()
    split.write.mode("append").parquet(cal)
    run(b1, 1L)
    // the anti-join kept the store converged: exactly one row per
    // split doc, verdicts written exactly once
    assert(spark.read.parquet(cal).count() == calAfter0 + nSplit)
    assert(spark.read.parquet(cal).groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count() == 0L)
    assert(spark.read.parquet(v)
      .filter(col("batch_id") === 1L).count() == 6L)
  }

  test("erasure removes a forgotten doc's influence on future floors " +
      "and the report names it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-conformal-forget").toString
    val cal = s"$root/cal"; val v = s"$root/verd"
    val s = spark; import s.implicits._
    // a low outlier (doc 50, q 100) drags the floor down: with 19
    // rows at alpha 200, k = 4 -> floor = 4th smallest
    ((50L, 100L) +: (0 until 18).map(i => (9000L + i, 5000L + 100L * i)))
      .toDF("doc_id", "q").write.parquet(cal)
    def floorNow(): Long = {
      StreamOps.qualityGateIngestBatch(cal, v, alphaMilli = 200L)(
        docs(60L -> richText), System.nanoTime())
      spark.read.parquet(v).orderBy(col("batch_id").desc).head
        .getAs[Long]("thr_q")
    }
    assert(floorNow() == 5200L) // {100,5000,5100,5200,...} -> 4th

    StreamOps.forgetBatch(s"$root/frep", calDir = Some(cal))(
      docs(50L -> "whatever"), 0L)
    val rep = spark.read.parquet(s"$root/frep").head
    assert(rep.getAs[Long]("n_cal_removed") == 1L)
    // store is 18 rows + whatever floorNow()'s probe batches seeded;
    // the probe doc 60 hashes into the split or not — either way the
    // outlier is gone and the floor moved UP
    assert(floorNow() >= 5200L)
    assert(spark.read.parquet(cal)
      .filter(col("doc_id") === 50L).count() == 0L)
  }
}
