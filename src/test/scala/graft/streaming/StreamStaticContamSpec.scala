package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Tables, Text}

/** q234's live form (r9 verdict ask 7): eval documents arrive as a
  * STREAM and probe the standing train-gram index — a stream-static
  * equi-join keyed on the 32-bit gram hash, verdicts appended per
  * micro-batch with the same batch-id commit-marker idempotency as
  * `dedupIngestBatch`. Gram extraction on both sides is
  * `Text.gram8Of*` — the single builder q231/q234 use — so the spec
  * also pins that stream and batch cannot hash-drift apart. */
class StreamStaticContamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-static-contam")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tmpDir(tag: String): String = {
    val f = java.nio.file.Files
      .createTempDirectory(s"graft-contam-$tag").toFile
    f.deleteOnExit()
    f.getPath
  }

  test("streamed eval docs probe the train index; verdicts are " +
      "batch-id idempotent and cover every arrival") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext

    // standing train index: the corpus' distinct 8-gram set (at scale
    // a bucketed-by-g table maintained by ingest)
    val trainDir = tmpDir("train")
    val verdictsDir = tmpDir("verdicts")
    Text.gram8Of(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")))
      .write.mode("overwrite").parquet(trainDir)

    // a corpus text to replay as a leaked eval doc
    val leakedText = Tables.documents(spark, sfDir)
      .filter(size(split(lower(col("text")), "[^a-z]+")) >= 12)
      .select(col("text")).head().getString(0)

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(
        StreamOps.contaminationProbeBatch(trainDir, verdictsDir) _)
      .start()
    try {
      input.addData(
        (9001L, leakedText), // verbatim train text: fully contaminated
        (9002L, "zzqx qqzv xxyzk wvutq plmno abcde fghij qrstu vwxyz " +
          "lmnop"), // novel 10-gram doc: clean
        (9003L, "too short for grams")) // < 8 tokens: no grams, clean
      q.processAllAvailable()
      input.addData((9004L, leakedText)) // second trigger, same leak
      q.processAllAvailable()
    } finally q.stop()

    val v = spark.read.parquet(verdictsDir)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4), r.getLong(0))))
      .toMap
    assert(v.keySet == Set(9001L, 9002L, 9003L, 9004L),
      s"every arrival gets a verdict row; got ${v.keySet}")
    val (g1, h1, c1, _) = v(9001L)
    assert(g1 > 0 && h1 == g1 && c1, "verbatim copy is 100% contaminated")
    val (g2, h2, c2, _) = v(9002L)
    assert(g2 > 0 && h2 == 0 && !c2, "novel doc has zero leaked grams")
    val (g3, h3, c3, _) = v(9003L)
    assert(g3 == 0 && h3 == 0 && !c3,
      "a sub-8-token doc still gets an (empty, clean) verdict")
    assert(v(9004L)._3, "second-trigger leak flagged too")
    val batches = v.values.map(_._4).toSet
    assert(batches.size == 2, s"two distinct batch ids, got $batches")

    // at-least-once replay of an already-committed batch id: no-op
    val before = spark.read.parquet(verdictsDir).count()
    val replay = Seq((9001L, leakedText)).toDF("doc_id", "text")
    StreamOps.contaminationProbeBatch(trainDir, verdictsDir)(
      replay, batches.head)
    assert(spark.read.parquet(verdictsDir).count() == before,
      "replayed batch id must not append duplicate verdicts")
  }

  test("q234 batch query agrees with a direct per-doc recomputation") {
    // the oracle gates q234's values; here pin INTERNAL consistency:
    // summing the per-doc probe (the streaming shape) over the eval
    // split reproduces the per-batch rollup exactly
    val q234 = graft.SparkEntry.queries("q234_contamination_probe_batches")(
      spark, sfDir)
    val rows = q234.collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getLong(1)).sum
    val evalDocs = Text.gram8Of(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text")))
      .withColumn("is_eval", pmod(graft.cdc.GraftFunctions.md5_h32(
        col("doc_id").cast("string")), lit(20L)) === 0L)
      .filter(col("is_eval")).select(col("doc_id")).distinct().count()
    assert(totalDocs == evalDocs,
      s"per-batch doc counts must partition the eval split " +
        s"($totalDocs vs $evalDocs)")
  }
}
