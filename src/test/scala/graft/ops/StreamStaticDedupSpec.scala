package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-on-ingest — the production shape of near-dup detection: new
  * documents arrive as a STREAM and join the corpus's static shingle
  * index (a stream-static join; the index is the q25/q26 dimension,
  * here at rest). Shingling happens map-side inside each micro-batch,
  * the join is keyed on the 32-bit shingle hash, and the per-(new,
  * existing) match count is a streaming aggregation in update mode.
  * At 100 TB the static side is the partitioned-by-hash shingle
  * index; arrivals only shuffle their own shingles. */
class StreamStaticDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-static-dedup")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("streaming arrivals flag near-copies against the static index") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext

    // static side: the corpus shingle index (cached per session)
    val idx = Text.shingleHashes(spark, sfDir)
      .select(col("doc_id").as("corpus_doc"), col("h"))

    // a known corpus text to replay as a "new arrival" near-copy
    val (srcDoc, srcText) = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).head() match {
        case r => (r.getLong(0), r.getString(1))
      }

    val input = MemoryStream[(Long, String)]
    val arrivals = input.toDS().toDF("new_id", "text")
      .select(col("new_id"),
        filter(split(lower(col("text")), "[^a-z]+"), x => x =!= "")
          .as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("new_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(toks) - 3), i -> " +
          "md5_h32(concat_ws(' ', toks[i], toks[i+1], toks[i+2])))")))
        .as("h"))
    val matches = arrivals.join(idx, "h")
      .groupBy(col("new_id"), col("corpus_doc"))
      .agg(count(lit(1)).as("shared_shingles"))
    val q = matches.writeStream.format("memory").queryName("ingest_dedup")
      .outputMode("update").start()
    try {
      input.addData(
        (9001L, srcText), // near-copy: must flag against srcDoc
        (9002L, "zzqx qqzv xxyzk wvutq plmno abcde fghij")) // novel
      q.processAllAvailable()
      val flagged = spark.table("ingest_dedup")
        .filter(col("shared_shingles") >= 3)
        .select(col("new_id"), col("corpus_doc"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(flagged.contains((9001L, srcDoc)),
        s"near-copy not flagged: ${flagged.mkString(", ")}")
      assert(!flagged.exists(_._1 == 9002L),
        "novel doc must not match the corpus at >= 3 shared shingles")
    } finally q.stop()
  }
}
