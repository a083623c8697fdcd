package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Label inheritance at ingest (q278's live half): trusted labels
  * write through, unlabeled arrivals inherit from their best labeled
  * near-dup via one keyed probe of the standing shingle index, and —
  * the property that makes it the streaming form of q278's rounds —
  * labels propagate TRANSITIVELY across batches: batch N inherits
  * from what batch N-1 inherited. */
class LabelIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-label-ingest")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // token chain t1..t20: A=[1,12], B=[3,14], C=[9,20] on 3-gram
  // shingles gives |A∩B| = 8, |B∩C| = 4 (both >= 3) but |A∩C| = 2
  // (< 3) — C can ONLY inherit through B's inherited label
  private def run(lo: Int, hi: Int): String =
    (lo to hi).map(i => "tok" + ('a' + i - 1).toChar).mkString(" ")
  private val tA = run(1, 12)
  private val tB = run(3, 14)
  private val tC = run(9, 20)
  private val tD = "zzua zzub zzuc zzud zzue zzuf"

  private def labeled(rows: (Long, String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "label")
  }
  private def unlabeled(rows: (Long, String)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
      .withColumn("label", lit(null).cast("long"))
  }

  test("trusted labels write through; unlabeled docs inherit from the " +
      "standing index; inheritance chains across batches") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-label-ingest").toString
    val idx = s"$root/index"; val dverd = s"$root/dverd"
    val labels = s"$root/labels"
    // strict dedup threshold (999): near-dup arrivals still enter the
    // index and can anchor later inheritance
    val dedup = StreamOps.dedupIngestBatch(idx, dverd, minShared = 999L) _
    val label = StreamOps.labelOnIngestBatch(idx, labels, minShared = 3L) _

    // batch 0: one trusted doc + one unrelated unlabeled doc
    val b0 = labeled((1L, tA, 7L)).unionByName(unlabeled(4L -> tD))
    dedup(b0.select(col("doc_id"), col("text")), 0L); label(b0, 0L)
    val v0 = spark.read.parquet(labels)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("src"), Option(r.getAs[java.lang.Long]("label"))))
      .toMap
    assert(v0(1L) == (("trusted", Some(7L))))
    assert(v0(4L) == (("none", None)))

    // batch 1: B inherits from trusted A
    val b1 = unlabeled(2L -> tB)
    dedup(b1.select(col("doc_id"), col("text")), 1L); label(b1, 1L)
    val v1 = spark.read.parquet(labels)
      .filter(col("doc_id") === 2L).head
    assert(v1.getAs[String]("src") == "inherited" &&
      v1.getAs[Long]("label") == 7L &&
      v1.getAs[Long]("match_doc") == 1L &&
      v1.getAs[Long]("shared") == 8L)

    // batch 2: C shares only 2 shingles with A but 4 with B — it can
    // only inherit THROUGH B's inherited label (the 2-hop chain)
    val b2 = unlabeled(3L -> tC)
    dedup(b2.select(col("doc_id"), col("text")), 2L); label(b2, 2L)
    val v2 = spark.read.parquet(labels)
      .filter(col("doc_id") === 3L).head
    assert(v2.getAs[String]("src") == "inherited" &&
      v2.getAs[Long]("label") == 7L &&
      v2.getAs[Long]("match_doc") == 2L,
      s"expected transitive inheritance through doc 2, got $v2")

    // committed replay: no duplicate verdicts
    val n = spark.read.parquet(labels).count()
    label(b2, 2L)
    assert(spark.read.parquet(labels).count() == n)
    // cross-batch redelivery of an already-verdicted doc: skipped
    label(unlabeled(3L -> tC), 3L)
    assert(spark.read.parquet(labels)
      .filter(col("doc_id") === 3L).count() == 1L)
  }

  test("erasing a doc removes its anchoring power but not the labels " +
      "others learned from it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-label-forget").toString
    val idx = s"$root/index"; val dverd = s"$root/dverd"
    val labels = s"$root/labels"; val fRep = s"$root/frep"
    val dedup = StreamOps.dedupIngestBatch(idx, dverd, minShared = 999L) _
    val label = StreamOps.labelOnIngestBatch(idx, labels, minShared = 3L) _
    dedup(labeled((1L, tA, 7L)).select(col("doc_id"), col("text")), 0L)
    label(labeled((1L, tA, 7L)), 0L)
    dedup(unlabeled(2L -> tB).select(col("doc_id"), col("text")), 1L)
    label(unlabeled(2L -> tB), 1L)
    dedup(unlabeled(3L -> tC).select(col("doc_id"), col("text")), 2L)
    label(unlabeled(3L -> tC), 2L)

    // forget A and B: dedup shingles tombstone, label rows ERASE IN
    // PLACE — the rows stay (they are the ingest stream's commit
    // markers and redelivery guards) but stop anchoring
    StreamOps.forgetBatch(fRep, dedupIndexDir = Some(idx),
      labelsDir = Some(labels))(
      unlabeled(1L -> tA, 2L -> tB).select(col("doc_id"), col("text")), 0L)
    assert(spark.read.parquet(fRep).head
      .getAs[Long]("n_labels_removed") == 2L)
    val left = spark.read.parquet(labels)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("src"), Option(r.getAs[java.lang.Long]("label")))))
      .toMap
    assert(left.keySet == Set(1L, 2L, 3L), s"labels left: $left")
    assert(left(1L) == (("erased", None)) && left(2L) == (("erased", None)),
      s"forgotten docs must be erased in place: $left")
    assert(left(3L) == (("inherited", Some(7L))),
      "a label learned while the source was present must survive")
    // the erased rows still guard redelivery: doc 1 re-delivered
    // under a NEW batchId must NOT be re-labeled
    label(unlabeled(1L -> tA), 9L)
    assert(spark.read.parquet(labels)
      .filter(col("doc_id") === 1L).count() == 1L,
      "an erased doc's redelivery must not re-create its label")

    // the forgotten docs must no longer anchor: a fresh near-copy of
    // tA matches nothing live (C shares only 2 shingles with it)
    dedup(unlabeled(10L -> tA).select(col("doc_id"), col("text")), 3L)
    label(unlabeled(10L -> tA), 3L)
    val v = spark.read.parquet(labels)
      .filter(col("doc_id") === 10L).head
    assert(v.getAs[String]("src") == "none",
      s"forgotten docs must stop anchoring inheritance, got $v")
  }
}
