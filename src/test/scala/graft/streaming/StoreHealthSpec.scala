package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The cross-store health pane: live/stale accounting must mirror
  * each store's OWN liveness rule (dedup max-gen tombstones, DF
  * sidecar positive totals), and the compaction recommendation must
  * fire exactly when the owner's policy would. */
class StoreHealthSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-store-health")
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

  private val tX = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val tY = "lambda mu nu xi omicron pi rho sigma tau upsilon"
  private val tZ = "one two three four five six seven eight nine ten"

  test("live/stale per store follow the owners' rules; erased DF mass " +
      "counts as reclaimable; missing stores render as empty") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-health").toString
    val idx = s"$root/dedup"; val dverd = s"$root/dverd"
    val tg = s"$root/tg"; val tgRep = s"$root/tgrep"
    val dfS = s"$root/df"; val dfRep = s"$root/dfrep"
    val fRep = s"$root/frep"

    // dedup index: doc 1 churns (gen-0 rows go stale), doc 2 stays.
    // compaction is disabled (fraction 1.0) so the stale mass SURVIVES
    // into the report instead of being rewritten away by the ingest.
    val dedup = StreamOps.dedupIngestBatch(idx, dverd,
      compactStaleFraction = 1.0) _
    dedup(docs(1L -> tX, 2L -> tY), 0L)
    dedup(docs(1L -> tZ), 1L)

    // gram store + sidecar: doc 3 ingested then fully erased — its
    // grams become zero-total (reclaimable) sidecar mass
    StreamOps.trainGramIngestBatch(tg, tgRep)(docs(3L -> tZ), 0L)
    StreamOps.trainGramDfIngestBatch(dfS, dfRep)(docs(3L -> tZ), 0L)
    StreamOps.forgetBatch(fRep, trainGramsDir = Some(tg),
      dfDir = Some(dfS))(docs(3L -> tZ), 0L)

    val rep = StreamOps.storeHealthReport(spark,
        dedupIndexDir = Some(idx), trainGramsDir = Some(tg),
        dfDir = Some(dfS), labelsDir = Some(s"$root/absent"),
        compactStaleFraction = 0.2)
      .collect().map(r => r.getAs[String]("store") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_live"),
          r.getAs[Long]("n_stale"), r.getAs[Long]("stale_milli"),
          r.getAs[Boolean]("compact_recommended")))
      .toMap

    // dedup: tX has 8 shingles (stale after churn), tZ 8 + tY 8 live
    val (dr, dl, ds, dm, dc) = rep("dedup_index")
    assert(dr == 24L && dl == 16L && ds == 8L, s"dedup: $rep")
    assert(dm == 333L && dc, "a third stale must trip the 0.2 gate")
    // DF sidecar: tZ's 3 grams all erased — zero live, all reclaimable
    val (gr, gl, gs, gm, gc) = rep("df_sidecar")
    assert(gr == 3L && gl == 0L && gs == 3L && gm == 1000L && gc,
      s"df_sidecar: $rep")
    // gram index was rewritten minus the zeroed grams: live == rows
    val (tr2, tl2, ts2, _, _) = rep("train_grams")
    assert(tr2 == 0L && tl2 == 0L && ts2 == 0L, s"train_grams: $rep")
    // absent store renders, empty, unflagged
    assert(rep("labels") == ((0L, 0L, 0L, 0L, false)))
  }
}
