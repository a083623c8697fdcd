package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** IVF index maintenance on ingest (r11 verdict ask 3): the trained
  * cell index must ADVANCE with arriving vectors — map-side centroid
  * argmin per batch, idempotent on batchId and on vec_id re-delivery —
  * and a cell-occupancy drift probe must flag when arrivals no longer
  * fit the trained centroids. The key invariant: streaming
  * assign-on-ingest reproduces the BATCH Lloyd assignment
  * bit-for-bit, so every recall audit that holds for the batch index
  * (VectorsIvfRecallSpec / q239) transfers to the standing index
  * unchanged. */
class IvfIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ivf-ingest")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("N batches ingest; index matches the batch-trained assignment; " +
      "re-delivery idempotent; occupancy drift flags a retrain") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-ingest").toString
    val idxDir = s"$root/index"
    val repDir = s"$root/reports"
    val cents = graft.ops.Vectors.trainedCentroids(spark, sfDir)
    assert(cents.size == 8)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val run = StreamOps.ivfIngestBatch(idxDir, repDir, cents) _
    try {
      // the corpus arrives as 3 micro-batches (vec_id mod 3)
      (0 until 3).foreach { b =>
        run(emb.filter(col("vec_id") % 3 === b), b.toLong)
        // the index is queryable after EVERY batch: cells readable,
        // one row per ingested vector
        val idx = spark.read.parquet(idxDir)
        assert(idx.groupBy("vec_id").count()
          .filter(col("count") > 1).count() == 0L)
      }
      val idx = spark.read.parquet(idxDir)
      assert(idx.count() == n, "every vector ingested exactly once")
      // THE invariant: ingest assignment == the batch Lloyd
      // assignment (same centroids, same argmin), so q239's recall
      // audit transfers to this standing index verbatim
      val batchAssign = graft.ops.Vectors
        .trainedAssignments(spark, sfDir)
      assert(idx.select(col("vec_id"), col("j"))
        .except(batchAssign.select(col("vec_id"), col("j"))).count() == 0L)
      assert(batchAssign.select(col("vec_id"), col("j"))
        .except(idx.select(col("vec_id"), col("j"))).count() == 0L)

      // crash replay of a COMMITTED batch: no-op (commit marker)
      val nIdx = idx.count(); val nRep = spark.read.parquet(repDir).count()
      run(emb.filter(col("vec_id") % 3 === 0), 0L)
      assert(spark.read.parquet(idxDir).count() == nIdx)
      assert(spark.read.parquet(repDir).count() == nRep)

      // cross-batch re-delivery under a NEW batchId: vec_id anti-join
      // appends nothing, but the batch still commits a report row
      run(emb.filter(col("vec_id") % 3 === 0), 3L)
      assert(spark.read.parquet(idxDir).count() == nIdx,
        "re-delivered vectors must not re-append")
      val r3 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 3L).head()
      assert(r3.getLong(1) == 0L, s"n_arrived must be 0: $r3")

      // occupancy before drift: whatever skew the trained corpus has
      val s0 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 3L)
        .select(col("skew_milli")).head().getLong(0)
      // drift: a pile of near-identical arrivals lands in ONE cell
      val one = emb.orderBy(col("vec_id")).limit(1)
        .select(col("embedding")).head().getSeq[Float](0)
      val ss = spark
      import ss.implicits._
      val drift = (0 until 600)
        .map(i => (100000L + i, one)).toDF("vec_id", "embedding")
      StreamOps.ivfIngestBatch(idxDir, repDir, cents,
        retrainSkewMilli = s0 + 100)(drift, 4L)
      val r4 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 4L).head()
      val skew4 = r4.getLong(4)
      assert(skew4 > s0, s"drift must raise occupancy skew: $s0 -> $skew4")
      assert(r4.getBoolean(5),
        s"retrain must be recommended at skew $skew4 (threshold ${s0 + 100})")
      // and the index is STILL queryable with the drifted cells in it
      assert(spark.read.parquet(idxDir).count() == nIdx + 600)
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }

  test("an EMPTY first batch commits a readable zero report, not nulls") {
    // a stream can fire batch 0 before any data exists: the report
    // must carry skew_milli = 0 / retrain = false, not nulls that
    // break report readers (r12 review finding)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-empty").toString
    val cents = graft.ops.Vectors.trainedCentroids(spark, sfDir)
    try {
      val ss = spark; import ss.implicits._
      val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
      StreamOps.ivfIngestBatch(s"$root/index", s"$root/reports", cents)(
        empty, 0L)
      val r = spark.read.parquet(s"$root/reports").head()
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L &&
        r.getLong(4) == 0L && !r.getBoolean(5),
        s"empty batch must report zeros: $r")
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }

  test("retrain-from-store closes the drift loop: flagged skew -> " +
      "retrainFromEmbeddings -> centroids adapt to the drifted mass") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-retrain").toString
    val idxDir = s"$root/index"; val repDir = s"$root/reports"
    val vecsDir = s"$root/vectors"
    val cents = graft.ops.Vectors.trainedCentroids(spark, sfDir)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val run = StreamOps.ivfIngestBatch(idxDir, repDir, cents,
      3000L, Some(vecsDir)) _
    try {
      run(emb, 0L)
      // with the store holding exactly the corpus, retraining MUST
      // reproduce the batch training bit-for-bit (same seeds 0..7,
      // same exact-integer Lloyd kernel)
      val again = graft.ops.Vectors
        .retrainFromEmbeddings(spark.read.parquet(vecsDir))
      assert(again == cents,
        "retrain on the original corpus must reproduce the batch matrix")
      // drift pile: 600 copies of one vector under new ids
      val one = emb.orderBy(col("vec_id")).limit(1)
        .select(col("embedding")).head().getSeq[Float](0)
      val ss = spark; import ss.implicits._
      val pile = (0 until 600).map(i => (100000L + i, one))
        .toDF("vec_id", "embedding")
      StreamOps.ivfIngestBatch(idxDir, repDir, cents, 2000L,
        Some(vecsDir))(pile, 1L)
      val r1 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 1L).head()
      assert(r1.getBoolean(5), s"drift must flag a retrain: $r1")
      // the flagged action: retrain on the stored vectors
      // the store now holds corpus + pile, each id exactly once
      val store = spark.read.parquet(vecsDir)
      assert(store.count() == 1100L &&
        store.select("vec_id").distinct().count() == 1100L)
      val cents2 = graft.ops.Vectors
        .retrainFromEmbeddings(spark.read.parquet(vecsDir))
      assert(cents2 != cents, "retrained matrix must move")
      // and it ADAPTED: the pile's nearest new centroid is strictly
      // closer to the pile than its nearest old centroid was (the
      // recompute pulled a cell onto the drifted mass)
      val q = one.map(x => math.floor(x.toDouble * 1000).toLong + 1000L)
      def bestD(m: Seq[(Long, Seq[Long])]): Long = m.map { case (_, c) =>
        q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      }.min
      assert(bestD(cents2) < bestD(cents),
        s"retrained centroids must approach the drifted mass: " +
          s"${bestD(cents2)} vs ${bestD(cents)}")
      // store idempotency: re-delivering the pile under a new batch
      // appends nothing to the vector store either
      val nV = spark.read.parquet(vecsDir).count()
      StreamOps.ivfIngestBatch(idxDir, repDir, cents, 2000L,
        Some(vecsDir))(pile, 2L)
      assert(spark.read.parquet(vecsDir).count() == nV)
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }

  test("the ingest loop runs as a real writeStream foreachBatch sink") {
    // same maintenance loop, driven by Structured Streaming itself —
    // the shape a production ingest deploys
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-stream").toString
    val idxDir = s"$root/index"
    val repDir = s"$root/reports"
    val cents = graft.ops.Vectors.trainedCentroids(spark, sfDir)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])]
    val q = input.toDS().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch(StreamOps.ivfIngestBatch(idxDir, repDir, cents) _)
      .start()
    try {
      val (b0, b1) = emb.partition(_._1 % 2 == 0)
      input.addData(b0.toSeq)
      q.processAllAvailable()
      input.addData(b1.toSeq)
      q.processAllAvailable()
      val idx = spark.read.parquet(idxDir)
      assert(idx.count() == emb.length.toLong)
      assert(spark.read.parquet(repDir).count() == 2L)
      // assignments still match the batch training
      val batchAssign = graft.ops.Vectors.trainedAssignments(spark, sfDir)
      assert(idx.select(col("vec_id"), col("j"))
        .except(batchAssign.select(col("vec_id"), col("j")))
        .count() == 0L)
    } finally {
      q.stop()
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }
}
