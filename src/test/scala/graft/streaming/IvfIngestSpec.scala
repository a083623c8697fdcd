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

  test("drift loop END TO END (r12 ask 6): flagged skew -> adaptive " +
      "retrain -> one-shot re-assign backfill -> next report recovers " +
      "under threshold -> recall audit green on the new index") {
    // Deterministic geometry (reasoning verified numerically before
    // pinning): corpus = 8 tight blobs of 50 vectors at 100·e_j,
    // ids i*8+j so the 8 LOWEST ids are one per blob (cold seeding
    // trains cleanly — occupancy flat, skew exactly 1000). Drift =
    // 3 tight blobs of 100 at 140·e_{8..10}: each pile vector is
    // EXACTLY equidistant from all 8 trained centroids, so the
    // argmin tie-break routes all 300 into the lowest cell —
    // max_cell 350/700, skew exactly 4000, flagged. Cold-seed
    // retraining can never recover (drifted mass arrives under HIGH
    // ids; id-ordered seeds never land on it) — the farthest-point
    // seeding MUST: the 3 pile blobs are the farthest mass, get
    // their own seeds, and the worst post-retrain cell is ≤ 4 merged
    // corpus blobs (200/700 → skew ≤ 2285 < 3000 whatever the
    // jitter-rounding does to tie-breaks).
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivf-cycle").toString
    val idxDir = s"$root/index"; val repDir = s"$root/reports"
    val vecsDir = s"$root/vectors"
    val ss = spark
    import ss.implicits._
    def blobVec(dim: Int, scale: Float, jit: Int): Seq[Float] = {
      val v = Array.fill(64)(0.0f)
      v(dim) = scale
      v(32) = jit * 0.001f // distinct vectors, structure untouched
      v.toSeq
    }
    val corpus = (for { i <- 0 until 50; j <- 0 until 8 }
      yield ((i * 8 + j).toLong, blobVec(j, 100.0f, i)))
      .toDF("vec_id", "embedding")
    val pile = (for { m <- 0 until 3; i <- 0 until 100 }
      yield ((100000 + m * 100 + i).toLong, blobVec(8 + m, 140.0f, i)))
      .toDF("vec_id", "embedding")
    try {
      val cents0 = graft.ops.Vectors.retrainFromEmbeddings(corpus)
      val run0 =
        StreamOps.ivfIngestBatch(idxDir, repDir, cents0, 3000L,
          Some(vecsDir)) _
      run0(corpus, 0L)
      val r0 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 0L).head()
      assert(r0.getAs[Long]("skew_milli") == 1000L &&
        !r0.getAs[Boolean]("retrain_recommended"), s"healthy start: $r0")
      // drift arrives; the occupancy report DETECTS it
      run0(pile, 1L)
      val r1 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 1L).head()
      assert(r1.getAs[Long]("skew_milli") == 4000L &&
        r1.getAs[Boolean]("retrain_recommended"), s"drift must flag: $r1")
      // the flagged ACTION, end to end: adaptive retrain on the
      // stored vectors, then the one-shot backfill
      val cents2 = graft.ops.Vectors.retrainFromEmbeddings(
        spark.read.parquet(vecsDir), 8, adaptiveSeeds = true)
      StreamOps.ivfReassignFromStore(spark, idxDir, vecsDir, cents2, 100L)
      // backfill ≡ from-scratch assignment under the new matrix
      val idx2 = spark.read.parquet(idxDir)
      val expect = graft.ops.Vectors.assignArrivals(
        spark.read.parquet(vecsDir), cents2)
      assert(idx2.count() == 700L)
      assert(idx2.select(col("vec_id"), col("j"))
        .except(expect).count() == 0L &&
        expect.except(idx2.select(col("vec_id"), col("j")))
          .count() == 0L,
        "re-assigned index must be bit-identical to assignArrivals")
      // the NEXT report row (an empty probe batch suffices — the
      // occupancy is read from the standing index) recovers
      StreamOps.ivfIngestBatch(idxDir, repDir, cents2, 3000L,
        Some(vecsDir))(corpus.limit(0), 2L)
      val r2 = spark.read.parquet(repDir)
        .filter(col("batch_id") === 2L).head()
      assert(r2.getAs[Long]("skew_milli") < 3000L &&
        !r2.getAs[Boolean]("retrain_recommended"),
        s"skew must recover after the backfill: $r2")
      // q239-style recall audit on the NEW index: nprobe=1 top-5
      // from the query's own cell == the exact top-5 (blob members
      // and their 5-NN share a cell by construction)
      val store = spark.read.parquet(vecsDir)
      val dist = aggregate(
        zip_with(col("qv"), col("v"),
          (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
      val nn = store.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      val qs = nn.filter(col("vec_id")
          .isin(0L, 7L, 100000L, 100100L, 100299L))
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("qid")).orderBy(col("d"), col("cid"))
      def top5(cand: org.apache.spark.sql.DataFrame) = cand
        .filter(col("cid") =!= col("qid"))
        .withColumn("d", dist)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("cid"))
      val exact = top5(nn.select(col("vec_id").as("cid"), col("v"))
        .crossJoin(broadcast(qs)))
      val cells = idx2.select(col("vec_id"), col("j"))
      val ivf = top5(nn.select(col("vec_id").as("cid"), col("v"))
        .join(cells.select(col("vec_id").as("cid"), col("j")), "cid")
        .join(broadcast(qs.join(cells.select(
          col("vec_id").as("qid"), col("j")), "qid")), Seq("j")))
      assert(exact.except(ivf).count() == 0L &&
        ivf.except(exact).count() == 0L,
        "recall@5 at nprobe=1 must be exact on the re-assigned index")
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
