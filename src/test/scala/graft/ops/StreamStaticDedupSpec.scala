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

  test("churn: index rows stay O(live corpus) under 50% updates; " +
      "a doc superseded by canonical election leaves the live view") {
    // r10 verdict ask 5: without retention, a churn workload grows
    // the write-back index by one generation per batch — O(batches ×
    // corpus). The generation/compaction policy must bound on-disk
    // rows at live/(1 - compactStaleFraction) regardless of rounds.
    val root = java.nio.file.Files
      .createTempDirectory("graft-dedup-churn").toString
    val idxDir = s"$root/index"
    val verDir = s"$root/verdicts"
    // letter-only tokens: the shingle tokenizer splits on [^a-z]+,
    // so digits inside a token would dissolve it
    def enc(n: Int): String =
      "" + ('a' + n / 10).toChar + ('a' + n % 10).toChar
    def text(doc: Int, rev: Int): String =
      (0 until 16).map(t => s"w${enc(doc)}${enc(t)}").mkString(" ") +
        s" rev${enc(rev)}"
    def df(rows: Seq[(Long, String)]) = {
      val ss = spark; import ss.implicits._
      rows.toDF("doc_id", "text")
    }
    val run = graft.streaming.StreamOps.dedupIngestBatch(idxDir, verDir) _
    try {
      // batch 0: 20 mutually unrelated docs
      run(df((0 until 20).map(d => d.toLong -> text(d, 0))), 0L)
      // 10 churn rounds: re-ingest HALF the corpus with revised text
      // (same doc_id, shifted shingle set — the update case)
      (1 to 10).foreach { r =>
        run(df((0 until 10).map(d => d.toLong -> text(d, r))), r.toLong)
      }
      val idx = spark.read.parquet(idxDir)
      val liveRows = idx
        .join(idx.groupBy(col("doc_id"))
          .agg(max(col("gen")).as("gen")), Seq("doc_id", "gen"))
        .filter(col("n") >= 0)
      val live = liveRows.count()
      val total = idx.count()
      // all 20 docs live, latest revisions current
      assert(liveRows.select("doc_id").distinct().count() == 20L)
      // the bound: compaction keeps stale <= f·total, so
      // total <= live/(1-f); allow one uncompacted batch of slack
      assert(total <= (live / 0.7).toLong + live / 10 + 1,
        s"index not compacted: $total rows on disk for $live live " +
          "(unbounded generation growth)")
      // and specifically NOT one generation per round
      assert(total < live * 5,
        s"index grew with churn rounds: $total vs $live live")

      // canonical election: doc 5's next revision becomes a copy of
      // doc 12's standing text (+1 token) — a duplicate. Doc 5 must
      // be tombstoned out of the live view; doc 12 stays canonical.
      run(df(Seq(5L -> (text(12, 0) + " tail"))), 11L)
      val v = spark.read.parquet(verDir)
        .filter(col("batch_id") === 11L && col("doc_id") === 5L)
        .select(col("best_match"), col("is_dup")).head()
      assert(v.getLong(0) == 12L && v.getBoolean(1),
        s"doc 5's revision must dup against canonical doc 12: $v")
      val idx2 = spark.read.parquet(idxDir)
      val live2 = idx2
        .join(idx2.groupBy(col("doc_id"))
          .agg(max(col("gen")).as("gen")), Seq("doc_id", "gen"))
        .filter(col("n") >= 0)
      val liveDocs = live2.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(!liveDocs.contains(5L),
        s"superseded doc 5 must leave the live view: $liveDocs")
      assert(liveDocs.contains(12L), "canonical doc 12 must remain")

      // revival: the tombstoned doc returns with genuinely novel
      // content — its new generation outranks the tombstone and it
      // re-enters the live view as a normal standing doc
      run(df(Seq(5L ->
        (0 until 16).map(t => s"z${enc(5)}${enc(t)}").mkString(" "))), 12L)
      val idx3 = spark.read.parquet(idxDir)
      val live3 = idx3
        .join(idx3.groupBy(col("doc_id"))
          .agg(max(col("gen")).as("gen")), Seq("doc_id", "gen"))
        .filter(col("n") >= 0)
      assert(live3.filter(col("doc_id") === 5L).count() > 0,
        "revived doc 5 must re-enter the live view")
      val v12 = spark.read.parquet(verDir)
        .filter(col("batch_id") === 12L && col("doc_id") === 5L).head()
      assert(!v12.getBoolean(4), "revived content is novel, not a dup")
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }

  test("compaction publish survives a crash at every window " +
      "(recoverCompaction promotes/restores; dup detection never lost)") {
    // r11 advisor (medium): the old delete-then-rename publish had a
    // window where a crash left NO live index and the next batch read
    // PATH_NOT_FOUND as "first batch" — silently disabling dup
    // detection against the whole prior corpus. The publish is now
    // demote(live->_compact_old) + promote(_compact_tmp->live) with
    // recovery at batch start; every crash state must restore a
    // working index.
    val root = java.nio.file.Files
      .createTempDirectory("graft-dedup-crash").toString
    val idxDir = s"$root/index"
    val verDir = s"$root/verdicts"
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles.foreach(del); f.delete()
    }
    def cp(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs(); src.listFiles.foreach(c =>
          cp(c, new java.io.File(dst, c.getName)))
      } else {
        java.nio.file.Files.copy(src.toPath, dst.toPath); ()
      }
    }
    def df(rows: Seq[(Long, String)]) = {
      val ss = spark; import ss.implicits._
      rows.toDF("doc_id", "text")
    }
    val textA = "the quick brown fox jumps over the lazy sleeping dog " +
      "while rain falls quietly on the old tin roof"
    val run = graft.streaming.StreamOps.dedupIngestBatch(idxDir, verDir) _
    try {
      run(df(Seq(1L -> textA)), 0L)
      val dst = new java.io.File(idxDir)
      val tmp = new java.io.File(idxDir + "_compact_tmp")
      val oldF = new java.io.File(idxDir + "_compact_old")
      def assertDupStillDetected(batchId: Long): Unit = {
        run(df(Seq((100L + batchId) -> (textA + " tonight"))), batchId)
        val v = spark.read.parquet(verDir)
          .filter(col("batch_id") === batchId).head()
        assert(v.getBoolean(4),
          s"batch $batchId: near-copy must still dup after recovery " +
            "(index lost => dup detection silently disabled)")
      }
      // crash window 1: tmp fully written, live demoted, promote not
      // yet done (dst missing, tmp present) -> recovery promotes tmp
      dst.renameTo(tmp)
      assertDupStillDetected(1L)
      assert(!tmp.exists && dst.exists, "tmp must be promoted to live")
      // crash window 2: live demoted to _compact_old, tmp already
      // consumed or absent (dst missing, old present) -> restore old
      dst.renameTo(oldF)
      assertDupStillDetected(2L)
      assert(!oldF.exists && dst.exists, "old must be restored to live")
      // crash window 3: promote done, old not yet deleted (dst AND old
      // present) -> live is authoritative, old dropped
      cp(dst, oldF)
      assertDupStillDetected(3L)
      assert(!oldF.exists, "leftover _compact_old must be cleared")
      // crash window 4: crash mid-tmp-write BEFORE the demote (dst AND
      // a partial tmp present) -> live is authoritative, tmp dropped
      tmp.mkdirs()
      java.nio.file.Files.writeString(
        new java.io.File(tmp, "part-partial.parquet").toPath, "garbage")
      assertDupStillDetected(4L)
      assert(!tmp.exists, "leftover partial _compact_tmp must be cleared")
    } finally del(new java.io.File(root))
  }

  test("a changed doc whose new content has no shingles is tombstoned " +
      "out of the live view") {
    // r11 advisor (low): a standing doc redelivered with CHANGED but
    // shingle-less (< 3 token) content produced no replaced rows and
    // no tombstone, so its stale previous-generation shingles stayed
    // live indefinitely.
    val root = java.nio.file.Files
      .createTempDirectory("graft-dedup-empty").toString
    val idxDir = s"$root/index"
    val verDir = s"$root/verdicts"
    def df(rows: Seq[(Long, String)]) = {
      val ss = spark; import ss.implicits._
      rows.toDF("doc_id", "text")
    }
    val run = graft.streaming.StreamOps.dedupIngestBatch(idxDir, verDir) _
    try {
      run(df(Seq(
        1L -> ("the quick brown fox jumps over the lazy sleeping dog " +
          "while rain falls quietly on the old tin roof"),
        2L -> ("completely unrelated words about polar glaciers " +
          "melting under a midnight sun in silence"))), 0L)
      // doc 1's content collapses to two tokens: changed, zero shingles
      run(df(Seq(1L -> "too short")), 1L)
      val idx = spark.read.parquet(idxDir)
      val live = idx
        .join(idx.groupBy(col("doc_id"))
          .agg(max(col("gen")).as("gen")), Seq("doc_id", "gen"))
        .filter(col("n") >= 0)
      val liveDocs = live.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(!liveDocs.contains(1L),
        s"doc 1's stale shingles must leave the live view: $liveDocs")
      assert(liveDocs.contains(2L), "unrelated doc 2 must stay live")
      // and the tombstone is idempotent under redelivery of the same
      // shingle-less content: UNCHANGED now (both sides empty), no-op
      val n0 = spark.read.parquet(idxDir).count()
      run(df(Seq(1L -> "too short")), 2L)
      assert(spark.read.parquet(idxDir).count() == n0,
        "redelivered unchanged shingle-less doc must append nothing")
    } finally {
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }

  test("write-back: batch N's novel doc is batch N+1's duplicate") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext

    val root = java.nio.file.Files
      .createTempDirectory("graft-dedup-wb").toString
    val idxDir = s"$root/index"
    val verDir = s"$root/verdicts"

    val textA = "the quick brown fox jumps over the lazy sleeping dog " +
      "while rain falls quietly on the old tin roof"
    val textB = textA + " tonight" // near-copy of A
    val textC = "completely unrelated words about polar glaciers " +
      "melting under a midnight sun in silence"

    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch(graft.streaming.StreamOps.dedupIngestBatch(
        idxDir, verDir, minShared = 3L) _)
      .start()
    try {
      // batch 0: doc 1 delivered TWICE in one batch (an at-least-once
      // replay boundary inside the batch) — must shingle once, not
      // double its index rows or inflate later shared counts
      input.addData((1L, textA), (1L, textA))
      q.processAllAvailable()
      input.addData((2L, textB), (3L, textC), (1L, textA)) // B dups A;
      q.processAllAvailable() // C novel; 1 re-delivered (idempotency)
      val v = spark.read.parquet(verDir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
        .toMap
      assert(v((0L, 1L)) == (None, false), "batch 0 doc must be novel")
      assert(v((1L, 2L)) == (Some(1L), true),
        s"near-copy must dup against batch 0's accepted doc: $v")
      assert(v((1L, 3L))._2 == false, "unrelated doc must stay novel")
      // idempotency: doc 1's shingles appear exactly once in the index
      val idx = spark.read.parquet(idxDir)
      val perDoc = idx.groupBy("doc_id", "h").count()
        .filter(col("count") > 1).count()
      assert(perDoc == 0L, "re-delivered doc must not re-append shingles")
      val docs = idx.select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
      assert(docs == Set(1L, 3L),
        s"index must hold the accepted docs only, got $docs")
      // crash-replay idempotency: re-running an already-committed
      // batchId (foreachBatch's at-least-once contract) must be a
      // no-op — no duplicate verdicts, no index growth
      val nV = spark.read.parquet(verDir).count()
      val nI = idx.count()
      graft.streaming.StreamOps.dedupIngestBatch(idxDir, verDir, 3L)(
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row(2L, textB), // replayed batch 1
            org.apache.spark.sql.Row(3L, textC),
            org.apache.spark.sql.Row(1L, textA))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))), 1L)
      assert(spark.read.parquet(verDir).count() == nV,
        "replayed batch must not append verdicts again")
      assert(spark.read.parquet(idxDir).count() == nI,
        "replayed batch must not grow the index")
    } finally {
      q.stop()
      def del(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(del); f.delete()
      }
      del(new java.io.File(root))
    }
  }
}
