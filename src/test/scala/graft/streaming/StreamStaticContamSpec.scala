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

  test("train-gram ingest advances the index: batch N's train doc is " +
      "batch N+1's contamination verdict; replays append nothing") {
    val ss = spark
    import ss.implicits._
    val trainDir = tmpDir("ingest-train")
    val reportDir = tmpDir("ingest-report")
    val verdictsDir = tmpDir("ingest-verdicts")
    val runTrain = StreamOps.trainGramIngestBatch(trainDir, reportDir) _
    val probe = StreamOps.contaminationProbeBatch(trainDir, verdictsDir) _
    // ten distinct 10-token docs (letter-only tokens so the
    // tokenizer keeps them whole) — docs 0-4 arrive in train batch 0
    def txt(k: Int): String =
      (0 until 10).map(i => s"w${('a' + k).toChar}${('a' + i).toChar}"
        .replace("w", "zq")).mkString(" ")
    val docs = (0 until 10).map(k => (k.toLong, txt(k)))
    runTrain(docs.take(5).toDF("doc_id", "text"), 0L)
    val r0 = spark.read.parquet(reportDir)
      .filter(col("batch_id") === 0L).head()
    // 10 tokens -> 3 distinct 8-grams per doc, disjoint across docs
    assert(r0.getAs[Long]("n_docs") == 5L &&
      r0.getAs[Long]("n_new_grams") == 15L, s"batch 0 report: $r0")
    // an eval arrival copying doc 7 (NOT yet in train) probes clean...
    probe(Seq((9007L, txt(7))).toDF("doc_id", "text"), 0L)
    val v0 = spark.read.parquet(verdictsDir)
      .filter(col("doc_id") === 9007L).head()
    assert(!v0.getAs[Boolean]("is_contaminated"),
      s"doc 7 not in train yet: $v0")
    // ...train batch 1 admits docs 5-9; the SAME eval text now flags
    runTrain(docs.drop(5).toDF("doc_id", "text"), 1L)
    probe(Seq((9107L, txt(7))).toDF("doc_id", "text"), 1L)
    val v1 = spark.read.parquet(verdictsDir)
      .filter(col("doc_id") === 9107L).head()
    assert(v1.getAs[Boolean]("is_contaminated") &&
      v1.getAs[Long]("n_hit") == 3L,
      s"doc 7 entered train in batch 1: $v1")
    // exact replay of a committed batchId: nothing appended anywhere
    val (nG, nR) = (spark.read.parquet(trainDir).count(),
      spark.read.parquet(reportDir).count())
    runTrain(docs.take(5).toDF("doc_id", "text"), 0L)
    assert(spark.read.parquet(trainDir).count() == nG &&
      spark.read.parquet(reportDir).count() == nR)
    // cross-batch redelivery under a NEW batchId: the gram anti-join
    // appends zero rows, the report still commits (n_new_grams = 0)
    runTrain(docs.take(5).toDF("doc_id", "text"), 2L)
    assert(spark.read.parquet(trainDir).count() == nG,
      "redelivered docs must not re-append grams")
    val r2 = spark.read.parquet(reportDir)
      .filter(col("batch_id") === 2L).head()
    assert(r2.getAs[Long]("n_new_grams") == 0L)
    // the index's gen column audits arrival batches
    val gens = spark.read.parquet(trainDir).groupBy(col("gen"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gens == Map(0L -> 15L, 1L -> 15L), s"gen audit: $gens")
  }

  test("train-gram ingest crash window: grams appended but report " +
      "missing -> replay heals to the exact committed state") {
    val ss = spark
    import ss.implicits._
    val trainDir = tmpDir("crash-train")
    val reportDir = tmpDir("crash-report")
    val runTrain = StreamOps.trainGramIngestBatch(trainDir, reportDir) _
    def txt(k: Int): String =
      (0 until 10).map(i => s"zr${('a' + k).toChar}${('a' + i).toChar}")
        .mkString(" ")
    runTrain(Seq((0L, txt(0))).toDF("doc_id", "text"), 0L)
    // simulate the crash: batch 1's gram append landed (PARTIALLY —
    // only 1 of doc 1's 3 grams made it) but the report write didn't
    graft.ops.Text.gram8Of(Seq((1L, txt(1))).toDF("doc_id", "text"))
      .select(col("g")).limit(1).withColumn("gen", lit(1L))
      .write.mode("append").parquet(trainDir)
    assert(spark.read.parquet(reportDir)
      .filter(col("batch_id") === 1L).isEmpty, "no report yet")
    // the replay: batchCommitted=false so it re-runs; the anti-join
    // appends only the 2 missing grams; the report's n_new_grams is
    // counted from the index's OWN gen rows, so it reads 3 — the
    // durable truth — not the replay's 2
    runTrain(Seq((1L, txt(1))).toDF("doc_id", "text"), 1L)
    val gens = spark.read.parquet(trainDir).groupBy(col("gen"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gens == Map(0L -> 3L, 1L -> 3L), s"healed gen audit: $gens")
    val r1 = spark.read.parquet(reportDir)
      .filter(col("batch_id") === 1L).head()
    assert(r1.getAs[Long]("n_new_grams") == 3L,
      s"report must count durable gen-1 rows, not the delta: $r1")
    // and the healed state is a fixed point: a second replay of the
    // now-committed batch changes nothing
    val (nG, nR) = (spark.read.parquet(trainDir).count(),
      spark.read.parquet(reportDir).count())
    runTrain(Seq((1L, txt(1))).toDF("doc_id", "text"), 1L)
    assert(spark.read.parquet(trainDir).count() == nG &&
      spark.read.parquet(reportDir).count() == nR)
  }

  test("gram-index compaction bounds file count, preserves every " +
      "(g, gen) row, and a torn publish heals at the next probe") {
    val ss = spark
    import ss.implicits._
    val trainDir = tmpDir("compact-train")
    val reportDir = tmpDir("compact-report")
    // threshold 1: compact after every append once > 1 parquet file
    val run = StreamOps.trainGramIngestBatch(trainDir, reportDir,
      compactFileThreshold = 1) _
    def txt(k: Int): String =
      (0 until 10).map(i => s"zs${('a' + k).toChar}${('a' + i).toChar}")
        .mkString(" ")
    (0 until 3).foreach { b =>
      run(Seq((b.toLong, txt(b))).toDF("doc_id", "text"), b.toLong)
    }
    val files = new java.io.File(trainDir).listFiles
      .count(_.getName.endsWith(".parquet"))
    assert(files <= 8, // the rewrite's fixed bucket width
      s"compaction must bound the index's file count, got $files")
    val gens = spark.read.parquet(trainDir).groupBy(col("gen"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gens == Map(0L -> 3L, 1L -> 3L, 2L -> 3L),
      s"every (g, gen) row must survive the rewrite: $gens")
    // the worst crash window: live demoted, complete tmp on disk
    val live = new java.io.File(trainDir)
    val tmp = new java.io.File(trainDir + "_compact_tmp")
    assert(live.renameTo(tmp), "simulate crash between demote and publish")
    // the read side heals it (promote tmp -> live) and probes the
    // FULL index — no window where the standing grams vanish
    val vDir = tmpDir("compact-verdicts")
    StreamOps.contaminationProbeBatch(trainDir, vDir)(
      Seq((900L, txt(1))).toDF("doc_id", "text"), 0L)
    val v = spark.read.parquet(vDir).head()
    assert(v.getAs[Boolean]("is_contaminated") &&
      v.getAs[Long]("n_hit") == 3L, s"healed probe verdict: $v")
    assert(live.exists && !tmp.exists,
      "probe start must promote the complete tmp to live")
  }

  test("trainGramIngestBatch over the corpus reproduces q267's " +
      "first-seen growth census exactly (operator == batch twin)") {
    val trainDir = tmpDir("census-train")
    val reportDir = tmpDir("census-report")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val run = StreamOps.trainGramIngestBatch(trainDir, reportDir) _
    (0 until 4).foreach { b =>
      run(docs.filter(pmod(col("doc_id"), lit(4L)) === b), b.toLong)
    }
    val fromOp = spark.read.parquet(trainDir).groupBy(col("gen"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromCensus = graft.SparkEntry
      .queries("q267_train_gram_growth_census")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_new_grams")).toMap
    assert(fromOp == fromCensus,
      s"operator gen counts $fromOp != census $fromCensus")
  }

  test("q268 debt census == the two streaming halves composed: " +
      "ingest train batches, probe eval after each, diff the flags") {
    val trainDir = tmpDir("debt-train")
    val reportDir = tmpDir("debt-report")
    // the census's doc universe: corpus + the q268 seed fixture
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .unionAll(graft.ops.Analytics.debtFixDocs(spark))
    val isEval = pmod(graft.cdc.GraftFunctions.md5_h32(
      col("doc_id").cast("string")), lit(20L)) === 0L
    val train = docs.filter(!isEval)
    val evalDocs = docs.filter(isEval)
    val runTrain = StreamOps.trainGramIngestBatch(trainDir, reportDir) _
    // after each train ingest, probe the SAME eval set; a doc's debt
    // batch is the first probe that flags it (the index only grows,
    // so flags never retract across probes)
    val flaggedAt = scala.collection.mutable.Map[Long, Long]()
    (0 until 4).foreach { b =>
      runTrain(train.filter(pmod(col("doc_id"), lit(4L)) === b), b.toLong)
      val vDir = tmpDir(s"debt-verdicts-$b")
      StreamOps.contaminationProbeBatch(trainDir, vDir)(evalDocs, b.toLong)
      spark.read.parquet(vDir).filter(col("is_contaminated"))
        .select(col("doc_id")).collect().map(_.getLong(0))
        .foreach(d => if (!flaggedAt.contains(d)) flaggedAt(d) = b.toLong)
    }
    val fromOps = flaggedAt.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val census = graft.SparkEntry
      .queries("q268_contamination_debt_census")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_new_contam"))
      .filter(_._2 > 0).toMap
    assert(fromOps == census,
      s"streaming first-flag counts $fromOps != census $census")
    // the seed guarantees at least one crossing per batch
    assert((0L until 4L).forall(fromOps.contains), s"seeded: $fromOps")
  }

  test("q273 census == DF-sidecar ingest + refined probe composed " +
      "(batch-summed DF equals global DF when docs split by batch)") {
    val dfDir = tmpDir("df-sidecar")
    val reportDir = tmpDir("df-report")
    val vDir = tmpDir("df-verdicts")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .unionAll(graft.ops.Analytics.boilFixDocs(spark))
    val isEval = pmod(graft.cdc.GraftFunctions.md5_h32(
      col("doc_id").cast("string")), lit(20L)) === 0L
    val runDf = StreamOps.trainGramDfIngestBatch(dfDir, reportDir) _
    (0 until 4).foreach { b =>
      runDf(docs.filter(!isEval)
        .filter(pmod(col("doc_id"), lit(4L)) === b), b.toLong)
    }
    StreamOps.contaminationProbeRefinedBatch(dfDir, vDir)(
      docs.filter(isEval), 0L)
    // gram-less arrivals get (false, false) verdicts but are outside
    // the census's per-gram rollup — compare over docs WITH grams
    val fromOps = spark.read.parquet(vDir)
      .filter(col("n_grams") > 0)
      .groupBy(col("raw_flag"), col("refined_flag"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2))
      .toMap
    val census = graft.SparkEntry
      .queries("q273_boilerplate_aware_decontamination")(spark, sfDir)
      .collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        r.getAs[Long]("n_docs")).toMap
    assert(fromOps == census,
      s"streaming census $fromOps != batch census $census")
    assert(fromOps.contains((true, false)),
      "the seeded boilerplate false-positive cell must be live")
  }

  test("DF-sidecar crash window: df rows landed but report missing " +
      "-> replay appends NOTHING and reports the durable gen rows") {
    val ss = spark
    import ss.implicits._
    val dfDir = tmpDir("dfcrash-sidecar")
    val reportDir = tmpDir("dfcrash-report")
    val runDf = StreamOps.trainGramDfIngestBatch(dfDir, reportDir) _
    def txt(k: Int): String =
      (0 until 10).map(i => s"zu${('a' + k).toChar}${('a' + i).toChar}")
        .mkString(" ")
    runDf(Seq((0L, txt(0))).toDF("doc_id", "text"), 0L)
    // simulate the crash: batch 1's df rows fully landed, no report
    graft.ops.Text.gram8Of(Seq((1L, txt(1))).toDF("doc_id", "text"))
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .withColumn("gen", lit(1L))
      .write.mode("append").parquet(dfDir)
    // the replay must NOT double the gen-1 dfs (sum(df) is the
    // refined probe's denominator semantics — doubling flips grams
    // toward 'boilerplate' and silently weakens the verdict)
    runDf(Seq((1L, txt(1))).toDF("doc_id", "text"), 1L)
    val g1 = spark.read.parquet(dfDir).filter(col("gen") === 1L)
    assert(g1.count() == 3L && g1.agg(max(col("df"))).head().getLong(0) == 1L,
      s"gen-1 rows must stay exactly the durable set")
    val r1 = spark.read.parquet(reportDir)
      .filter(col("batch_id") === 1L).head()
    assert(r1.getAs[Long]("n_gram_types") == 3L, s"report: $r1")
    // and a fully-committed replay is a no-op end to end
    val (nS, nR) = (spark.read.parquet(dfDir).count(),
      spark.read.parquet(reportDir).count())
    runDf(Seq((1L, txt(1))).toDF("doc_id", "text"), 1L)
    assert(spark.read.parquet(dfDir).count() == nS &&
      spark.read.parquet(reportDir).count() == nR)
  }

  test("q274 sweep is monotone in the cap: flagged docs and " +
      "informative hits never decrease as the cap loosens") {
    val rows = graft.SparkEntry.queries("q274_df_cap_sweep")(spark, sfDir)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 3)
    val flagged = rows.map(_.getAs[Long]("n_flagged"))
    val hits = rows.map(_.getAs[Long]("n_informative_hits"))
    assert(flagged.sliding(2).forall(p => p(0) <= p(1)), flagged.toSeq)
    assert(hits.sliding(2).forall(p => p(0) <= p(1)), hits.toSeq)
    // the seeded boilerplate makes the last step strict
    assert(flagged(2) > flagged(1),
      s"cap 100 must re-admit the planted boilerplate: ${flagged.toSeq}")
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
