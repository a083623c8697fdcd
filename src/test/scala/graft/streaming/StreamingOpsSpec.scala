package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc._

/** The remaining Part-C streaming operators: stream-stream join within
  * a watermark, dropDuplicatesWithinWatermark, session_window batch ≡
  * gaps-and-islands, dead-letter decode, typed refinement, TOAST
  * recovery, and SQL-registered LSN functions with codegen. */
class StreamingOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var logDir: String = _

  private val rel = RelationInfo(801, "public", "items", "default",
    Seq(ColumnInfo("id", 1, 20, -1, null, null),
      ColumnInfo("v", 0, 25, -1, null, null)))

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-ops-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    logDir = java.nio.file.Files.createTempDirectory("opslog").toString
    val txs = (1 to 30).map { i =>
      val lsn = i * 10L
      val dml =
        if (i % 3 == 0) PgoutputWriter.delete(801, 'K', Seq((i % 10).toString, null))
        else PgoutputWriter.insert(801, Seq((i % 10).toString, s"v$i"))
      (lsn, Seq(PgoutputWriter.begin(lsn, 0L, i.toLong),
        PgoutputWriter.relation(rel), dml,
        PgoutputWriter.commit(lsn, lsn + 1, 0L)))
    }
    CdcReplaySource.writeLog(logDir, txs)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def changesStream() = {
    val raw = spark.readStream.format(CdcReplaySource.FORMAT)
      .option("path", logDir).load()
    StreamOps.decodedChanges(raw)
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("lsn") / 10))
  }

  test("stream-stream join: deletes matched to their prior insert within watermark") {
    val ins = changesStream().filter(col("op") === "insert")
      .select(col("tuple")("id").as("ikey"), col("lsn").as("ilsn"),
        col("ts").as("its"))
      .withWatermark("its", "60 seconds")
    val del = changesStream().filter(col("op") === "delete")
      .select(col("tuple")("id").as("dkey"), col("lsn").as("dlsn"),
        col("ts").as("dts"))
      .withWatermark("dts", "60 seconds")

    val joined = del.join(ins,
      col("dkey") === col("ikey") && col("ilsn") < col("dlsn") &&
        col("its") >= col("dts") - expr("INTERVAL 60 SECONDS"),
      "inner")

    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckss").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.sql("SELECT count(*) FROM ssjoin").head().getLong(0)
    assert(n > 0, "expected delete-insert correlations")
    // every joined row pairs a delete with an earlier insert on same key
    assert(spark.sql(
      "SELECT count(*) FROM ssjoin WHERE ilsn >= dlsn OR ikey <> dkey")
      .head().getLong(0) == 0L)
  }

  test("dropDuplicatesWithinWatermark collapses at-least-once redelivery") {
    // simulate redelivery by unioning the stream with itself
    val once = changesStream()
    val redelivered = once.union(changesStream())
      .withWatermark("ts", "60 seconds")
      .dropDuplicatesWithinWatermark("lsn")
    val q = redelivered.writeStream.format("memory").queryName("dedup")
      .outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ckdd").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.sql("SELECT count(*) FROM dedup").head().getLong(0) == 30L)
    assert(spark.sql("SELECT count(DISTINCT lsn) FROM dedup")
      .head().getLong(0) == 30L)
  }

  test("session_window batch aggregation matches gaps-and-islands") {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id"), col("event_id"),
        timestamp_seconds(col("ts_sec")).as("t"), col("ts_sec"))

    val viaSessionWindow = ev
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))

    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"), col("event_id"))
    val viaIslands = ev
      .withColumn("new_s",
        when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) >= 1800 ||
          lag(col("ts_sec"), 1).over(w).isNull, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_s")).as("n_sessions"), count(lit(1)).as("n_events"))

    val a = viaSessionWindow.orderBy("user_id").collect().map(_.toSeq)
    val b = viaIslands.orderBy("user_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("dead-letter decode isolates a corrupt transaction") {
    val badDir = java.nio.file.Files.createTempDirectory("badops").toString
    CdcReplaySource.writeLog(badDir, Seq(
      10L -> Seq(PgoutputWriter.relation(rel),
        PgoutputWriter.insert(801, Seq("1", "ok"))),
      20L -> Seq(Array[Byte]('Z', 1, 2)), // unknown tag — decode throws
      30L -> Seq(PgoutputWriter.relation(rel),
        PgoutputWriter.insert(801, Seq("2", "ok2")))))
    val out = StreamOps.decodedChangesWithErrors(
      spark.read.format(CdcReplaySource.FORMAT).option("path", badDir).load())
    val rows = out.orderBy("lsn").collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[String]("op") == "insert" &&
      rows(0).getAs[String]("error") == null)
    assert(rows(1).getAs[String]("op") == null &&
      rows(1).getAs[String]("error").contains("unknown pgoutput message"))
    assert(rows(2).getAs[String]("op") == "insert")
  }

  test("typed refinement casts the text-map transport per relation") {
    val sp = spark; import sp.implicits._
    val typedRel = RelationInfo(900, "public", "t", "default", Seq(
      ColumnInfo("id", 1, 20, -1, null, null),      // int8
      ColumnInfo("n", 0, 23, -1, null, null),       // int4
      ColumnInfo("ok", 0, 16, -1, null, null),      // bool
      ColumnInfo("price", 0, 701, -1, null, null))) // float8
    val df = Seq(
      (10L, "insert", Map("id" -> "7", "n" -> "42", "ok" -> "true",
        "price" -> "12.5")),
      (20L, "insert", Map("id" -> "8", "n" -> null, "ok" -> "false",
        "price" -> "0.25")))
      .toDF("lsn", "op", "tuple")
    val typed = TypedRefinement.typedView(df, "tuple", typedRel)
    val schema = typed.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("id") == "bigint" && schema("n") == "int" &&
      schema("ok") == "boolean" && schema("price") == "double")
    val r = typed.orderBy("lsn").collect()
    assert(r(0).getAs[Long]("id") == 7L && r(0).getAs[Boolean]("ok"))
    assert(r(1).isNullAt(r(1).fieldIndex("n")))
  }

  test("TOAST recovery back-fills from the snapshot") {
    val sp = spark; import sp.implicits._
    val changes = Seq(
      ("1", 100L, Map("id" -> "1", "big" -> null.asInstanceOf[String])),
      ("2", 110L, Map("id" -> "2", "big" -> "fresh")))
      .toDF("key", "lsn", "tuple")
    val snapshot = Seq(
      ("1", Map("id" -> "1", "big" -> "recovered-from-snapshot")),
      ("2", Map("id" -> "2", "big" -> "stale")))
      .toDF("key", "tuple")
    val out = TypedRefinement.recoverToast(changes, snapshot, Seq("id", "big"))
      .orderBy("key").collect()
    assert(out(0).getAs[Map[String, String]]("tuple")("big")
      == "recovered-from-snapshot")
    assert(out(1).getAs[Map[String, String]]("tuple")("big") == "fresh")
  }

  test("progress listener surfaces LSN heartbeats (keepalive analogue)") {
    val listener = new CdcProgressListener
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.format(CdcReplaySource.FORMAT)
        .option("path", logDir)
        .option("maxFramesPerTrigger", "10")
        .load()
        .writeStream.format("memory").queryName("hb")
        .outputMode("append")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckhb").toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      // listener events are delivered asynchronously
      var tries = 0
      while (listener.heartbeats.size < 3 && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val hbs = listener.heartbeats.filter(_.queryName == "hb")
      assert(hbs.nonEmpty, "expected heartbeats from the hb query")
      // LSNs advance monotonically to the log's end
      val lsns = hbs.map(_.lsn).filter(_ > 0)
      assert(lsns == lsns.sorted)
      assert(lsns.last == 300L)
      assert(hbs.map(_.numInputRows).sum == 30L)
    } finally spark.streams.removeListener(listener)
  }

  test("uncommitted transactions are invisible (rollback semantics)") {
    val mixDir = java.nio.file.Files.createTempDirectory("rollbk").toString
    CdcReplaySource.writeLog(mixDir, Seq(
      10L -> Seq(PgoutputWriter.begin(10L, 0L, 1L),
        PgoutputWriter.relation(rel),
        PgoutputWriter.insert(801, Seq("1", "committed")),
        PgoutputWriter.commit(10L, 11L, 0L)),
      // writer crashed mid-append: no commit frame
      20L -> Seq(PgoutputWriter.begin(20L, 0L, 2L),
        PgoutputWriter.relation(rel),
        PgoutputWriter.insert(801, Seq("2", "uncommitted"))),
      30L -> Seq(PgoutputWriter.begin(30L, 0L, 3L),
        PgoutputWriter.relation(rel),
        PgoutputWriter.insert(801, Seq("3", "committed2")),
        PgoutputWriter.commit(30L, 31L, 0L))))
    val df = spark.read.format(CdcReplaySource.FORMAT)
      .option("path", mixDir).load()
    assert(StreamOps.decodedChanges(df).count() == 3L) // raw: all three
    val committed = StreamOps.decodedCommittedChanges(df)
    assert(committed.count() == 2L)
    assert(committed.filter(col("tuple")("v") === "uncommitted").count() == 0L)

    // a commit frame that does NOT terminate the entry (second tx
    // started after it, never committed) must not leak its changes
    val fragDir = java.nio.file.Files.createTempDirectory("frag").toString
    CdcReplaySource.writeLog(fragDir, Seq(
      40L -> Seq(PgoutputWriter.begin(40L, 0L, 4L),
        PgoutputWriter.relation(rel),
        PgoutputWriter.insert(801, Seq("4", "committed")),
        PgoutputWriter.commit(40L, 41L, 0L),
        PgoutputWriter.begin(50L, 0L, 5L),
        PgoutputWriter.insert(801, Seq("5", "trailing-uncommitted")))))
    val frag = StreamOps.decodedCommittedChanges(
      spark.read.format(CdcReplaySource.FORMAT).option("path", fragDir).load())
    assert(frag.filter(col("tuple")("v") === "trailing-uncommitted")
      .count() == 0L)
  }

  test("sliding windows: 10s window sliding by 5s doubles coverage") {
    // 30 events at 1s spacing; each lands in two overlapping windows
    val counts = changesStream()
      .groupBy(window(col("ts"), "10 seconds", "5 seconds"))
      .agg(count(lit(1)).as("n"))
    val q = counts.writeStream.format("memory").queryName("slide")
      .outputMode("complete")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cksl").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val total = spark.sql("SELECT sum(n) FROM slide").head().getLong(0)
    val wins = spark.sql("SELECT count(*) FROM slide").head().getLong(0)
    assert(total == 60L, s"each of 30 events must appear in 2 windows, got $total")
    assert(wins >= 6)
  }

  test("huge transaction streams incrementally (O6 parity)") {
    // one transaction carrying 50k row-updates — the reference's
    // 500k-row fixture shape, scaled for test time; must stream
    // through decode + aggregation without materializing per-row state
    val bigDir = java.nio.file.Files.createTempDirectory("huge").toString
    val n = 50000
    val frames = Seq(PgoutputWriter.begin(1000L, 0L, 1L),
      PgoutputWriter.relation(rel)) ++
      (1 to n).map(i => PgoutputWriter.update(801, 'N', Nil,
        Seq((i % 1000).toString, s"v$i"))) :+
      PgoutputWriter.commit(1000L, 1001L, 0L)
    CdcReplaySource.writeLog(bigDir, Seq(1000L -> frames))

    val t0 = System.nanoTime()
    val counts = StreamOps.decodedChanges(
      spark.read.format(CdcReplaySource.FORMAT).option("path", bigDir).load())
      .groupBy(col("tuple")("id")).count()
    assert(counts.count() == 1000L)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"$n row-updates decoded+aggregated in $secs%.1f s")
    assert(secs < 60, s"huge tx took $secs s") // reference budget: 100 s for 10x rows
  }

  test("msg-prefix exclusion keeps null-prefix messages (3VL)") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("message", "noisy"), ("message", null.asInstanceOf[String]),
      ("message", "keep"), ("insert", null.asInstanceOf[String]))
      .toDF("op", "prefix")
    val out = ReplayFilters.msgPrefixFilters(df, Seq("noisy"), Nil)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("message", null), ("message", "keep"),
      ("insert", null)))
  }

  test("LSN functions registered for SQL run inside codegen") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT format_lsn(id * 4294967311) AS s,
        |       parse_lsn(format_lsn(id * 4294967311)) AS back,
        |       lsn_plus_one(id * 4294967296 - 1) AS carried
        |FROM range(1, 100)""".stripMargin)
    val rows = r.collect()
    assert(rows.forall(row =>
      Lsn.parse(row.getAs[String]("s")) == row.getAs[Long]("back")))
    assert(rows.head.getAs[Long]("carried") == 4294967296L)
    // codegen-friendly: the plan stays in WholeStageCodegen (asterisked)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stages in:\n$plan")
  }

  test("md5_h32 equals the conv/substring/md5 construction, in codegen") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT md5_h32(CAST(id AS STRING)) AS fast,
        |  CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10)
        |       AS BIGINT) AS slow
        |FROM range(0, 1000)""".stripMargin)
    assert(r.filter("fast <> slow").count() == 0)
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stages in:\n$plan")
  }

  test("PG-epoch functions registered for SQL run inside codegen") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT id, pg_epoch_to_unix(unix_to_pg_epoch(id * 1000000)) AS back
        |FROM range(1, 100)""".stripMargin)
    assert(r.collect().forall(row =>
      row.getAs[Long]("back") == row.getAs[Long]("id") * 1000000L))
    val plan = r.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"expected codegen stages in:\n$plan")
  }

  test("proto-v2 streamed transactions: commit emits across segments, abort discards") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[StreamOps.StreamEvent]
    val out = StreamOps.streamedTransactions(input.toDS())
    val q = out.writeStream.format("memory").queryName("v2tx")
      .outputMode("append").start()
    try {
      // batch 1: xid 1 first segment buffers; xid 2 aborts
      input.addData(
        StreamOps.StreamEvent(1L, 10L, "insert", "t", Map("id" -> "1")),
        StreamOps.StreamEvent(2L, 11L, "insert", "t", Map("id" -> "2")),
        StreamOps.StreamEvent(2L, 12L, "stream_abort", "t", null))
      q.processAllAvailable()
      assert(spark.table("v2tx").count() == 0)
      // batch 2: xid 1's second segment + stream commit releases both
      input.addData(
        StreamOps.StreamEvent(1L, 20L, "insert", "t", Map("id" -> "3")),
        StreamOps.StreamEvent(1L, 30L, "stream_commit", "t", null))
      q.processAllAvailable()
      val rows = spark.table("v2tx").as[StreamOps.CommittedChange]
        .collect().sortBy(_.tuple("id"))
      assert(rows.map(_.tuple("id")).toSeq == Seq("1", "3"))
      assert(rows.forall(r => r.xid == 1L && r.commitLsn == 30L))
    } finally q.stop()
  }

  test("Misra-Gries heavy hitters run as a streaming aggregate (complete mode)") {
    // the q103 sketch over an unbounded stream: the same mergeable
    // Aggregator drives a streaming groupBy — micro-batch partials
    // merge into running state exactly like the batch partial/final
    // tree, so the n/(k+1) bound holds over everything seen so far
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val mg = new graft.ops.Aggregators.MisraGries(4)
    val input = MemoryStream[String]
    val q = input.toDS().select(mg.toColumn.name("sketch"))
      .writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    try {
      input.addData(Seq.fill(30)("hot") ++ Seq("a", "b", "c"): _*)
      q.processAllAvailable()
      input.addData(Seq.fill(20)("hot") ++ Seq("d", "e", "f", "g"): _*)
      q.processAllAvailable()
      val sketch = spark.table("mg_stream")
        .as[Map[String, Long]].collect().head
      val n = 57L // total items streamed
      val exactHot = 50L
      val est = sketch.getOrElse("hot", 0L)
      assert(est <= exactHot && exactHot - est <= n / 5,
        s"bound violated: est=$est")
      assert(sketch.contains("hot"), "heavy key must survive")
      assert(sketch.size <= 4)
    } finally q.stop()
  }

  test("streamed transactions: subtransaction abort prunes only the savepoint") {
    val ss = spark
    import ss.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    val input = MemoryStream[StreamOps.StreamEvent]
    val out = StreamOps.streamedTransactions(input.toDS())
    val q = out.writeStream.format("memory").queryName("v2sub")
      .outputMode("append").start()
    try {
      input.addData(
        StreamOps.StreamEvent(7L, 10L, "insert", "t", Map("id" -> "1")),
        StreamOps.StreamEvent(7L, 11L, "insert", "t", Map("id" -> "2"),
          subXid = 8L),
        StreamOps.StreamEvent(7L, 12L, "stream_abort", "t", null,
          subXid = 8L))
      q.processAllAvailable()
      assert(spark.table("v2sub").count() == 0) // still in flight
      input.addData(
        StreamOps.StreamEvent(7L, 20L, "insert", "t", Map("id" -> "3")),
        StreamOps.StreamEvent(7L, 30L, "stream_commit", "t", null))
      q.processAllAvailable()
      val ids = spark.table("v2sub").as[StreamOps.CommittedChange]
        .collect().map(_.tuple("id")).sorted.toSeq
      assert(ids == Seq("1", "3")) // savepoint change 2 pruned
    } finally q.stop()
  }
}
