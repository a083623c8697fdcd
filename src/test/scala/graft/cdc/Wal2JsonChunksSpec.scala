package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** wal2json `write-in-chunks 'on'` consumer-side reassembly (r11
  * verdict ask 8): chunked mode streams one transaction as multiple
  * XLogData frames — header `{"xid":…,"change":[`, one frame per
  * change object, footer `]}` — so no single frame parses as JSON.
  * [[CdcFunctions.wal2jsonReassembleChunks]] must rebuild whole
  * documents per shard (slot) in LSN order, tolerate brace characters
  * inside string values (including escaped quotes), and pass
  * already-whole documents through untouched. */
class Wal2JsonChunksSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-wal2json-chunks")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("chunked frames reassemble into parseable documents; values " +
    "with braces/escapes don't break the depth tracking") {
    val ss = spark
    import ss.implicits._
    // shard s1: two chunked transactions back to back. The second
    // change's text value carries '}', '{', '[' and an escaped quote —
    // structural counting must ignore all of them.
    val tricky = """tail } of { a \" value ]["""
    val frames = Seq(
      // tx 1 (xid 563): header / 2 changes / footer = 4 frames
      ("s1", "0/00000010", """{"xid":563,"change":["""),
      ("s1", "0/00000011",
        """{"kind":"insert","schema":"public","table":"t1",""" +
          """"columnnames":["a","b"],"columntypes":["integer","text"],""" +
          """"columnvalues":["1","plain"]}"""),
      ("s1", "0/00000012",
        """,{"kind":"update","schema":"public","table":"t1",""" +
          """"columnnames":["a","b"],"columntypes":["integer","text"],""" +
          s""""columnvalues":["2","$tricky"],""" +
          """"oldkeys":{"keynames":["a"],"keytypes":["integer"],""" +
          """"keyvalues":["2"]}}"""),
      ("s1", "0/00000013", """]}"""),
      // tx 2 (xid 564): header+change+footer
      ("s1", "0/00000020", """{"xid":564,"change":["""),
      ("s1", "0/00000021",
        """{"kind":"delete","schema":"public","table":"t2",""" +
          """"columnnames":[],"columntypes":[],"columnvalues":[],""" +
          """"oldkeys":{"keynames":["id"],"keytypes":["bigint"],""" +
          """"keyvalues":["9"]}}"""),
      ("s1", "0/00000022", """]}"""),
      // shard s2: chunking OFF — one whole document, must pass through
      ("s2", "0/00000005",
        """{"xid":700,"change":[{"kind":"insert","schema":"s",""" +
          """"table":"t3","columnnames":["x"],"columntypes":["text"],""" +
          """"columnvalues":["whole"]}]}"""))
    val df = frames.toDF("shard", "lsn", "payload")
    val docs = CdcFunctions.wal2jsonReassembleChunks(
      df, col("shard"), col("lsn"), col("payload"))
    val got = docs.select("shard", "lsn", "payload")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .sortBy(t => (t._1, t._2))
    assert(got.length == 3, s"expected 3 documents, got:\n${got.mkString("\n")}")
    // each document anchors at its FIRST frame's lsn
    assert(got.map(t => (t._1, t._2)).toSeq ==
      Seq(("s1", "0/00000010"), ("s1", "0/00000020"), ("s2", "0/00000005")))
    // and every reassembled payload now parses: run the standard
    // decode over them and check the change rows
    val changes = CdcFunctions.wal2jsonChanges(docs, col("payload"))
    val rows = changes
      .select(col("xid"), col("op"), col("table"),
        col("after")("b").as("b"), col("key")("id").as("kid"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))
      .toSet
    assert(rows == Set(
      (563L, "insert", "t1", Some("plain"), None),
      (563L, "update", "t1", Some(tricky.replace("\\\"", "\"")), None),
      (564L, "delete", "t2", None, Some("9")),
      (700L, "insert", "t3", None, None)),
      s"decoded rows mismatch:\n${rows.mkString("\n")}")
  }

  test("redelivered frames (same shard+lsn) collapse instead of " +
    "double-counting bracket depth") {
    val ss = spark
    import ss.implicits._
    // a reconnect resends from the confirmed LSN: the header frame
    // arrives twice. Pre-r13 the equal-LSN peer doubled the depth
    // delta inside the RANGE window frame, corrupting every later
    // group in the shard (r12 advisor finding).
    val frames = Seq(
      ("s1", 10L, """{"xid":1,"change":["""),
      ("s1", 10L, """{"xid":1,"change":["""), // redelivery
      ("s1", 11L, """{"kind":"insert","schema":"p","table":"t",""" +
        """"columnnames":["a"],"columntypes":["text"],""" +
        """"columnvalues":["v"]}"""),
      ("s1", 12L, """]}"""),
      ("s1", 20L, """{"xid":2,"change":[]}""")) // next tx must survive
    val docs = CdcFunctions.wal2jsonReassembleChunks(
      frames.toDF("shard", "lsn", "payload"),
      col("shard"), col("lsn"), col("payload"))
    val got = docs.orderBy(col("lsn"))
      .select("lsn", "incomplete").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == Seq((10L, false), (20L, false)),
      s"expected two complete documents, got $got")
    val xids = CdcFunctions.wal2jsonChanges(docs, col("payload"))
      .select("xid").collect().map(_.getLong(0)).toSet
    assert(xids == Set(1L)) // tx 2 has an empty change array
  }

  test("a truncated tail transaction is flagged incomplete, not " +
    "emitted as an unparseable payload") {
    val ss = spark
    import ss.implicits._
    val frames = Seq(
      ("s1", 10L, """{"xid":1,"change":[]}"""),
      ("s1", 20L, """{"xid":2,"change":["""), // stream cut mid-tx
      ("s1", 21L, """{"kind":"insert","schema":"p","table":"t",""" +
        """"columnnames":["a"],"columntypes":["text"],""" +
        """"columnvalues":["v"]}"""))
    val docs = CdcFunctions.wal2jsonReassembleChunks(
      frames.toDF("shard", "lsn", "payload"),
      col("shard"), col("lsn"), col("payload"))
    val got = docs.orderBy(col("lsn"))
      .select("lsn", "incomplete").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    assert(got == Seq((10L, false), (20L, true)),
      s"the cut tail must surface with incomplete=true, got $got")
    // consumers hold incomplete groups back; the complete one decodes
    val ok = CdcFunctions.wal2jsonChanges(
      docs.filter(!col("incomplete")), col("payload"))
    assert(ok.count() == 0) // xid 1 has an empty change array
  }

  test("property: random transactions, random change counts, hostile " +
    "values — reassembled documents always parse back to the inputs") {
    val ss = spark
    import ss.implicits._
    val rnd = new scala.util.Random(1234) // deterministic
    // hostile value alphabet: JSON structural chars inside strings,
    // escaped quotes and backslashes — everything the depth counter
    // must NOT count
    val atoms = Seq("{", "}", "[", "]", ",", "\\\"", "\\\\", "a", "Z",
      "0", " ", ":")
    def value(): String =
      (0 until (1 + rnd.nextInt(12))).map(_ =>
        atoms(rnd.nextInt(atoms.size))).mkString
    val txs = (0 until 60).map { t =>
      val nChanges = 1 + rnd.nextInt(5)
      val vals = (0 until nChanges).map(_ => value())
      (t.toLong, rnd.nextInt(4).toLong, vals) // (xid, shard, values)
    }
    val frames = txs.flatMap { case (xid, shard, vals) =>
      val header = (s"s$shard", f"0/${xid * 16}%08X",
        s"""{"xid":$xid,"change":[""")
      val changes = vals.zipWithIndex.map { case (v, i) =>
        (s"s$shard", f"0/${xid * 16 + i + 1}%08X",
          (if (i == 0) "" else ",") +
            s"""{"kind":"insert","schema":"p","table":"t",""" +
            s""""columnnames":["x"],"columntypes":["text"],""" +
            s""""columnvalues":["$v"]}""")
      }
      val footer = (s"s$shard", f"0/${xid * 16 + 15}%08X", "]}")
      header +: changes :+ footer
    }
    val docs = CdcFunctions.wal2jsonReassembleChunks(
      frames.toDF("shard", "lsn", "payload"),
      col("shard"), col("lsn"), col("payload"))
    assert(docs.count() == 60L, "one document per transaction")
    val decoded = CdcFunctions.wal2jsonChanges(docs, col("payload"))
      .select(col("xid"), col("after")("x").as("x"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    txs.foreach { case (xid, _, vals) =>
      // JSON unescape of the two escaped atoms
      // sentinel "@" is outside the atom alphabet, so the 3-step
      // unescape cannot collide with payload content
      val want = vals.map(_.replace("\\\\", "@")
        .replace("\\\"", "\"").replace("@", "\\"))
      val got = decoded.getOrElse(xid, Seq.empty)
      assert(got.sorted == want.sorted,
        s"tx $xid: decoded $got, expected $want")
    }
  }
}
