package graft.cdc

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-OID typed refinement over the pg-types surface the reference
  * inherits (`pgoutput-parser.ts:144` defers every column to
  * `types.getTypeParser(typeOid)`; runtime types asserted in
  * `decoder-pgoutput.spec.ts:117-125`): numeric, T[] arrays in
  * postgres-array text format, interval, json/jsonb, bytea hex,
  * point. */
class TypedRefinementOidSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-typed-refinement-oid-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def toks(s: String): Seq[String] = {
    val a = PgTextArray.tokens(UTF8String.fromString(s))
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      if (a.isNullAt(i)) null else a.getUTF8String(i).toString)
  }

  test("postgres-array tokenizer: grammar cases") {
    assert(toks("{1,2,3}") == Seq("1", "2", "3"))
    assert(toks("{}") == Seq.empty)
    assert(toks("""{a,"b, with comma",NULL}""") == Seq("a", "b, with comma", null))
    assert(toks("""{"quoted \"q\"","back\\slash"}""") ==
      Seq("quoted \"q\"", "back\\slash"))
    assert(toks("""{"NULL"}""") == Seq("NULL")) // quoted NULL is the string
    // multidim: nested elements come back verbatim, re-tokenizable
    assert(toks("{{1,2},{3,4}}") == Seq("{1,2}", "{3,4}"))
    assert(toks("""{{a,"x,y"},NULL}""") == Seq("""{a,"x,y"}""", null))
    assert(toks("""{{a,"x,y"},NULL}""").filter(_ != null).flatMap(toks) ==
      Seq("a", "x,y"))
    assert(toks("not an array") == null)
    assert(toks("{{1,2}") == null)  // unbalanced
    assert(toks("""{"unterminated}""") == null)
  }

  private def one(oid: Int, text: String): org.apache.spark.sql.Row = {
    val sp = spark; import sp.implicits._
    Seq(text).toDF("raw")
      .select(TypedRefinement.refine(col("raw"), oid).as("v"))
      .head()
  }

  test("numeric -> DecimalType keeps 18-digit scale") {
    assert(one(1700, "12345.678900").getDecimal(0) ==
      new java.math.BigDecimal("12345.678900000000000000"))
  }

  test("bytea \\x-hex -> BinaryType") {
    assert(one(17, "\\xDEADBEEF").getAs[Array[Byte]](0).toSeq ==
      Seq(0xDE, 0xAD, 0xBE, 0xEF).map(_.toByte))
  }

  test("json/jsonb -> variant, fields reachable") {
    val sp = spark; import sp.implicits._
    val r = Seq("""{"a": 7, "b": "x"}""").toDF("raw")
      .select(TypedRefinement.refine(col("raw"), 3802).as("v"))
      .selectExpr("variant_get(v, '$.a', 'long') AS a",
        "variant_get(v, '$.b', 'string') AS b")
      .head()
    assert(r.getLong(0) == 7L && r.getString(1) == "x")
  }

  test("interval text -> (months, days, micros), signed units and frac secs") {
    val r = one(1186, "1 year 2 mons 3 days 04:05:06.789")
    val s = r.getStruct(0)
    assert(s.getInt(0) == 14)
    assert(s.getInt(1) == 3)
    assert(s.getLong(2) == (4 * 3600L + 5 * 60 + 6) * 1000000L + 789000L)
    val neg = one(1186, "-1 days -04:05:06").getStruct(0)
    assert(neg.getInt(1) == -1)
    assert(neg.getLong(2) == -((4 * 3600L + 5 * 60 + 6) * 1000000L))
    val timeOnly = one(1186, "00:00:01").getStruct(0)
    assert(timeOnly.getInt(0) == 0 && timeOnly.getLong(2) == 1000000L)
  }

  test("point '(x,y)' -> struct(x, y)") {
    val s = one(600, "(1.5,-2.25)").getStruct(0)
    assert(s.getDouble(0) == 1.5 && s.getDouble(1) == -2.25)
  }

  test("arrays: int8[], text[] with quoted elements and NULL") {
    val ints = one(1016, "{10,20,NULL}").getSeq[java.lang.Long](0)
    assert(ints == Seq(10L, 20L, null))
    val texts = one(1009, """{plain,"a, b",NULL}""").getSeq[String](0)
    assert(texts == Seq("plain", "a, b", null))
    val bools = one(1000, "{t,f}").getSeq[Boolean](0)
    assert(bools == Seq(true, false))
  }

  test("typedView end-to-end over a tuple map with the new OIDs") {
    val sp = spark; import sp.implicits._
    val rel = RelationInfo(950, "public", "typed", "default", Seq(
      ColumnInfo("id", 1, 20, -1, null, null),
      ColumnInfo("price", 0, 1700, -1, null, null),
      ColumnInfo("tags", 0, 1009, -1, null, null),
      ColumnInfo("payload", 0, 17, -1, null, null),
      ColumnInfo("dur", 0, 1186, -1, null, null),
      ColumnInfo("pos", 0, 600, -1, null, null)))
    val df = Seq((100L, "ins",
      Map("id" -> "42", "price" -> "9.50", "tags" -> """{x,"y z"}""",
        "payload" -> "\\x0102", "dur" -> "2 days 01:00:00",
        "pos" -> "(3.0,4.0)")))
      .toDF("lsn", "op", "tuple")
    val typed = TypedRefinement.typedView(df, "tuple", rel)
    val r = typed.head()
    assert(r.getAs[Long]("id") == 42L)
    assert(r.getAs[java.math.BigDecimal]("price").doubleValue() == 9.5)
    assert(r.getSeq[String](r.fieldIndex("tags")) == Seq("x", "y z"))
    assert(r.getAs[Array[Byte]]("payload").toSeq == Seq(1.toByte, 2.toByte))
    assert(r.getAs[org.apache.spark.sql.Row]("dur").getLong(2) == 3600000000L)
    assert(r.getAs[org.apache.spark.sql.Row]("pos").getDouble(0) == 3.0)
  }
}
