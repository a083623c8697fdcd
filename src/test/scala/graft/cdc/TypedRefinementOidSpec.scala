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

  test("uuid/macaddr normalize to canonical lowercase text") {
    assert(one(2950, "A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11").getString(0) ==
      "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
    assert(one(829, "08:00:2B:01:02:03").getString(0) == "08:00:2b:01:02:03")
  }

  test("inet/cidr -> (addr, masklen); host inet has null masklen") {
    val cidr = one(650, "192.168.100.0/24").getStruct(0)
    assert(cidr.getString(0) == "192.168.100.0" && cidr.getInt(1) == 24)
    val host = one(869, "10.1.2.3").getStruct(0)
    assert(host.getString(0) == "10.1.2.3" && host.isNullAt(1))
    val v6 = one(869, "2001:db8::8a2e:370:7334/64").getStruct(0)
    assert(v6.getString(0) == "2001:db8::8a2e:370:7334" && v6.getInt(1) == 64)
  }

  test("ranges -> typed (lo, hi, lo_inc, hi_inc, is_empty)") {
    val i4 = one(3904, "[3,7)").getStruct(0)
    assert(i4.getInt(0) == 3 && i4.getInt(1) == 7)
    assert(i4.getBoolean(2) && !i4.getBoolean(3) && !i4.getBoolean(4))
    val empty = one(3926, "empty").getStruct(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1) && empty.getBoolean(4))
    val unbLo = one(3904, "(,5)").getStruct(0)
    assert(unbLo.isNullAt(0) && unbLo.getInt(1) == 5 && !unbLo.getBoolean(2))
    val num = one(3906, "[1.50,2.75]").getStruct(0)
    assert(num.getDecimal(0).compareTo(new java.math.BigDecimal("1.5")) == 0)
    assert(num.getBoolean(2) && num.getBoolean(3))
    val ts = one(3908, "[\"2024-01-01 00:00:00\",\"2024-01-02 12:00:00\")")
      .getStruct(0)
    assert(ts.getTimestamp(0).toInstant.toString == "2024-01-01T00:00:00Z")
    assert(ts.getTimestamp(1).toInstant.toString == "2024-01-02T12:00:00Z")
    val dr = one(3912, "[2024-02-01,2024-03-01)").getStruct(0)
    assert(dr.getDate(0).toString == "2024-02-01")
  }

  test("long-tail arrays: uuid[], inet[], int4range[]") {
    val us = one(2951, "{A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11,NULL}")
      .getSeq[String](0)
    assert(us == Seq("a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11", null))
    val ins = one(1041, "{10.0.0.1,192.168.0.0/16}")
      .getSeq[org.apache.spark.sql.Row](0)
    assert(ins(0).getString(0) == "10.0.0.1" && ins(0).isNullAt(1))
    assert(ins(1).getString(0) == "192.168.0.0" && ins(1).getInt(1) == 16)
    val rs = one(3905, """{"[1,4)","[10,12)"}""")
      .getSeq[org.apache.spark.sql.Row](0)
    assert(rs(0).getInt(0) == 1 && rs(0).getInt(1) == 4)
    assert(rs(1).getInt(0) == 10 && !rs(1).getBoolean(3))
  }

  test("enum/domain OIDs fall to lossless text passthrough") {
    assert(TypedRefinement.sparkTypeFor(16385) ==
      org.apache.spark.sql.types.StringType)
    assert(one(16385, "happy").getString(0) == "happy")
  }

  test("TypeCatalog enum -> validated categorical (label, ord)") {
    val sp = spark; import sp.implicits._
    val cat = TypedRefinement.TypeCatalog(
      enums = Map(16400 -> Seq("sad", "ok", "happy")))
    assert(TypedRefinement.sparkTypeFor(16400, cat) ==
      TypedRefinement.EnumStruct)
    def go(text: String) = Seq(text).toDF("raw")
      .select(TypedRefinement.refine(col("raw"), 16400, cat).as("v"))
      .select("v.label", "v.ord").head()
    val valid = go("happy")
    assert(valid.getString(0) == "happy" && valid.getInt(1) == 2)
    assert(go("sad").getInt(1) == 0) // pg_enum sort order, 0-based
    // a label outside the catalog keeps its text (lossless) but its
    // ord is null — the validation signal text passthrough lacked
    val invalid = go("bogus")
    assert(invalid.getString(0) == "bogus" && invalid.isNullAt(1))
    // an uncataloged OID still falls through to text passthrough
    assert(one(16401, "happy").getString(0) == "happy")
  }

  test("a cyclic TypeCatalog fails with the offending OID, not a " +
      "StackOverflow") {
    val cyclic = TypedRefinement.TypeCatalog(
      domains = Map(16600 -> 16601, 16601 -> 16600))
    val e = intercept[IllegalArgumentException] {
      TypedRefinement.sparkTypeFor(16600, cyclic)
    }
    assert(e.getMessage.contains("cyclic"))
    intercept[IllegalArgumentException] {
      TypedRefinement.refine(col("x"), 16600, cyclic)
    }
  }

  test("TypeCatalog domain resolves through its base type, " +
      "transitively") {
    val sp = spark; import sp.implicits._
    val cat = TypedRefinement.TypeCatalog(
      domains = Map(16500 -> 16501, 16501 -> 23)) // domain over domain
    assert(TypedRefinement.sparkTypeFor(16500, cat) ==
      org.apache.spark.sql.types.IntegerType)
    val r = Seq("42").toDF("raw")
      .select(TypedRefinement.refine(col("raw"), 16500, cat).as("v"))
      .head()
    assert(r.getInt(0) == 42)
  }

  test("TypeCatalog arrays: enum[] refines per element") {
    val sp = spark; import sp.implicits._
    val cat = TypedRefinement.TypeCatalog(
      enums = Map(16400 -> Seq("sad", "ok", "happy")),
      arrays = Map(16402 -> 16400))
    val r = Seq("""{happy,NULL,bogus}""").toDF("raw")
      .select(TypedRefinement.refine(col("raw"), 16402, cat).as("v"))
      .head()
    val elems = r.getSeq[org.apache.spark.sql.Row](0)
    assert(elems.size == 3)
    assert(elems(0).getString(0) == "happy" && elems(0).getInt(1) == 2)
    assert(elems(1) == null)
    assert(elems(2).getString(0) == "bogus" && elems(2).isNullAt(1))
  }

  test("record tokenizer: composite grammar cases") {
    def rtoks(s: String): Seq[String] = {
      val a = PgTextRecord.tokens(UTF8String.fromString(s))
      if (a == null) null
      else (0 until a.numElements()).map(i =>
        if (a.isNullAt(i)) null else a.getUTF8String(i).toString)
    }
    assert(rtoks("(1,2,3)") == Seq("1", "2", "3"))
    // unquoted empty field is SQL NULL; quoted empty is ""
    assert(rtoks("(a,,c)") == Seq("a", null, "c"))
    assert(rtoks("""(a,"",c)""") == Seq("a", "", "c"))
    // quoting: commas, doubled quotes, backslash escapes
    assert(rtoks("(x,\"a, b\",\"he said \"\"hi\"\"\")") ==
      Seq("x", "a, b", "he said \"hi\""))
    assert(rtoks("""("back\\slash")""") == Seq("back\\slash"))
    // a nested composite arrives quoted; unescaping yields its own
    // literal for another application
    assert(rtoks("""(1,"(2,3)")""") == Seq("1", "(2,3)"))
    assert(rtoks("""(1,"(2,3)")""").flatMap(t =>
      Option(rtoks(t)).getOrElse(Seq(t))) == Seq("1", "2", "3"))
    // malformed: no parens / unterminated quote
    assert(rtoks("1,2") == null)
    assert(rtoks("""("unterminated)""") == null)
  }

  test("TypeCatalog composite -> typed StructType, fields recursing " +
      "through the catalog") {
    val sp = spark; import sp.implicits._
    val cat = TypedRefinement.TypeCatalog(
      enums = Map(16400 -> Seq("sad", "ok", "happy")),
      composites = Map(16700 -> Seq(
        "name" -> 25, "qty" -> 23, "mood" -> 16400)))
    val t = TypedRefinement.sparkTypeFor(16700, cat)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(t.fieldNames.toSeq == Seq("name", "qty", "mood"))
    assert(t("qty").dataType == org.apache.spark.sql.types.IntegerType)
    assert(t("mood").dataType == TypedRefinement.EnumStruct)
    val r = Seq("""("a, b",7,happy)""", """(plain,,sad)""").toDF("raw")
      .select(TypedRefinement.refine(col("raw"), 16700, cat).as("v"))
      .select("v.name", "v.qty", "v.mood.ord").collect()
    assert(r(0).getString(0) == "a, b" && r(0).getInt(1) == 7 &&
      r(0).getInt(2) == 2)
    assert(r(1).getString(0) == "plain" && r(1).isNullAt(1) &&
      r(1).getInt(2) == 0)
    // a NULL composite value stays NULL (not a struct of nulls)
    val n = Seq(Tuple1(null: String)).toDF("raw")
      .select(TypedRefinement.refine(col("raw"), 16700, cat).as("v"))
      .head()
    assert(n.isNullAt(0))
  }

  test("a self-referential composite fails the cycle guard") {
    val cyclic = TypedRefinement.TypeCatalog(
      composites = Map(16800 -> Seq("self" -> 16800)))
    val e = intercept[IllegalArgumentException] {
      TypedRefinement.sparkTypeFor(16800, cyclic)
    }
    assert(e.getMessage.contains("cyclic"))
  }

  test("numeric typmod maps to DecimalType(p, s); -1 stays wide") {
    import org.apache.spark.sql.types._
    def tm(p: Int, s: Int): Int = ((p << 16) | s) + 4
    assert(TypedRefinement.numericTypeFor(tm(12, 2)) == DecimalType(12, 2))
    assert(TypedRefinement.numericTypeFor(tm(5, 0)) == DecimalType(5, 0))
    assert(TypedRefinement.numericTypeFor(-1) == DecimalType(38, 18))
    // PG precision beyond Spark's 38 falls back rather than overflows
    assert(TypedRefinement.numericTypeFor(tm(50, 4)) == DecimalType(38, 18))
    // end-to-end through typedColumns: the Relation's typmod decides
    val sp = spark; import sp.implicits._
    val rel = RelationInfo(960, "public", "m", "default", Seq(
      ColumnInfo("price", 0, 1700, tm(12, 2), null, null),
      ColumnInfo("free", 0, 1700, -1, null, null)))
    val df = Seq(Map("price" -> "19.99", "free" -> "19.99")).toDF("tuple")
      .select(TypedRefinement.typedColumns(col("tuple"), rel): _*)
    assert(df.schema("price").dataType == DecimalType(12, 2))
    assert(df.schema("free").dataType == DecimalType(38, 18))
    val row = df.head()
    assert(row.getDecimal(0).toPlainString == "19.99")
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
