package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the LSN codec (A7) — unlike Scala
  * UDFs these stay inside whole-stage codegen (no serialization
  * boundary, no boxing in the generated loop). `GraftFunctions
  * .register` exposes them to SQL and to the `call_function` Column
  * wrappers.
  */
case class FormatLsnExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "format_lsn"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(Lsn.format(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.cdc.Lsn.format($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class ParseLsnExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "parse_lsn"

  override def nullSafeEval(v: Any): Any =
    Lsn.parse(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.Lsn.parse($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** lsn + 1 with uint64 carry — the ack arithmetic (A9). */
case class LsnPlusOneExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "lsn_plus_one"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Lsn.plusOne(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c + 1L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** PG epoch (2000-01-01, µs) → Unix µs — `binary-reader.ts:88-91`.
  * Pure constant addition, fully codegen-friendly. */
case class PgEpochToUnixExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "pg_epoch_to_unix"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(PgEpoch.toUnixMicros(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c + ${PgEpoch.OffsetMicros}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unix µs → PG epoch µs — the standby-status timestamp arithmetic
  * (`logical-replication-service.ts:262-264`). */
case class UnixToPgEpochExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "unix_to_pg_epoch"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(PgEpoch.fromUnixMicros(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"($c - ${PgEpoch.OffsetMicros}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `spark.sql.extensions`-style integration: a session built with
  * `.config("spark.sql.extensions", "graft.cdc.GraftExtensions")`
  * gets every graft scalar function registered at session creation —
  * no explicit `GraftFunctions.register` call needed. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo(classOf[GraftExtensions].getName, name)
    ext.injectFunction((FunctionIdentifier("format_lsn"), info("format_lsn"),
      (exprs: Seq[Expression]) => FormatLsnExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("parse_lsn"), info("parse_lsn"),
      (exprs: Seq[Expression]) => ParseLsnExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("lsn_plus_one"), info("lsn_plus_one"),
      (exprs: Seq[Expression]) => LsnPlusOneExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("pg_epoch_to_unix"), info("pg_epoch_to_unix"),
      (exprs: Seq[Expression]) => PgEpochToUnixExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("unix_to_pg_epoch"), info("unix_to_pg_epoch"),
      (exprs: Seq[Expression]) => UnixToPgEpochExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("md5_h32"), info("md5_h32"),
      (exprs: Seq[Expression]) => Md5H32Expr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("vec_dot"), info("vec_dot"),
      (exprs: Seq[Expression]) => VecDotExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_l2i"), info("vec_l2i"),
      (exprs: Seq[Expression]) => VecL2IExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info("bloom_might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pg_array_tokens"),
      info("pg_array_tokens"),
      (exprs: Seq[Expression]) => PgArrayTokensExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("pg_record_tokens"),
      info("pg_record_tokens"),
      (exprs: Seq[Expression]) => PgRecordTokensExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("sliding_min"),
      info("sliding_min"),
      (exprs: Seq[Expression]) => SlidingMinExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("jump_shard"),
      info("jump_shard"),
      (exprs: Seq[Expression]) => JumpShardExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("longest_repeat"),
      info("longest_repeat"),
      (exprs: Seq[Expression]) => LongestRepeatExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("pair_pack"),
      info("pair_pack"),
      (exprs: Seq[Expression]) => PairPackExpr(exprs.head)))
    ext.injectFunction((FunctionIdentifier("sorted_inter_count"),
      info("sorted_inter_count"),
      (exprs: Seq[Expression]) => SortedInterCountExpr(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("json_depth_delta"),
      info("json_depth_delta"),
      (exprs: Seq[Expression]) => JsonDepthDeltaExpr(exprs.head)))
  }
}

object GraftFunctions {
  import org.apache.spark.sql.functions.call_function

  // Column wrappers resolve through the function registry — call
  // register() on the session first (idempotent, cheap).
  def format_lsn(c: Column): Column = call_function("format_lsn", c)
  def parse_lsn(c: Column): Column = call_function("parse_lsn", c)
  def lsn_plus_one(c: Column): Column = call_function("lsn_plus_one", c)
  def pg_epoch_to_unix(c: Column): Column = call_function("pg_epoch_to_unix", c)
  def unix_to_pg_epoch(c: Column): Column = call_function("unix_to_pg_epoch", c)
  def md5_h32(c: Column): Column = call_function("md5_h32", c)
  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vec_l2i(a: Column, b: Column): Column = call_function("vec_l2i", a, b)
  def pg_array_tokens(c: Column): Column = call_function("pg_array_tokens", c)
  def pg_record_tokens(c: Column): Column =
    call_function("pg_record_tokens", c)
  def sliding_min(a: Column, w: Column): Column =
    call_function("sliding_min", a, w)
  def jump_shard(k: Column, n: Column): Column =
    call_function("jump_shard", k, n)
  def longest_repeat(c: Column): Column =
    call_function("longest_repeat", c)
  def pair_pack(c: Column): Column = call_function("pair_pack", c)
  def sorted_inter_count(a: Column, b: Column): Column =
    call_function("sorted_inter_count", a, b)
  def json_depth_delta(c: Column): Column =
    call_function("json_depth_delta", c)

  /** Codegen'd Bloom-filter probe: `bf` is a binary literal holding a
    * serialized `org.apache.spark.util.sketch.BloomFilter`, `key` a
    * LongType column. Resolves to Spark's native
    * `BloomFilterMightContain` (the expression its runtime bloom
    * filter rewrite injects), so the probe stays inside whole-stage
    * codegen — unlike a Scala UDF, which would break the codegen span
    * on the fact-table scan it is meant to cheapen. */
  def bloom_might_contain(bf: Column, key: Column): Column =
    call_function("bloom_might_contain", bf, key)

  /** Make the functions callable from SQL: format_lsn(x), ...
    * Each function registers independently iff its name is absent, so
    * a partially-populated registry (an older build, a user override)
    * still gains the missing ones, and nothing already registered is
    * clobbered or re-registered (no replace warnings per query). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    def ensure(name: String,
        builder: Seq[Expression] => Expression): Unit =
      if (reg.lookupFunctionBuilder(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)).isEmpty)
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    ensure("format_lsn", exprs => FormatLsnExpr(exprs.head))
    ensure("parse_lsn", exprs => ParseLsnExpr(exprs.head))
    ensure("lsn_plus_one", exprs => LsnPlusOneExpr(exprs.head))
    ensure("pg_epoch_to_unix", exprs => PgEpochToUnixExpr(exprs.head))
    ensure("unix_to_pg_epoch", exprs => UnixToPgEpochExpr(exprs.head))
    ensure("md5_h32", exprs => Md5H32Expr(exprs.head))
    ensure("vec_dot", exprs => VecDotExpr(exprs(0), exprs(1)))
    ensure("vec_l2i", exprs => VecL2IExpr(exprs(0), exprs(1)))
    ensure("pg_array_tokens", exprs => PgArrayTokensExpr(exprs.head))
    ensure("pg_record_tokens", exprs => PgRecordTokensExpr(exprs.head))
    ensure("sliding_min", exprs => SlidingMinExpr(exprs(0), exprs(1)))
    ensure("jump_shard", exprs => JumpShardExpr(exprs(0), exprs(1)))
    ensure("longest_repeat", exprs => LongestRepeatExpr(exprs.head))
    ensure("pair_pack", exprs => PairPackExpr(exprs.head))
    ensure("sorted_inter_count", exprs =>
      SortedInterCountExpr(exprs(0), exprs(1)))
    ensure("json_depth_delta", exprs => JsonDepthDeltaExpr(exprs.head))
    ensure("bloom_might_contain", exprs =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)))
  }
}

/** First 4 bytes of the MD5 digest as a non-negative 32-bit value in
  * a Long — numerically identical to
  * `conv(substring(md5(x), 1, 8), 16, 10)` but without materializing
  * the 32-char hex string or re-parsing it (the dedup/minhash hot
  * path hashes every shingle and token). */
object Md5H32 {
  private val mdTl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  def hash(bytes: Array[Byte]): Long = {
    val md = mdTl.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

case class Md5H32Expr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_h32"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Md5H32.hash(v.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.Md5H32.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Left-to-right dot product over two double arrays — the kernel of
  * every cosine-similarity operator. The fold order (ascending index,
  * `acc + a[i]*b[i]`) is EXACTLY the order the DuckDB oracle's
  * `list_reduce(list_transform(...))` evaluates, so results are
  * bit-identical to the SQL-expressible formulation. */
object VecOps {
  def dot(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Exact integer squared L2 — the quantized-grid distance kernel
    * (k-means / PQ / trained-IVF). Callers guarantee equal lengths;
    * length mismatch mirrors the zip_with fold it replaces (null-pad
    * poisons the sum → caller returns null via [[VecL2IExpr]]). */
  def l2i(a: org.apache.spark.sql.catalyst.util.ArrayData,
      b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** A NULL element anywhere poisons the product — mirrors how the
    * `aggregate(zip_with(...))` fold (and DuckDB's `list_reduce`)
    * propagate NULL through `acc + x*y`. */
  def hasNullElement(
      a: org.apache.spark.sql.catalyst.util.ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }
}

/** Native `vec_l2i(a, b)`: exact integer squared L2 distance between
  * two BIGINT arrays — the quantized-grid kernel behind k-means / PQ
  * / trained-IVF assignment and audit scans. Same motivation as
  * [[VecDotExpr]]: the `aggregate(zip_with(...))` fold it replaces
  * drops out of whole-stage codegen and allocates the zipped array
  * per row; this stays codegen'd and allocation-free. Null element
  * or length mismatch → null, mirroring the null-poisoned fold. */
case class VecL2IExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "vec_l2i"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements() ||
        VecOps.hasNullElement(x) || VecOps.hasNullElement(y)) null
    else java.lang.Long.valueOf(VecOps.l2i(x, y))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if ($a.numElements() != $b.numElements() ||
         |    graft.cdc.VecOps.hasNullElement($a) ||
         |    graft.cdc.VecOps.hasNullElement($b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.cdc.VecOps.l2i($a, $b);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native `vec_dot(a, b)` — unlike `aggregate(zip_with(a, b, ...))`,
  * which drops out of whole-stage codegen into the interpreted
  * higher-order-function path and allocates the zipped array, this
  * stays inside the generated loop with zero intermediate
  * allocation. Inputs implicit-cast to array<double> (so raw
  * array<float> embedding columns work directly). */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (VecOps.hasNullElement(x) || VecOps.hasNullElement(y)) null
    else java.lang.Double.valueOf(VecOps.dot(x, y))
  }

  // NB: no generated line may BEGIN with '|' — enclosing expressions
  // compose child code inside s"""..."""​.stripMargin templates, which
  // would eat the leading pipes of a line-initial `||` (seen in the
  // wild as `')' expected instead of 'graft'` Janino failures).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""if (graft.cdc.VecOps.hasNullElement($a) ||
         |    graft.cdc.VecOps.hasNullElement($b)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.cdc.VecOps.dot($a, $b);
         |}""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** O(n) sliding-window minimum over a long array (monotonic deque) —
  * the winnowing fingerprint selection kernel (q148). Replaces the
  * `transform(sequence(...), j -> array_min(slice(hs, j+1, w)))`
  * higher-order chain, which drops out of whole-stage codegen and
  * allocates a w-element array per window; this allocates once per
  * row and compares each element at most twice. Output element j is
  * min(a[j..j+w-1]); n < w yields an empty array (the HOF chain's
  * `sequence(0, n-w)` behavior under the callers' n >= w guard). */
object SlidingMin {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  def apply(a: ArrayData, w: Int): ArrayData = {
    val n = a.numElements()
    if (w <= 0 || n < w) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n - w + 1)
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      while (tail > head && a.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(deque(head))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native `sliding_min(arr, w)` — elements must be non-null (the
  * callers feed md5_h32 outputs, which never are). */
case class SlidingMinExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sliding_min"

  override def nullSafeEval(a: Any, w: Any): Any =
    SlidingMin(a.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, w) => s"graft.cdc.SlidingMin.apply($a, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Jump consistent hash (Lamport & Veach, "A Fast, Minimal Memory,
  * Consistent Hash Algorithm", arXiv:1406.2294): maps a 64-bit key to
  * a bucket in [0, n) such that growing n to n' moves only a
  * (n'-n)/n' fraction of keys — the resharding primitive a 100 TB
  * corpus needs (mod-N would relocate ~everything). O(log n) loop,
  * no memory, no lookup table. The arithmetic is exactly the paper's:
  * an LCG step on the unsigned 64-bit key and a double-precision
  * scaled jump — both bit-reproducible across engines (the oracle
  * mirrors it with HUGEINT mod-2^64 and the same double divide). */
object JumpHash {
  final val Lcg = 2862933555777941757L

  def shard(key0: Long, buckets: Int): Long = {
    if (buckets <= 0)
      throw new IllegalArgumentException(s"buckets must be > 0: $buckets")
    var key = key0
    var b = -1L
    var j = 0L
    while (j < buckets) {
      b = j
      key = key * Lcg + 1L
      // (key >>> 33) treats the wrapped product as unsigned, per paper
      j = ((b + 1L) * (2147483648.0 / (((key >>> 33) + 1L).toDouble))).toLong
    }
    b
  }
}

/** Native `jump_shard(key, n)` — evaluates in the scan's generated
  * loop, so shard assignment of a full corpus is one map-side pass. */
case class JumpShardExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(LongType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "jump_shard"

  override def nullSafeEval(k: Any, n: Any): Any =
    java.lang.Long.valueOf(
      JumpHash.shard(k.asInstanceOf[Long], n.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n) => s"graft.cdc.JumpHash.shard($k, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All ordered index pairs (i < j) of a long array, packed
  * arr[i]·2³² + arr[j] — the market-basket 2-itemset fanout kernel
  * (q205). Replaces the `flatten(transform(items, (x, i) ->
  * transform(slice(items, i + 2, size(items)), y -> x·2³² + y)))`
  * higher-order chain, which evaluates INTERPRETED (lambda closures,
  * one allocated sub-array per element, plus the flatten copy);
  * this is one tight loop into a primitive long array inside
  * whole-stage codegen. The packing arithmetic (including overflow
  * wrap) is bit-identical to the expression it replaces. */
object PairPack {
  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  def apply(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i) * 4294967296L
      var j = i + 1
      while (j < n) {
        out(k) = x + a.getLong(j)
        k += 1
        j += 1
      }
      i += 1
    }
    // UnsafeArrayData, not GenericArrayData: the generic form wraps an
    // Object[] and BOXES every long on construction and again on each
    // downstream getLong — for a fanout expression the boxing was the
    // cost being removed in the first place.
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native `pair_pack(arr)` — elements must be non-null (callers feed
  * collect_set outputs, which never are). */
case class PairPackExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pair_pack"

  override def nullSafeEval(v: Any): Any =
    PairPack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.PairPack.apply($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Intersection size of two SORTED distinct long arrays — the
  * set-similarity verify kernel (q130's PPJoin candidate verify):
  * two-pointer merge count, no allocation. Callers guarantee sorted
  * distinct inputs (sort_array over per-doc distinct shingle sets);
  * on unsorted input the count is merely a lower bound, never an
  * error. */
object SortedInterCount {
  import org.apache.spark.sql.catalyst.util.ArrayData

  def apply(a: ArrayData, b: ArrayData): Long = {
    val (n, m) = (a.numElements(), b.numElements())
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Native `sorted_inter_count(a, b)`. */
case class SortedInterCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false),
      ArrayType(LongType, containsNull = false))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_inter_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(SortedInterCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.cdc.SortedInterCount.apply($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Structural JSON bracket-depth delta of one wal2json chunk frame —
  * the `write-in-chunks` reassembly kernel, shared verbatim by the
  * batch operator ([[CdcFunctions.wal2jsonReassembleChunks]]) and the
  * streaming one (`StreamOps.chunkDepthDelta`), so stream == batch
  * holds by construction. One pass, no allocation; replaces a
  * per-frame `regexp_replace("\"([^\"\\\\]|\\\\.)*\"", "")` +
  * 4× `translate` chain (the regex built the stripped string per
  * frame — the hot per-row cost of the q260/q264/q265 family).
  *
  * Semantics mirror the regex EXACTLY, including the degenerate
  * cases: a COMPLETE string literal (closing quote reachable through
  * `\x` escapes) is skipped wholesale; an UNTERMINATED literal's
  * opening quote is a plain character (the regex finds no match
  * there) and scanning continues at the next character, so brackets
  * after it still count. */
object JsonDepth {
  def delta(s: UTF8String): Long = delta(s.toString)

  def delta(p: String): Long = {
    val n = p.length
    var d = 0L
    var i = 0
    while (i < n) {
      val c = p.charAt(i)
      if (c == '"') {
        // try to complete a string literal: ([^"\]|\.)* then "
        var j = i + 1
        var closed = -1
        while (j < n && closed < 0) {
          val cj = p.charAt(j)
          if (cj == '"') closed = j
          else if (cj == '\\') j += 2
          else j += 1
        }
        if (closed >= 0) i = closed + 1 // strip the whole literal
        else i += 1 // no match starting here — '"' is a plain char
      } else {
        if (c == '{' || c == '[') d += 1
        else if (c == '}' || c == ']') d -= 1
        i += 1
      }
    }
    d
  }
}

/** Native `json_depth_delta(p)`. */
case class JsonDepthDeltaExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "json_depth_delta"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(JsonDepth.delta(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.JsonDepth.delta($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Longest repeated contiguous token window within one document —
  * the maximal k such that some k-token window occurs at two distinct
  * positions. Exact and allocation-lean: tokens intern to int ids,
  * then binary search on k (duplicate windows are downward-closed in
  * k) with a 64-bit polynomial rolling hash per level and an exact
  * id-sequence verify inside each hash bucket, so a hash collision
  * can never overstate the answer. Expected O(n log n) per document
  * vs the O(n^2) window materialization a pure-SQL formulation needs
  * (which is what the DuckDB oracle runs at test scale). */
object LongestRepeat {
  import org.apache.spark.sql.catalyst.util.ArrayData

  private final val B = 1000003L

  def apply(a: ArrayData): Long = {
    val n = a.numElements()
    if (n < 2) return 0L
    val ids = new Array[Int](n)
    val seen = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) ids(i) = -1 // all null elements compare equal
      else {
        val t = a.getUTF8String(i)
        val id = seen.get(t)
        if (id == null) {
          ids(i) = seen.size
          // clone: the UTF8String may view a shared row buffer
          seen.put(t.clone(), Integer.valueOf(seen.size))
        } else ids(i) = id.intValue()
      }
      i += 1
    }
    var lo = 0
    var hi = n - 1
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (hasDup(ids, mid)) lo = mid else hi = mid - 1
    }
    lo.toLong
  }

  /** Any k-window occurring twice? Rolling-hash buckets, then exact
    * compare of id runs within a bucket. */
  private def hasDup(x: Array[Int], k: Int): Boolean = {
    val n = x.length
    var powK = 1L // B^k for the roll-off term
    var i = 0
    while (i < k) { powK *= B; i += 1 }
    val buckets =
      new java.util.HashMap[java.lang.Long, java.util.ArrayList[Integer]]()
    var h = 0L
    var s = 0
    while (s < n) {
      h = h * B + x(s)
      if (s >= k) h -= powK * x(s - k)
      if (s >= k - 1) {
        val start = s - k + 1
        val key = java.lang.Long.valueOf(h)
        var lst = buckets.get(key)
        if (lst == null) { lst = new java.util.ArrayList[Integer](2); buckets.put(key, lst) }
        else {
          var j = 0
          while (j < lst.size()) {
            if (sameRun(x, lst.get(j).intValue(), start, k)) return true
            j += 1
          }
        }
        lst.add(Integer.valueOf(start))
      }
      s += 1
    }
    false
  }

  private def sameRun(x: Array[Int], p: Int, q: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      if (x(p + i) != x(q + i)) return false
      i += 1
    }
    true
  }
}

/** Native `longest_repeat(toks)` — evaluates per row inside codegen;
  * null elements (never produced by the tokenizers) all compare
  * equal to each other. */
case class LongestRepeatExpr(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  import org.apache.spark.sql.catalyst.util.ArrayData
  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "longest_repeat"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(LongestRepeat(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.LongestRepeat.apply($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
