package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q303's kernel against brute force (r14 verdict ask 4): the
  * diagonal-run span extractor ([[Curation.exactSubstrSpansOf]]) must
  * return, per anchored pair, EXACTLY the longest common token
  * substring a quadratic DP finds — including its position tie-break
  * (span desc, s1 asc, s2 asc) — on planted fixtures (known spans,
  * equal-length ties, in-doc repetition, the df > 10 boilerplate
  * anchor exclusion) and on a seeded randomized corpus with planted
  * clones. The brute force is an independent algorithm: classic
  * O(n·m) suffix DP over raw token arrays, no grams, no hashing.
  */
class ExactSubstrSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-exact-substr-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // ---- independent brute force ------------------------------------

  /** Longest common token substring of two docs by suffix DP;
    * returns (len, s1, s2) with 1-based starts, tie-break
    * (len max, s1 min, s2 min). (0,0,0) when nothing shared. */
  private def lcsSub(a: Array[String], b: Array[String])
      : (Int, Int, Int) = {
    var best = (0, 0, 0)
    val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length) {
      if (a(i - 1) == b(j - 1)) {
        dp(i)(j) = dp(i - 1)(j - 1) + 1
        val len = dp(i)(j)
        val cand = (len, i - len + 1, j - len + 1)
        if (len > best._1 ||
          (len == best._1 &&
            (cand._2 < best._2 ||
              (cand._2 == best._2 && cand._3 < best._3)))) best = cand
      }
    }
    best
  }

  /** The full q303 semantics in plain Scala: anchored candidate pairs
    * (docs sharing an 8-gram whose doc-frequency over the WHOLE
    * corpus is in [2, 10]) → per pair the DP maximum, kept if ≥ 8. */
  private def bruteForce(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)
    }.toMap
    val grams: Map[Long, Set[String]] = toks.map { case (id, ts) =>
      id -> (if (ts.length < 8) Set.empty[String]
             else ts.sliding(8).map(_.mkString(" ")).toSet)
    }
    val df = grams.values.flatten.groupBy(identity)
      .map { case (g, occ) => g -> occ.size }
    val anchors = df.collect {
      case (g, n) if n >= 2 && n <= 10 => g
    }.toSet
    val ids = docs.map(_._1).sorted
    for {
      i <- ids.indices; j <- (i + 1) until ids.length
      d1 = ids(i); d2 = ids(j)
      if grams(d1).intersect(grams(d2)).exists(anchors.contains)
      (len, s1, s2) = lcsSub(toks(d1), toks(d2))
      if len >= 8
    } yield (d1, d2, len.toLong, s1.toLong, s2.toLong)
  }

  private def kernel(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val ss = spark
    import ss.implicits._
    val toks = docs.toDF("doc_id", "text")
      .select(col("doc_id"), Text.toksCol.as("toks"))
    val pos = Text.posIndexOfToks(toks)
    val dfRel = pos.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    Curation.exactSubstrSpansOf(pos, dfRel, toks)
      .orderBy(col("d1"), col("d2"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
  }

  private def diff(docs: Seq[(Long, String)]): Unit = {
    val expected = bruteForce(docs).sortBy(t => (t._1, t._2))
    val got = kernel(docs)
    assert(got == expected,
      s"kernel vs brute force diverged\n got: $got\n exp: $expected")
  }

  /** Alphabetic-only tokens (digits would be split by the [^a-z]
    * tokenizer): the integer id renders as base-26 letters. */
  private def alpha(i: Int): String =
    i.toString.map(c => ('a' + (c - '0')).toChar).mkString

  private def words(r: scala.util.Random, n: Int, vocab: Int)
      : Seq[String] =
    Seq.fill(n)("w" + alpha(r.nextInt(vocab)))

  test("planted spans, ties, repetition: kernel == brute force") {
    def run(ts: Seq[String]): String = ts.mkString(" ")
    val r = new scala.util.Random(43)
    val shared12 = words(r, 12, 1000).map(_ + "s")
    val shared15 = words(r, 15, 1000).map(_ + "t")
    val shared9 = words(r, 9, 1000).map(_ + "u")
    val shared8 = words(r, 8, 1000).map(_ + "v")
    def filler(n: Int, tag: String) = words(r, n, 100000).map(_ + tag)
    val docs = Seq(
      // A/B: one 12-token span at different offsets
      1L -> run(filler(5, "a") ++ shared12 ++ filler(7, "b")),
      2L -> run(filler(11, "c") ++ shared12 ++ filler(3, "d")),
      // C/D: 9-token and 15-token spans -> max 15
      3L -> run(shared9 ++ filler(6, "e") ++ shared15),
      4L -> run(shared15 ++ filler(4, "f") ++ shared9),
      // E/F: exactly 8 shared tokens (the contract's lower edge)
      5L -> run(filler(9, "g") ++ shared8),
      6L -> run(shared8 ++ filler(9, "h")),
      // I/J: in-doc repetition — the span repeats inside doc 7, so
      // several diagonals carry maximal runs; position tie-break
      7L -> run(shared12 ++ filler(2, "i") ++ shared12),
      8L -> run(filler(3, "j") ++ shared12 ++ filler(1, "k")))
    diff(docs)
  }

  test("boilerplate anchors (df > 10) do not form candidate pairs") {
    val r = new scala.util.Random(44)
    val boiler = words(r, 10, 1000).map(_ + "bl")
    // 12 docs all share ONLY the boilerplate run: every shared gram
    // has df = 12 > 10, so no pair is anchored and output is empty
    val docs = (1L to 12L).map(i =>
      i -> (words(r, 5, 100000).map(_ + "x" + alpha(i.toInt)) ++ boiler ++
        words(r, 5, 100000).map(_ + "y" + alpha(i.toInt))).mkString(" "))
    assert(bruteForce(docs).isEmpty)
    assert(kernel(docs).isEmpty)
    diff(docs)
  }

  test("seeded randomized corpus with planted clones: kernel == " +
      "brute force") {
    val r = new scala.util.Random(45)
    // 16 base docs over a tiny vocab (natural short matches), then
    // plant clone slices of random length 8..30 across random pairs
    val base = (1L to 16L).map(i => i -> words(r, 60, 40).toArray).toMap
    val docs = scala.collection.mutable.Map(base.toSeq: _*)
    for (_ <- 0 until 10) {
      val src = 1L + r.nextInt(16)
      val dst = 1L + r.nextInt(16)
      if (src != dst) {
        val len = 8 + r.nextInt(23)
        val from = r.nextInt(math.max(1, docs(src).length - len))
        val slice = docs(src).slice(from, from + len)
        val at = r.nextInt(docs(dst).length)
        docs(dst) = docs(dst).patch(at, slice, 0)
      }
    }
    diff(docs.toSeq.sortBy(_._1).map { case (id, ts) =>
      id -> ts.mkString(" ") })
  }

  test("scrub census (q308) == independent removal over brute-force " +
      "spans") {
    // same seeded clone corpus as above (different seed), with a
    // 3-way source split; the scrub contract: for each pair's maximal
    // span >= minSpan, the d2-side occurrence's positions are
    // removed, position-unioned per doc — diffed against a plain
    // Scala removal over the INDEPENDENT brute-force span table
    val r = new scala.util.Random(46)
    val base = (1L to 16L).map(i => i -> words(r, 60, 40).toArray).toMap
    val mdocs = scala.collection.mutable.Map(base.toSeq: _*)
    for (_ <- 0 until 12) {
      val src = 1L + r.nextInt(16)
      val dst = 1L + r.nextInt(16)
      if (src != dst) {
        val len = 8 + r.nextInt(23)
        val from = r.nextInt(math.max(1, mdocs(src).length - len))
        val slice = mdocs(src).slice(from, from + len)
        val at = r.nextInt(mdocs(dst).length)
        mdocs(dst) = mdocs(dst).patch(at, slice, 0)
      }
    }
    val docSeq = mdocs.toSeq.sortBy(_._1).map { case (id, ts) =>
      id -> ts.mkString(" ") }
    val srcOf = (id: Long) => "s" + (id % 3)
    val minSpan = 8L

    // expected census, in plain Scala off the brute-force spans
    val rmPos: Map[Long, Set[Long]] = bruteForce(docSeq)
      .filter(_._3 >= minSpan)
      .flatMap { case (_, d2, len, _, s2) =>
        (s2 until s2 + len).map(d2 -> _) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val toksOf = docSeq.map { case (id, t) =>
      id -> t.toLowerCase.split("[^a-z]+").filter(_.nonEmpty) }.toMap
    val expected = docSeq.map(_._1).filter(toksOf(_).length >= 8)
      .groupBy(srcOf).toSeq.map { case (src, ids) =>
        val before = ids.map(toksOf(_).length.toLong).sum
        val removed = ids.map(id =>
          rmPos.getOrElse(id, Set.empty).size.toLong).sum
        (src, ids.size.toLong,
          ids.count(id => rmPos.getOrElse(id, Set.empty).nonEmpty).toLong,
          before, removed, removed * 1000L / before)
      }.sortBy(_._1)

    // kernel path: the q308 composition
    val ss = spark
    import ss.implicits._
    val toks = docSeq.toDF("doc_id", "text")
      .select(col("doc_id"),
        concat(lit("s"), pmod(col("doc_id"), lit(3L))).as("source"),
        Text.toksCol.as("toks"))
    val pos = Text.posIndexOfToks(toks.select(col("doc_id"), col("toks")))
    val dfRel = pos.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val spans = Curation.exactSubstrSpansOf(pos, dfRel,
      toks.select(col("doc_id"), col("toks")))
    val got = Curation.exactSubstrScrub(spans,
      toks.filter(size(col("toks")) >= 8), minSpan)
      .orderBy(col("source")).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getLong(2),
        row.getLong(3), row.getLong(4), row.getLong(5))).toSeq
    assert(got == expected,
      s"scrub census diverged\n got: $got\n exp: $expected")
    // sanity: the planted clones must actually exercise the removal
    assert(expected.map(_._5).sum > 0, "fixture planted no removals")
  }
}
