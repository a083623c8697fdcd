package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The full-vocab BPE training loop (q304/q305/q306, r14 verdict
  * ask 5): merge determinism, the greedy-prefix property (a V-round
  * run's first k picks equal a k-round run's), early termination at
  * vocabulary exhaustion, and a diff of the distributed loop against
  * an independent driver-side reference implementing the defined
  * semantics (argmax by count desc then pair asc; the merge is two
  * passes of plain left-to-right non-overlapping replace on the
  * '|'-bounded string — the exact contract the DuckDB oracle
  * replays). */
class BpeTrainSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-bpe-train-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def base(words: Seq[(String, Long)]) = {
    val ss = spark
    import ss.implicits._
    words.toDF("word", "cnt")
      .select(concat(lit("|"),
        regexp_replace(col("word"), "(.)", "$1|")).as("s"), col("cnt"))
  }

  // ---- independent reference --------------------------------------

  /** Reference trainer on plain Scala strings — same state ('|'-
    * bounded), same argmax, same double-replace merge. Java's
    * String.replace is the left-to-right non-overlapping scan both
    * engines' replace() implements. */
  private def reference(words: Seq[(String, Long)], rounds: Int)
      : Seq[(Int, String, Long, Long)] = {
    var st = words.map { case (w, c) => ("|" + w.mkString("|") + "|", c) }
    val picks = Seq.newBuilder[(Int, String, Long, Long)]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      st.foreach { case (s, c) =>
        val seq = s.split("\\|").filter(_.nonEmpty)
        seq.sliding(2).filter(_.length == 2).foreach { p =>
          val k = p.mkString(" ")
          counts(k) = counts.getOrElse(k, 0L) + c
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, c) = counts.toSeq
          .minBy { case (p, n) => (-n, p) }
        val pat = "|" + pair.replace(" ", "|") + "|"
        val rep = "|" + pair.replace(" ", "") + "|"
        st = st.map { case (s, n) =>
          (s.replace(pat, rep).replace(pat, rep), n) }
        val toks = st.map { case (s, n) =>
          n * s.split("\\|").count(_.nonEmpty) }.sum
        picks += ((r, pair, c, toks))
      }
      r += 1
    }
    picks.result()
  }

  private val fixture: Seq[(String, Long)] = Seq(
    "banana" -> 7L, "bandana" -> 3L, "cabana" -> 2L,
    "aaaa" -> 5L,            // overlapping-run merge semantics
    "an" -> 11L, "a" -> 9L,  // single-symbol words count toward toks
    "nab" -> 4L, "ban" -> 6L)

  test("kernel fast path == reference on the fixture, all rounds") {
    val (_, picks) = Curation.bpeMergeRounds(base(fixture), 64)
    val ref = reference(fixture, 64)
    assert(picks == ref,
      s"loop vs reference:\n got $picks\n exp $ref")
    // the fixture's vocabulary exhausts well before 64 merges: the
    // loop must terminate early, not pad with empty rounds
    assert(picks.nonEmpty && picks.length < 64)
    graft.ops.Tables.dropTransientCaches()
  }

  test("distributed loop == reference == kernel on the fixture") {
    val (_, dist) = Curation.bpeMergeRoundsDistributed(base(fixture), 64)
    val ref = reference(fixture, 64)
    assert(dist == ref,
      s"distributed loop vs reference:\n got $dist\n exp $ref")
    val (_, fast) = Curation.bpeMergeRounds(base(fixture), 64)
    assert(fast == dist,
      s"kernel vs distributed loop:\n got $fast\n exp $dist")
    graft.ops.Tables.dropTransientCaches()
  }

  test("kernel == distributed loop on a multi-rider (lang) relation " +
      "with cross-lang duplicate words and overlap runs") {
    // same word under two langs: the kernel aggregates by s first;
    // pair counts must stay the lang-summed totals
    val ss = spark
    import ss.implicits._
    val langWords = Seq(
      ("en", "banana", 4L), ("de", "banana", 3L), ("en", "aaaa", 5L),
      ("de", "aaaaa", 2L), ("en", "ab", 7L), ("de", "ba", 1L))
    val b = langWords.toDF("lang", "word", "cnt")
      .select(col("lang"), concat(lit("|"),
        regexp_replace(col("word"), "(.)", "$1|")).as("s"), col("cnt"))
    val (_, dist) = Curation.bpeMergeRoundsDistributed(b, 32)
    val (_, fast) = Curation.bpeMergeRounds(b, 32)
    assert(fast == dist,
      s"kernel vs distributed loop (lang riders):\n got $fast\n exp $dist")
    graft.ops.Tables.dropTransientCaches()
  }

  test("determinism: two independent runs pick identical merges") {
    val (_, a) = Curation.bpeMergeRounds(base(fixture), 12)
    val (_, b) = Curation.bpeMergeRounds(base(fixture), 12)
    assert(a == b)
    graft.ops.Tables.dropTransientCaches()
  }

  test("greedy prefix property: a short run is a prefix of a long one") {
    val (_, short) = Curation.bpeMergeRounds(base(fixture), 3)
    val (_, long) = Curation.bpeMergeRounds(base(fixture), 10)
    assert(long.take(3) == short)
    graft.ops.Tables.dropTransientCaches()
  }

  test("a checkpoint-backed final round releases its blocks under " +
      "finalTransient and the replayed state is still exact") {
    // r15 advisor: when the LAST merge round lands on a multiple of 8
    // the loop's lineage cut leaves the final state checkpoint-backed
    // — blocks the per-query transient drop cannot release. The fix
    // hands back a LAZY pick-literal replay instead: assert (a) the
    // returned frame is NOT LogicalRDD-backed (nothing pinned), and
    // (b) it still computes the exact final state the reference
    // produces. The fixture runs >= 8 rounds, so rounds=8 lands the
    // final round exactly on the cut.
    val (fin, picks) = Curation.bpeMergeRoundsDistributed(base(fixture), 8,
      finalTransient = true)
    assert(picks.length == 8, "fixture must sustain 8 merge rounds")
    val checkpointBacked = fin.queryExecution.logical.find(
      _.getClass.getSimpleName == "LogicalRDD").isDefined
    assert(!checkpointBacked,
      "finalTransient result must not be checkpoint-backed (pinned " +
        "executor blocks the transient drop cannot release)")
    // exactness: replayed final state == reference's 8-round state
    var ref = fixture.map { case (w, c) => ("|" + w.mkString("|") + "|", c) }
    reference(fixture, 8).foreach { case (_, pair, _, _) =>
      val pat = "|" + pair.replace(" ", "|") + "|"
      val rep = "|" + pair.replace(" ", "") + "|"
      ref = ref.map { case (s, n) => (s.replace(pat, rep).replace(pat, rep), n) }
    }
    val got = fin.select(col("s"), col("cnt")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == ref.sorted,
      s"replayed final state diverged\n got $got\n exp ${ref.sorted}")
    graft.ops.Tables.dropTransientCaches()
  }

  test("exhaustion: the final state is one symbol per word and the " +
      "token total equals the instance total") {
    val tiny = Seq("ab" -> 3L, "ba" -> 2L, "b" -> 1L)
    val (fin, picks) = Curation.bpeMergeRounds(base(tiny), 32)
    val rows = fin.select(Curation.bpeSeqCol.as("seq"), col("cnt"))
      .collect()
    assert(rows.forall(_.getSeq[String](0).length == 1),
      "every word must be fully merged at exhaustion")
    assert(picks.last._4 == tiny.map(_._2).sum,
      "final corpus_toks must equal the word-instance total")
    graft.ops.Tables.dropTransientCaches()
  }
}
