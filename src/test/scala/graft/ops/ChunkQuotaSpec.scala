package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Independent cross-checks for the q138 source-quota cap and the q139
  * sliding-window chunker, against brute-force Scala models computed
  * from the same tokenization (collected once at sf0.001, 500 docs).
  * The oracle gate already proves DuckDB equivalence; these pin the
  * SEMANTICS — chunk geometry (64-token windows, stride 48, final
  * partial window kept) and quota conservation (kept + dropped = all)
  * — against a reimplementation that shares no Spark code with the
  * queries. */
class ChunkQuotaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-chunk-quota-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (lang, n_toks) per document, from the shared tokenizer. */
  private lazy val docs: Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    Text.withToks(spark, sfDir)
      .select(col("lang"), size(col("toks")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Brute-force chunker: slide a 64-token window by 48 until it
    * covers the tail — no closed-form chunk count anywhere. */
  private def chunks(n: Long): Seq[Long] = {
    require(n > 0)
    val b = Seq.newBuilder[Long]
    var s = 0L
    var done = false
    while (!done) {
      b += math.min(64L, n - s)
      if (s + 64L >= n) done = true else s += 48L
    }
    b.result()
  }

  test("q139: chunk counts and token sums match the brute-force model") {
    val expected = docs.filter(_._2 > 0).groupBy(_._1).map {
      case (lang, ds) =>
        val all = ds.map(d => chunks(d._2))
        (lang, (ds.size.toLong, all.map(_.size.toLong).sum,
          all.map(_.sum).sum, all.map(_.sum).sum - ds.map(_._2).sum))
    }
    val got = graft.SparkEntry.queries("q139_overlap_chunking")(spark, sfDir)
      .collect().map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
  }

  test("q139: brute-force chunker itself is sane on edge lengths") {
    assert(chunks(1L) == Seq(1L))      // tiny doc: one short window
    assert(chunks(64L) == Seq(64L))    // exact fit: one full window
    assert(chunks(65L) == Seq(64L, 17L)) // one token past: overlap tail
    assert(chunks(112L) == Seq(64L, 64L)) // 48+64: two full windows
    assert(chunks(113L) == Seq(64L, 64L, 17L))
    // every token covered: last window reaches n
    for (n <- 1L to 400L) {
      val cs = chunks(n)
      assert(cs.forall(c => c >= 1L && c <= 64L))
      val lastStart = (cs.size - 1).toLong * 48L
      assert(lastStart + cs.last == n, s"n=$n uncovered tail")
    }
  }

  test("q138: quota conserves token mass and caps at 15 per source") {
    import org.apache.spark.sql.functions._
    val perSource = Text.withToks(spark, sfDir)
      .filter(size(col("toks")) > 0)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(size(col("toks")).cast("long")).as("t"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    val got = graft.SparkEntry.queries("q138_source_quota")(spark, sfDir)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (src, nDocs, nKept, kept, dropped) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val (expN, expT) = perSource(src)
      assert(nDocs == expN, s"$src doc count")
      assert(nKept == math.min(15L, expN), s"$src cap")
      assert(kept + dropped == expT, s"$src token conservation")
      assert(nDocs > 15L || dropped == 0L, s"$src under-cap must drop 0")
    }
    assert(got.map(_.getString(0)).toSet == perSource.keySet)
  }
}
