package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks for q140 (source-pair minhash similarity) and q141
  * (fixed-vocab OOV audit) against independent models at sf0.001.
  *
  * q140's load-bearing claim is MERGEABILITY: the source-level sketch
  * (min over the source's shingle stream) must equal the min over its
  * per-document signatures — the identity that lets partial sketches
  * reduce without re-reading shingles. That is exact, not
  * approximate, so it is asserted with equality. The estimate column
  * is then checked against the exact source-pair Jaccard only for
  * boundedness (both are in [0, 10000]), not closeness — 16
  * permutations is an audit sketch, not a precision instrument. */
class SourceSimilaritySpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-source-similarity-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q140: source sketch = min over per-doc signatures (mergeable)") {
    import org.apache.spark.sql.functions._
    // per-doc 16-perm signatures, tagged with source
    val docSig = Text.minhashSig(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(min(col("h0")).as("m0"),
        (1 until 16).map(j => min(col(s"h$j")).as(s"m$j")): _*)
      .collect()
      .map(r => r.getString(0) -> (0 until 16).map(j => r.getLong(j + 1)))
      .toMap
    // source-level sketch recomputed the q140 way (min over stream)
    val ssh = Text.shingleHashes(spark, sfDir)
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(min((lit(Text.minhashA(0)) * col("h") + lit(Text.minhashB(0)))
          % 2147483647L).as("h0"),
        (1 until 16).map(j =>
          min((lit(Text.minhashA(j)) * col("h") + lit(Text.minhashB(j)))
            % 2147483647L).as(s"h$j")): _*)
      .collect()
      .map(r => r.getString(0) -> (0 until 16).map(j => r.getLong(j + 1)))
      .toMap
    assert(docSig.keySet == ssh.keySet)
    docSig.foreach { case (src, sig) =>
      assert(sig == ssh(src), s"sketch-union identity broken for $src")
    }
  }

  test("q140: pair matrix is the full triangle with bounded estimates") {
    val rows = graft.SparkEntry.queries("q140_source_similarity")(
      spark, sfDir).collect()
    val nSources = rows.map(_.getString(0)).toSet
      .union(rows.map(_.getString(1)).toSet).size
    assert(rows.length == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val (agree, est) = (r.getLong(2), r.getLong(3))
      assert(agree >= 0L && agree <= 16L)
      assert(est == agree * 625L)
      assert(r.getString(0) < r.getString(1))
    }
  }

  test("q146: sweep is monotone and anchored to the 0.6 pair graph") {
    import org.apache.spark.sql.functions._
    val rows = graft.SparkEntry.queries("q146_dedup_threshold_sweep")(
      spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq ==
      Seq(6000L, 6500L, 7000L, 7500L, 8000L, 8500L, 9000L))
    // non-increasing in the threshold, for pairs and docs alike
    rows.sliding(2).foreach { case Array((_, p1, d1), (_, p2, d2)) =>
      assert(p2 <= p1 && d2 <= d1)
    }
    // the 0.60 row IS the memoized pair graph: every pair in the graph
    // clears the graph's own prune bound
    val g = Text.jaccardPairs(spark, sfDir)
    assert(rows.head._2 == g.count())
    assert(rows.head._3 == g.select(col("d1")).unionAll(g.select(col("d2")))
      .distinct().count())
  }

  test("q141: OOV rates match a brute-force vocab model") {
    import org.apache.spark.sql.functions._
    val perDoc = Text.withToks(spark, sfDir)
      .select(col("lang"), col("toks"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    val counts = perDoc.flatMap(_._2).groupBy(identity)
      .map { case (t, o) => (t, o.length.toLong) }
    // top 256 by (count desc, token asc) — the query's total order
    val vocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(256).map(_._1).toSet
    val expected = perDoc.filter(_._2.nonEmpty).groupBy(_._1).map {
      case (lang, ds) =>
        val toks = ds.flatMap(_._2)
        val oov = toks.count(t => !vocab.contains(t)).toLong
        (lang, (toks.length.toLong, oov,
          oov * 1000000L / toks.length.toLong))
    }
    val got = graft.SparkEntry.queries("q141_vocab_oov")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
  }
}
