package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Cross-checks q142 (bigram-LM fluency proxy) and q143 (quality-vs-
  * duplication calibration) against independent in-memory models at
  * sf0.001. Both queries are pure integer arithmetic, so the checks
  * are exact equality, not tolerance bands. */
class FluencyCalibrationSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-fluency-calibration-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def toksByDoc(): Array[(Long, String, Seq[String])] = {
    import org.apache.spark.sql.functions._
    Text.withToks(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
  }

  test("q142: per-lang fluency matches a brute-force bigram model") {
    val docs = toksByDoc()
    val pairs = docs.flatMap { case (id, lang, ts) =>
      ts.sliding(2).filter(_.size == 2).map(p => (id, lang, p(0), p(1)))
    }
    val c2 = pairs.groupBy(p => (p._3, p._4)).map { case (k, o) =>
      k -> o.length.toLong
    }
    val c1 = pairs.groupBy(_._3).map { case (k, o) => k -> o.length.toLong }
    val pppm = c2.map { case ((t1, t2), c) =>
      (t1, t2) -> c * 1000000L / c1(t1)
    }
    val perDoc = pairs.groupBy(p => (p._1, p._2)).toSeq.map {
      case ((_, lang), o) =>
        val ps = o.map(p => pppm((p._3, p._4)))
        (lang, ps.sum / ps.length)
    }
    val expected = perDoc.groupBy(_._1).map { case (lang, fs) =>
      val v = fs.map(_._2).toSeq
      lang -> (v.length.toLong, v.sum / v.length, v.min, v.max)
    }
    val got = graft.SparkEntry.queries("q142_bigram_fluency")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
  }

  test("q142: fluency scores are valid mean probabilities (bounded)") {
    val rows = graft.SparkEntry.queries("q142_bigram_fluency")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avg, mn, mx) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // every conditional probability is in (0, 1]: ppm in (0, 1e6]
      assert(mn > 0L && mx <= 1000000L)
      assert(mn <= avg && avg <= mx)
    }
  }

  test("q143: bucket dup rates match a brute-force model") {
    val docs = toksByDoc().filter(_._3.nonEmpty)
    val fp = docs.map { case (id, _, ts) => id -> ts.mkString(" ") }
    val dupKeys = fp.groupBy(_._2).filter(_._2.length > 1).keySet
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it")
    val expected = docs.map { case (id, _, ts) =>
      val n = ts.length.toLong
      val q = math.floor(10000.0 * (0.4 * math.min(1.0, n / 100.0)
        + 0.3 * (1.0 - ts.count(stop) * 1.0 / n)
        + 0.3 * (ts.distinct.length * 1.0 / n))).toLong
      val isDup = dupKeys.contains(ts.mkString(" "))
      (q / 1000L, if (isDup) 1L else 0L)
    }.groupBy(_._1).map { case (b, o) =>
      val dups = o.map(_._2).sum
      b -> (o.length.toLong, dups, dups * 1000000L / o.length)
    }
    val got = graft.SparkEntry.queries("q143_quality_dup_calibration")(
      spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
    // docs partition across buckets exactly once
    assert(got.values.map(_._1).sum == docs.length.toLong)
  }

  test("q144: split-leakage counts match a brute-force model") {
    def h32(x: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = toksByDoc().filter(_._3.nonEmpty)
    val rows = docs.map { case (id, _, ts) =>
      val split = h32(id.toString) % 100 match {
        case b if b < 80 => "train"
        case b if b < 90 => "val"
        case _           => "test"
      }
      (split, ts.mkString(" "))
    }
    val byFp = rows.groupBy(_._2)
    val expected = rows.groupBy(_._1).map { case (split, o) =>
      val dup = o.count(r => byFp(r._2).length > 1).toLong
      val leak = o.count(r => byFp(r._2).map(_._1).distinct.length > 1)
        .toLong
      split -> (o.length.toLong, dup, leak, leak * 1000000L / o.length)
    }
    val got = graft.SparkEntry.queries("q144_split_leakage")(spark, sfDir)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    // leaked docs are a subset of duplicated docs in every split
    got.values.foreach { case (_, dup, leak, _) => assert(leak <= dup) }
  }
}
