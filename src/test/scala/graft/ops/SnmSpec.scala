package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The q194 sorted-neighborhood kernel's correctness claim is subtle:
  * bucket-partitioned windows + an edge zone produce EXACTLY the
  * pairs within global rank distance w-1 of the (key, doc_id) order,
  * with no global sort — including when pairs span entire interior
  * buckets. This spec brute-forces the global order on randomized
  * key distributions engineered to stress every regime: uniform
  * buckets, 1-row buckets (every pair crosses boundaries), empty
  * buckets between occupied ones, duplicate keys (tie-break on
  * doc_id), and a single giant bucket (no boundary at all).
  */
class SnmSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-snm-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def bruteForce(rows: Seq[(Long, String)], w: Int)
      : Set[(Long, Long)] = {
    val sorted = rows.sortBy { case (id, k) => (k, id) }
    (for {
      i <- sorted.indices
      j <- (i + 1) until math.min(i + w, sorted.size)
    } yield {
      val (a, b) = (sorted(i)._1, sorted(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
  }

  private def engine(rows: Seq[(Long, String)], w: Int)
      : Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val base = rows.toDF("doc_id", "key")
      .withColumn("bucket", substring(col("key"), 1, 1))
    Analytics.snmCandidates(base, w)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def check(rows: Seq[(Long, String)], w: Int, label: String)
      : Unit = {
    val exp = bruteForce(rows, w)
    val got = engine(rows, w)
    assert(got == exp,
      s"$label: missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("random keys over a tiny alphabet (1-2 row buckets) match brute force") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 10 + rnd.nextInt(40)
      val rows = (0L until n).map(i =>
        i -> (('a' + rnd.nextInt(12)).toChar.toString +
          rnd.nextInt(3).toString))
      check(rows, 4, s"trial $trial")
    }
  }

  test("sparse buckets: pairs spanning whole interior buckets are found") {
    // buckets a(1 row), b(1 row), c(1 row): a-c is distance 2 and
    // crosses TWO boundaries — the interior bucket is entirely zone
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d",
      5L -> "e")
    check(rows, 4, "singleton buckets")
  }

  test("duplicate keys tie-break on doc_id") {
    val rows = Seq(5L -> "k", 1L -> "k", 3L -> "k", 2L -> "k",
      9L -> "k", 7L -> "m")
    check(rows, 4, "duplicate keys")
  }

  test("single giant bucket (no boundary) and w variations") {
    val rnd = new Random(7)
    val rows = (0L until 30L).map(i => i -> ("z" + rnd.nextInt(100)))
    for (w <- Seq(2, 3, 4, 6)) check(rows, w, s"w=$w")
  }

  test("alternating occupied/empty key space") {
    val rows = (0L until 20L).map(i =>
      i -> (('a' + 2 * (i % 8)).toChar.toString + (i / 8).toString))
    check(rows, 4, "gapped buckets")
  }
}
