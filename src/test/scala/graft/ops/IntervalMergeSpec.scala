package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Property test for [[Text.mergeIntervals]] (q127's distributed
  * interval merge): on arbitrary half-open interval sets across
  * multiple partition keys, the merged spans must equal a sequential
  * sweep-line reference — same span bounds, no overlap, no
  * double-counted coverage — regardless of input order or partition
  * count. */
class IntervalMergeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-interval-merge-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  // each property case runs a real Spark job — cap the sample count
  private def check(p: Prop): Unit = {
    val res = ScTest.check(ScTest.Parameters.default
      .withMinSuccessfulTests(12), p)
    assert(res.passed, res.status.toString)
  }

  /** Sequential reference: sort by start, sweep. The query's gap
    * predicate is strict (`s > maxEnd` opens a new span), so touching
    * half-open intervals MERGE: [1,3) + [3,5) → [1,5) — adjacent
    * duplicated runs form one span. */
  private def reference(iv: Seq[(Long, Long)]): Seq[(Long, Long)] = {
    val sorted = iv.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    for ((s, e) <- sorted) {
      if (out.nonEmpty && s <= out.last._2)
        out(out.length - 1) = (out.last._1, math.max(out.last._2, e))
      else out += ((s, e))
    }
    out.toSeq
  }

  private val genIntervals: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(60, for {
      part <- Gen.choose(0L, 3L)
      s <- Gen.choose(0L, 40L)
      len <- Gen.choose(1L, 9L)
    } yield (part, s, s + len))

  private def merged(iv: List[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    Text.mergeIntervals(iv.toDF("part", "s", "e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("merged spans equal the sweep-line reference on arbitrary input") {
    check(Prop.forAll(genIntervals) { iv0 =>
      // distinct starts per key: q127 feeds distinct (doc, pos) rows,
      // so the window's (part, s) order is total
      val iv = iv0.groupBy(x => (x._1, x._2)).values.map(_.head).toList
      val want = iv.groupBy(_._1).toSeq.flatMap { case (p, xs) =>
        reference(xs.map(x => (x._2, x._3)))
          .map { case (ss, se) => (p, ss, se) }
      }
      merged(iv).sorted == want.sorted
    })
  }

  test("empty input merges to empty output") {
    val s = spark
    import s.implicits._
    assert(Text.mergeIntervals(
      Seq.empty[(Long, Long, Long)].toDF("part", "s", "e")).count() == 0)
  }

  test("merged spans are disjoint with a strict gap between them") {
    check(Prop.forAll(genIntervals) { iv0 =>
      val iv = iv0.groupBy(x => (x._1, x._2)).values.map(_.head).toList
      merged(iv).groupBy(_._1).values.forall { xs =>
        xs.toSeq.sortBy(_._2).sliding(2).forall {
          case Seq((_, _, e1), (_, s2, _)) => s2 > e1
          case _ => true
        }
      }
    })
  }
}
