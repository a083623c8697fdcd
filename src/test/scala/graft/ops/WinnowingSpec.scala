package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The winnowing guarantee (Schleimer/Wilkerson/Aiken 2003, thm 1):
  * with gram size k and window size w, ANY shared token run of at
  * least w + k - 1 tokens produces at least one shared fingerprint —
  * the property q148 relies on to never miss a long-enough clone,
  * wherever it sits in either document. Checked here over seeded
  * random corpora: a common 6-token run is planted at a random offset
  * inside otherwise-disjoint token streams (disjoint alphabets, so no
  * accidental gram collisions), and the Spark-side selection from
  * Curation.winnowFingerprints must intersect for every planted pair
  * and stay empty for unplanted control pairs. */
class WinnowingSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-winnowing-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** doc tokens: `pad` unique filler tokens with a planted run at
    * `at` (filler alphabets are disjoint per doc via the prefix). */
  private def doc(prefix: String, n: Int, run: Seq[String], at: Int)
      : Seq[String] = {
    val filler = (0 until n).map(i => s"$prefix$i")
    filler.take(at) ++ run ++ filler.drop(at)
  }

  test("docs sharing a >= w+k-1 token run share a fingerprint") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val run = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (0 until 20).map { i =>
      (i.toLong, doc(s"d$i-", 30, run, rnd.nextInt(25)))
    } :+ (99L, (0 until 30).map(i => s"c$i"))   // control: no run
    val fps = Curation.winnowFingerprints(
        docs.toDF("doc_id", "toks"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    for (i <- 0 until 20; j <- (i + 1) until 20)
      assert((fps(i.toLong) & fps(j.toLong)).nonEmpty,
        s"docs $i and $j share a 6-token run but no fingerprint")
    for (i <- 0 until 20)
      assert((fps(i.toLong) & fps(99L)).isEmpty,
        s"control doc shares a fingerprint with doc $i")
  }

  test("fingerprints are position-robust: shifting a doc preserves " +
    "the planted run's fingerprint overlap") {
    val s = spark
    import s.implicits._
    val run = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = Seq(
      (1L, doc("a-", 40, run, 0)),    // run at the very start
      (2L, doc("b-", 40, run, 40)),   // run at the very end
      (3L, doc("c-", 40, run, 17)))   // run mid-document
    val fps = Curation.winnowFingerprints(docs.toDF("doc_id", "toks"))
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty)
    assert((fps(1L) & fps(3L)).nonEmpty)
    assert((fps(2L) & fps(3L)).nonEmpty)
  }
}
