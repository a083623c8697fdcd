package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The r17 gram8 memo fusion: the session memo derives the distinct
  * per-doc 8-gram hashes from the POSITIONAL index (which already
  * md5-hashes every 8-gram position) instead of re-hashing the corpus
  * through [[Text.gram8OfToks]]. This spec pins the set equality of
  * the two constructions on the real sf0.001 corpus — the contract
  * that lets the contamination family (q231/q262/q267/q268/q273) ride
  * the fused memo while fixtures and the streaming probe keep the
  * shared gram8OfToks builder. */
class Gram8FusionSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sf = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-gram8-fusion-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.cdc.GraftFunctions.register(spark)
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("fused gram8 memo == gram8OfToks over the corpus") {
    val memo = Text.gram8Hashes(spark, sf)
      .select(col("doc_id"), col("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = Text.gram8OfToks(Text.withToks(spark, sf))
      .select(col("doc_id"), col("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(memo.nonEmpty, "corpus must yield 8-grams")
    assert(memo == direct,
      s"fused memo diverges: memo-only=${(memo -- direct).take(5)} " +
        s"direct-only=${(direct -- memo).take(5)}")
  }

  test("positional hash == 8-argument concat hash per position") {
    // the fusion's core claim: concat_ws over slice(toks, i, 8) is
    // character-identical to the 8-argument concat_ws
    val ss = spark; import ss.implicits._
    val toks = Seq((1L, (1 to 12).map(i => s"t$i"))).toDF("doc_id", "toks")
    val viaSlice = Text.posIndexOfToks(toks)
      .select(col("h")).collect().map(_.getLong(0)).toSet
    val viaArgs = Text.gram8OfToks(toks)
      .select(col("g")).collect().map(_.getLong(0)).toSet
    assert(viaSlice == viaArgs)
  }
}
