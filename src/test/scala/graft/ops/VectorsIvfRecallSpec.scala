package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q191's semantic arm runs on the trained IVF index; q239 is its
  * safety gauge. This spec pins the two contracts the r10 verdict
  * asked for:
  *
  *  1. EXACTNESS at full coverage — ivfSemanticTop(nprobe = k) must
  *     be bit-identical to the brute-force scan it replaced (the
  *     q191 oracle stays the brute-force SQL, so any drift here is a
  *     silent hash mismatch waiting for the driver).
  *  2. RECALL at the pruned setting — the fused recall@5 that q239
  *     reports must average ≥ 95% (mean across the 20 queries), the
  *     bar a deployment holds the nprobe knob to.
  */
class VectorsIvfRecallSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ivf-recall-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("full-coverage nprobe reproduces the brute-force semantic top-10") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val nn = Vectors.prepared(spark, sfDir)
      .select(col("vec_id"), col("v"), col("nrm"))
    val qv = nn.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("v").as("qv"),
        col("nrm").as("qn"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("cid"))
    val brute = nn.crossJoin(broadcast(qv))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("cid"),
        round(graft.cdc.GraftFunctions.vec_dot(col("qv"), col("v")) /
          (sqrt(col("qn")) * sqrt(col("nrm"))), 6).as("score"))
      .withColumn("ra", row_number().over(w))
      .filter(col("ra") <= 10)
      .select(col("qid"), col("cid"), col("ra"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivf = Vectors.ivfSemanticTop(spark, sfDir, nprobe = 8, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(ivf == brute,
      s"full-coverage IVF diverged from brute force: " +
        s"only-ivf=${(ivf -- brute).take(5)} only-brute=${(brute -- ivf).take(5)}")
  }

  test("q239 fused recall@5 at nprobe = 5 averages >= 95%") {
    val rows = graft.SparkEntry.queries("q239_hybrid_ivf_recall")(
      spark, sfDir).collect()
    assert(rows.length == 20, s"expected 20 query rows, got ${rows.length}")
    val mean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    assert(mean >= 95.0, s"fused recall mean $mean < 95")
  }
}
