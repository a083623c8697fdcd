package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the q27 simhash pipeline. */
object ProfileQ27 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.cdc.GraftFunctions.register(spark)

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    time("withToks")(Text.withToks(spark, sfDir).count())
    val th = Text.withToks(spark, sfDir)
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"),
        graft.cdc.GraftFunctions.md5_h32(col("tok")).as("h32"))
    time("th")(th.count())
    val sums = th.groupBy(col("doc_id")).agg(
      expr("CAST(sum(2 * ((h32 >> 0) & 1) - 1) AS BIGINT)").as("s0"),
      (1 until 32).map(i =>
        expr(s"CAST(sum(2 * ((h32 >> $i) & 1) - 1) AS BIGINT)").as(s"s$i")): _*)
    time("sums")(sums.count())
    val sim = sums.select(col("doc_id"),
      (0 until 32).map(i =>
        when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    time("sim")(sim.count())
    val bands = sim.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), 8 * b).bitwiseAND(255)): _*))
        .as(Seq("band", "bkey")))
    val ba = bands.select(col("doc_id").as("d1"), col("simhash").as("sh1"),
      col("band"), col("bkey"))
    val bb = bands.select(col("doc_id").as("d2"), col("simhash").as("sh2"),
      col("band"), col("bkey"))
    val joined = ba.join(bb, Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
    time("band-join")(joined.count())
    time("distinct")(joined
      .select(col("d1"), col("sh1"), col("d2"), col("sh2")).distinct().count())
    time("q27 full")(
      graft.SparkEntry.queries("q27_simhash_hamming_pairs")(spark, sfDir).count())
    time("q27 again")(
      graft.SparkEntry.queries("q27_simhash_hamming_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
