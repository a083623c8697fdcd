package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing of q205's basket-pair mining: parquet scan vs the
  * per-order collect_set collapse vs the in-basket pair expansion +
  * count — which of the three owns the ~2 s steady state at sf0.1. */
object ProfileQ205 {
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
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"))
    time("lineitem scan")(li.count())
    time("lineitem scan (2nd)")(li.count())
    val items = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
    time("collect_set collapse")(items.count())
    val pairs = items.select(explode(expr(
      "flatten(transform(items, (x, i) -> " +
        "transform(slice(items, i + 2, size(items)), y -> " +
        "struct(x AS p1, y AS p2))))")).as("pp"))
      .groupBy(col("pp.p1"), col("pp.p2"))
      .agg(count(lit(1)).as("support"))
    time("pair expand + count")(pairs.count())
    val itemsC = items.cache()
    itemsC.count()
    val e1 = itemsC.select(col("l_orderkey"),
      posexplode(col("items")).as(Seq("i1", "p1")))
    val e2 = itemsC.select(col("l_orderkey"),
      posexplode(col("items")).as(Seq("i2", "p2")))
    val pairsB = e1.join(e2, Seq("l_orderkey"))
      .filter(col("i2") > col("i1"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("support"))
    time("pairs via self-join")(pairsB.count())
    time("pairs via self-join (2)")(pairsB.count())
    val pairsC = itemsC.select(explode(expr(
      "flatten(transform(items, (x, i) -> " +
        "transform(slice(items, i + 2, size(items)), y -> " +
        "x * 4294967296L + y)))")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("support"))
    time("pairs HOF longkey")(pairsC.count())
    time("pairs HOF longkey (2)")(pairsC.count())
    val pairsD = pairs
    time("pairs HOF struct (cached in)")(pairsD.count())
    for (_ <- 1 to 3)
      time("q205 full (warm)")(
        graft.SparkEntry.queries("q205_basket_pairs")(spark, sfDir).count())
    spark.stop()
  }
}
