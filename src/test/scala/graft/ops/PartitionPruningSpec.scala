package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout evidence for the 100 TB design (SCALING.md): a
  * corpus written hive-partitioned by a low-cardinality column is the
  * other storage-layout lever beside bucketing (BucketingSpec) —
  * static pruning turns a predicate on the partition column into
  * skipped directories (no footer reads, no I/O), and dynamic
  * partition pruning (DPP) derives the same skip at RUNTIME from the
  * build side of a join when the predicate sits on a dimension
  * table. At 100 TB with lang/source/date partitions this is the
  * difference between scanning a shard and scanning the corpus. */
class PartitionPruningSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var dir: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-partition-pruning-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .write.partitionBy("lang").mode("overwrite")
      .parquet(s"$dir/docs_by_lang")
    // dimension with the filter on a NON-partition attribute, parquet-
    // backed so Catalyst cannot constant-fold the join away — the en
    // partition is only discoverable at runtime from the build side
    spark.createDataFrame(Seq(("en", "hot"), ("de", "cold"), ("fr", "cold"),
      ("es", "cold"), ("zh", "cold"))).toDF("dim_lang", "tier")
      .write.mode("overwrite").parquet(s"$dir/lang_dim")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    if (dir != null)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("static partition pruning: lang predicate becomes a PartitionFilter") {
    val q = spark.read.parquet(s"$dir/docs_by_lang")
      .filter(col("lang") === "en")
      .select(col("doc_id"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected a lang PartitionFilter in:\n$plan")
    // files ACTUALLY read (input_file_name reflects the pruned scan;
    // .inputFiles would report the full unpruned listing)
    val files = spark.read.parquet(s"$dir/docs_by_lang")
      .filter(col("lang") === "en")
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"scan read outside lang=en: ${files.mkString(", ")}")
  }

  test("dynamic partition pruning fires from a filtered dimension join") {
    val dim = spark.read.parquet(s"$dir/lang_dim")
      .filter(col("tier") === "hot")
    val q = spark.read.parquet(s"$dir/docs_by_lang")
      .join(dim, col("lang") === col("dim_lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in:\n$plan")
    val rows = q.collect()
    assert(rows.length == 1 && rows.head.getString(0) == "en")
    // runtime evidence: the pruned fact scan only touched lang=en
    // (input_file_name projected on the fact side BEFORE the join —
    // over the joined plan it is ambiguous between the two sources)
    val files = spark.read.parquet(s"$dir/docs_by_lang")
      .select(col("lang"), input_file_name().as("f"))
      .join(dim, col("lang") === col("dim_lang"))
      .select(col("f")).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("lang=en")),
      s"DPP scan read outside lang=en: ${files.mkString(", ")}")
  }
}
