package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All queries live in `graft.ops.*` as `QueryDef`s (Spark plan +
  * DuckDB oracle SQL side by side); this object only flattens them
  * into the driver's Map shape.
  */
object SparkEntry {

  /** Every registered query, in module order. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++ Events.defs ++ CdcQueries.defs ++ Text.defs ++
      Vectors.defs ++ Multimodal.defs ++ OpsExtra.defs ++ Pipeline.defs ++
      Scale.defs ++ Mining.defs ++ Curation.defs ++ Analytics.defs ++
      Signals.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * CDC snapshot materialization (latest-by-key, deletes dropped). */
  def entry(spark: SparkSession): DataFrame = {
    val byName = allDefs.map(q => q.name -> q).toMap
    byName("q16_cdc_snapshot_latest").fn(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
