package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query + its DuckDB oracle.
  *
  * @param name   stable key, `qNN_description`
  * @param fn     the Spark plan, given (session, sf-dir)
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables; None for ops not expressible in SQL (driver
  *               then records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
}
