package graft.cdc

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions` integration: a session configured with
  * `graft.cdc.GraftExtensions` has every graft scalar function
  * available in SQL from creation — the deployment path for clusters
  * where users don't call `GraftFunctions.register` themselves. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    // extensions only apply at session creation — make sure ours is new
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-spec")
      .config("spark.sql.extensions", "graft.cdc.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  test("all graft functions resolve in SQL without explicit register") {
    val row = spark.sql(
      """SELECT format_lsn(4294967296) AS s,
        |       parse_lsn('00000001/00000000') AS l,
        |       lsn_plus_one(4294967295) AS p,
        |       pg_epoch_to_unix(0) AS u,
        |       unix_to_pg_epoch(946684800000000) AS z,
        |       vec_dot(array(2.0, 3.0), array(4.0, 5.0)) AS d,
        |       vec_l2i(array(1L, 2L), array(3L, 5L)) AS l2,
        |       pg_array_tokens('{a,"b c",NULL}') AS arr""".stripMargin)
      .collect().head
    assert(row.getAs[String]("s") == "00000001/00000000")
    assert(row.getAs[Long]("l") == 4294967296L)
    assert(row.getAs[Long]("p") == 4294967296L)
    assert(row.getAs[Long]("u") == PgEpoch.OffsetMicros)
    assert(row.getAs[Long]("z") == 0L)
    assert(row.getAs[Double]("d") == 23.0)
    assert(row.getAs[Long]("l2") == 13L)
    assert(row.getSeq[String](row.fieldIndex("arr")) == Seq("a", "b c", null))
  }
}
