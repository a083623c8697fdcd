package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed refinement: the raw decode layer transports tuples as
  * name→text maps (SURVEY §1.2 — the wire's `'t'` kind); this turns
  * them into properly-typed per-table columns using the relation's
  * PG type OIDs. Spark types follow the SURVEY §1.2 mapping, with the
  * two documented divergences from pg-types (int8/numeric become
  * LongType/DecimalType rather than strings).
  *
  * Catalyst folds these casts into the same stage as the decode —
  * no extra pass over the data.
  */
object TypedRefinement {

  /** PG type OID → Spark type (SURVEY §1.2 table). */
  def sparkTypeFor(typeOid: Int): DataType = typeOid match {
    case 16 => BooleanType                    // bool
    case 21 => ShortType                      // int2
    case 23 => IntegerType                    // int4
    case 20 => LongType                       // int8 (divergence: ref → string)
    case 26 => LongType                       // oid
    case 700 => FloatType                     // float4
    case 701 => DoubleType                    // float8
    case 1700 => DecimalType(38, 18)          // numeric (divergence: ref → string)
    case 1114 | 1184 => TimestampType         // timestamp / timestamptz
    case 1082 => DateType                     // date
    case 17 => StringType                     // bytea stays \x-hex text transport
    case _ => StringType                      // text/varchar/json/custom
  }

  /** tuple-map column → typed columns for every relation column. */
  def typedColumns(tuple: Column, rel: RelationInfo): Seq[Column] =
    rel.columns.map { c =>
      val raw = element_at(tuple, c.name)
      val typed = sparkTypeFor(c.typeOid) match {
        case TimestampType => to_timestamp(raw)
        case dt => raw.cast(dt)
      }
      typed.as(c.name)
    }

  /** DataFrame with a `tuple` map column → typed per-table view. */
  def typedView(df: DataFrame, tupleCol: String, rel: RelationInfo,
      keep: Seq[String] = Seq("lsn", "op")): DataFrame =
    df.select(keep.map(col) ++ typedColumns(col(tupleCol), rel): _*)

  /** TOAST back-fill against a materialized snapshot (SURVEY §7.5):
    * when replica identity is not FULL, an update's unchanged-TOAST
    * column has no old tuple to resolve from — the true value lives
    * in the prior snapshot row. Joins changes to the snapshot on the
    * key column and fills missing map entries from the snapshot's
    * tuple. Both sides shuffle once on the key — the standard keyed
    * enrichment at any scale.
    *
    * @param changes  rows with (key: String, tuple: Map[String,String])
    * @param snapshot rows with (key: String, tuple: Map[String,String])
    */
  def recoverToast(changes: DataFrame, snapshot: DataFrame,
      columns: Seq[String]): DataFrame = {
    val snap = snapshot.select(col("key").as("_snap_key"),
      col("tuple").as("_snap_tuple"))
    val joined = changes.join(snap,
      changes("key") === col("_snap_key"), "left")
    val merged = map_from_arrays(
      array(columns.map(lit): _*),
      array(columns.map(c =>
        coalesce(element_at(col("tuple"), c),
          element_at(col("_snap_tuple"), c))): _*))
    joined
      .withColumn("tuple", merged)
      .drop("_snap_key", "_snap_tuple")
  }
}
