package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-side equivalents of the server-side pushdown filters the
  * reference exposes as plugin options (SURVEY §2 Part B). In replay
  * mode these become ordinary `filter()` predicates — Catalyst pushes
  * them into the scan; for the live source they map to source options.
  *
  * wal2json table-pattern semantics
  * (`wal2json-plugin-options.type.ts:86-98`): comma-separated
  * schema-qualified names; `*.foo` = table foo in all schemas,
  * `bar.*` = all tables in schema bar; special characters (space,
  * single quote, comma, period, asterisk) escaped with backslash;
  * case-sensitive. `filter-tables` excludes, `add-tables` restricts;
  * `filter-msg-prefixes` applies before `add-msg-prefixes` (`:107`).
  */
object ReplayFilters {

  /** One parsed pattern; None = the `*` wildcard (an escaped `\*` is
    * a literal asterisk name, Some("*")). */
  final case class TablePattern(schema: Option[String], table: Option[String]) {
    def matches(sch: String, tbl: String): Boolean =
      schema.forall(_ == sch) && table.forall(_ == tbl)
  }

  object TablePattern {
    def apply(schema: String, table: String): TablePattern =
      TablePattern(if (schema == "*") None else Some(schema),
        if (table == "*") None else Some(table))
  }

  /** Split a comma-separated pattern list honoring backslash escapes.
    * A part is the `*` wildcard only when the raw (still-escaped)
    * token is exactly `*`; an escaped backslash-asterisk unescapes to
    * a literal asterisk name. */
  def parseTablePatterns(spec: String): Seq[TablePattern] =
    splitEscapedRaw(spec, ',').filter(_.nonEmpty).map { entry =>
      val parts = splitEscapedRaw(entry, '.')
      require(parts.length == 2,
        s"table pattern must be schema-qualified: $entry")
      def partOf(raw: String): Option[String] =
        if (raw == "*") None else Some(unescape(raw))
      TablePattern(partOf(parts(0)), partOf(parts(1)))
    }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) { sb += s.charAt(i + 1); i += 2 }
      else { sb += s.charAt(i); i += 1 }
    }
    sb.toString
  }

  /** Split on `sep` outside backslash escapes, keeping escapes. */
  private[cdc] def splitEscapedRaw(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur += c; cur += s.charAt(i + 1); i += 2 }
      else if (c == sep) { out += cur.toString; cur.clear(); i += 1 }
      else { cur += c; i += 1 }
    }
    out += cur.toString
    out.result()
  }

  private def matchesAny(patterns: Seq[TablePattern]): Column = {
    // compiled to a case-insensitive-free boolean expression over the
    // schema/table columns; small pattern lists fold into codegen
    patterns.map { p =>
      val schemaOk = p.schema.map(col("schema") === _).getOrElse(lit(true))
      val tableOk = p.table.map(col("table") === _).getOrElse(lit(true))
      schemaOk && tableOk
    }.reduceOption(_ || _).getOrElse(lit(false))
  }

  /** B4 `filter-tables`: exclude matching tables. */
  def filterTables(df: DataFrame, spec: String): DataFrame =
    df.filter(!matchesAny(parseTablePatterns(spec)))

  /** B4 `add-tables`: keep only matching tables. */
  def addTables(df: DataFrame, spec: String): DataFrame =
    df.filter(matchesAny(parseTablePatterns(spec)))

  /** B5 `filter-origins`: drop changes from the listed origins. */
  def filterOrigins(df: DataFrame, origins: Seq[String]): DataFrame =
    df.filter(col("origin").isNull || !col("origin").isin(origins: _*))

  /** B6 message-prefix filters; filter applies before add (`:107`). */
  def msgPrefixFilters(df: DataFrame, filterPrefixes: Seq[String],
      addPrefixes: Seq[String]): DataFrame = {
    // null prefixes must survive the exclusion filter (three-valued
    // logic would otherwise drop them: false || NULL = NULL)
    val afterFilter =
      if (filterPrefixes.isEmpty) df
      else df.filter(col("op") =!= "message" || col("prefix").isNull ||
        !col("prefix").isin(filterPrefixes: _*))
    if (addPrefixes.isEmpty) afterFilter
    else afterFilter.filter(col("op") =!= "message" ||
      col("prefix").isin(addPrefixes: _*))
  }

  /** B7 `actions`: which of insert/update/delete/truncate stream. */
  def actions(df: DataFrame, kept: Seq[String]): DataFrame =
    df.filter(col("op").isin(kept: _*))
}
