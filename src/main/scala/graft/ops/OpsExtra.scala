package graft.ops

import org.apache.spark.sql.functions._
import graft.cdc._

/** Remaining operator-inventory coverage: the wal2json pushdown
  * filters applied engine-side (SURVEY §2 B4/B7), GROUPING SETS,
  * and the date/time + string function surfaces (Part C rows).
  */
object OpsExtra {
  import Tables._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q51_pivot_event_matrix",
      """SELECT user_id % 10 AS cohort,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY cohort ORDER BY cohort""".stripMargin) { (s, d) =>
      // relational pivot: wide op×cohort matrix from the long event
      // stream — explicit value list keeps the plan a single
      // partial+final aggregation (no value-discovery pre-pass)
      val types = Seq("click", "error", "purchase", "signup", "view")
      events(s, d)
        .groupBy((col("user_id") % 10).as("cohort"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("cohort") +: types.map(t =>
          coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy(col("cohort"))
    },

    QueryDef(
      "q109_unpivot_measures",
      """WITH long AS (
        |  SELECT l_returnflag, 'quantity' AS measure,
        |         CAST(round(l_quantity * 100) AS BIGINT) AS cents
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'extendedprice',
        |         CAST(round(l_extendedprice * 100) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT l_returnflag, 'discount',
        |         CAST(round(l_discount * 100) AS BIGINT) FROM lineitem)
        |SELECT l_returnflag, measure,
        |  CAST(sum(cents) AS BIGINT) AS total_cents, count(*) AS n
        |FROM long GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin) { (s, d) =>
      // UNPIVOT (melt) — the inverse of q51's pivot, via Spark's
      // native unpivot operator (an Expand node: each input row fans
      // out to one row per measure MAP-SIDE, no join, no shuffle
      // before the final keyed agg). The oracle spells the identical
      // long-form relation as a UNION ALL — engine-agnostic SQL with
      // the same one-aggregation plan shape. Measures convert to
      // integer cents BEFORE the fan-out so sums are associative.
      lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast("long").as("quantity"),
          round(col("l_extendedprice") * 100).cast("long")
            .as("extendedprice"),
          round(col("l_discount") * 100).cast("long").as("discount"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("quantity"), col("extendedprice"), col("discount")),
          "measure", "cents")
        .groupBy(col("l_returnflag"), col("measure"))
        .agg(sum(col("cents")).as("total_cents"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("measure"))
    },

    QueryDef(
      "q52_salted_agg",
      """SELECT l_returnflag,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        // two-phase salted aggregation — the skew-mitigation shape for
        // heavy-hitter group keys at scale: phase 1 spreads each hot
        // key over 16 salt shards (shuffle keyed on (key, salt) is
        // uniform), phase 2 combines the 16 partials per key (tiny).
        // Results are bit-identical to the direct groupBy because the
        // summed quantities are integer-valued (exact in double at any
        // association order) — which is also why the oracle can be the
        // plain one-phase SQL.
        lineitem(s, d)
          .groupBy(col("l_returnflag"),
            pmod(hash(col("l_orderkey")), lit(16)).as("salt"))
          .agg(sum(col("l_quantity")).as("part_qty"),
            count(lit(1)).as("part_n"))
          .groupBy(col("l_returnflag"))
          .agg(sum(col("part_qty")).cast("long").as("sum_qty"),
            sum(col("part_n")).as("n"))
          .orderBy(col("l_returnflag"))
    },

    QueryDef(
      "q40_wal2json_filtered_replay",
      """SELECT event_id,
        |  CASE WHEN user_id % 3 = 2 THEN 'stats' ELSE 'public' END
        |    AS schema_name,
        |  CASE user_id % 3 WHEN 0 THEN 'events_a' WHEN 1 THEN 'events_b'
        |    ELSE 'events_c' END AS table_name,
        |  CASE event_type WHEN 'signup' THEN 'insert'
        |    WHEN 'error' THEN 'delete' ELSE 'update' END AS op
        |FROM events
        |WHERE user_id % 3 <> 1
        |  AND event_type <> 'error'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // encode each event as a wal2json document with a schema/table
      // that depends on the row, decode, then apply the B4/B7 filters
      val schemaCol = when(col("user_id") % 3 === 2, "stats")
        .otherwise("public")
      val tableCol = when(col("user_id") % 3 === 0, "events_a")
        .when(col("user_id") % 3 === 1, "events_b")
        .otherwise("events_c")
      val opCol = when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update")
      val payload = concat(
        lit("""{"change":[{"kind":""""), opCol,
        lit("""","schema":""""), schemaCol,
        lit("""","table":""""), tableCol,
        lit("""","columnnames":["event_id"],"columntypes":["bigint"],"columnvalues":["""),
        col("event_id"), lit("]}]}"))
      val decoded = CdcFunctions.wal2jsonChanges(
        fanOut(events(s, d).select(payload.as("payload"))), col("payload"))
      val kept = ReplayFilters.actions(
        ReplayFilters.addTables(decoded, "public.events_a,stats.*"),
        Seq("insert", "update"))
      kept.select(
        col("after")("event_id").cast("long").as("event_id"),
        col("schema").as("schema_name"),
        col("table").as("table_name"),
        col("op"))
        .orderBy(col("event_id"))
    },

    QueryDef(
      "q41_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n, round(sum(l_extendedprice), 2) AS price_sum
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("lineitem_gs")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          |  coalesce(l_linestatus, 'ALL') AS linestatus,
          |  count(*) AS n, round(sum(l_extendedprice), 2) AS price_sum
          |FROM lineitem_gs
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY returnflag, linestatus""".stripMargin)
    },

    QueryDef(
      "q42_datetime_functions",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP)
        |    AS first_month,
        |  CAST(max(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
        |    o_orderdate)) AS BIGINT) AS max_days_since_95,
        |  count(*) AS n
        |FROM orders GROUP BY y, q ORDER BY y, q""".stripMargin) { (s, d) =>
      orders(s, d)
        .groupBy(year(col("o_orderdate")).cast("long").as("y"),
          quarter(col("o_orderdate")).cast("long").as("q"))
        .agg(date_trunc("month", min(col("o_orderdate"))).as("first_month"),
          max(datediff(col("o_orderdate"),
            lit("1995-01-01").cast("timestamp"))).cast("long")
            .as("max_days_since_95"),
          count(lit(1)).as("n"))
        .orderBy(col("y"), col("q"))
    },

    QueryDef(
      "q43_string_functions",
      """SELECT c_custkey,
        |  upper(c_name) AS uname,
        |  replace(c_name, 'Customer', 'Cust') AS shortname,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  CAST(length(c_name) AS BIGINT) AS name_len,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded,
        |  translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          upper(col("c_name")).as("uname"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("shortname"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
          length(col("c_name")).cast("long").as("name_len"),
          lpad(col("c_custkey").cast("string"), 10, "0").as("padded"),
          translate(col("c_mktsegment"), "AEIOU", "aeiou").as("seg_tr"))
        .orderBy(col("c_custkey"))
    },

    QueryDef(
      "q169_table_profile",
      """WITH b AS (SELECT o_orderstatus AS status,
        |    o_orderpriority AS priority,
        |    CAST(year(o_orderdate) AS VARCHAR) AS order_year FROM orders),
        |long AS (SELECT 'status' AS col_name, status AS value FROM b
        |  UNION ALL SELECT 'priority', priority FROM b
        |  UNION ALL SELECT 'order_year', order_year FROM b),
        |c AS (SELECT col_name, value, count(*) AS cnt FROM long
        |      WHERE value IS NOT NULL GROUP BY col_name, value),
        |a AS (SELECT col_name, count(*) AS n_distinct,
        |      sum(cnt) AS n_nonnull FROM c GROUP BY col_name),
        |t AS (SELECT col_name, value AS top_value, cnt AS top_count
        |  FROM (SELECT col_name, value, cnt, row_number() OVER (
        |          PARTITION BY col_name ORDER BY cnt DESC, value) AS rn
        |        FROM c) WHERE rn = 1),
        |n AS (SELECT count(*) AS n_rows FROM b)
        |SELECT a.col_name, n.n_rows,
        |  CAST(n.n_rows - a.n_nonnull AS BIGINT) AS n_nulls,
        |  a.n_distinct, t.top_value, CAST(t.top_count AS BIGINT) AS top_count
        |FROM a JOIN t USING (col_name), n
        |ORDER BY col_name""".stripMargin) { (s, d) =>
      // Table profiler — the Deequ/data-quality summary a pipeline
      // emits before accepting a snapshot: per column, row count,
      // null count, exact distinct count, and the modal value with
      // its frequency (ties broken by value for determinism). The
      // wide→long fan-out is Spark's native unpivot (an Expand node:
      // map-side, no join, no shuffle before the keyed count), so
      // profiling C columns costs ONE pass over the table and a
      // (col, value) aggregation — the standard shape at any scale;
      // per-column cardinality rides the same counts relation, and
      // the modal window partitions by column (C partitions, never
      // unpartitioned). Nulls are counted by difference against the
      // row count, so the unpivot's null-dropping semantics cannot
      // skew the profile.
      val base = orders(s, d).select(
        col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"),
        year(col("o_orderdate")).cast("string").as("order_year"))
      val long = base.unpivot(Array.empty,
        Array(col("status"), col("priority"), col("order_year")),
        "col_name", "value")
      val c = long.filter(col("value").isNotNull)
        .groupBy(col("col_name"), col("value"))
        .agg(count(lit(1)).as("cnt"))
      val a = c.groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_distinct"),
          sum(col("cnt")).as("n_nonnull"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("col_name"))
        .orderBy(col("cnt").desc, col("value"))
      val t = c.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("col_name"), col("value").as("top_value"),
          col("cnt").as("top_count"))
      val n = base.agg(count(lit(1)).as("n_rows"))
      a.join(t, "col_name").crossJoin(broadcast(n))
        .select(col("col_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).cast("long").as("n_nulls"),
          col("n_distinct"), col("top_value"),
          col("top_count").cast("long").as("top_count"))
        .orderBy(col("col_name"))
    }
  )
}
