package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log analytics over the `events` stream table — the queries
  * the reference's users hand-write in `on('data')` handlers
  * (SURVEY.md §2 Part C): latest-by-key snapshot materialization,
  * per-op/time-window aggregation, sessionization (gaps-and-islands ≡
  * `session_window` semantics), as-of correlation, JSON payload
  * extraction, and transaction framing (begin/commit envelopes).
  *
  * `event_type` plays the role of the CDC op (`signup`→insert,
  * `error`→delete, else update), `event_id` the monotonic LSN,
  * `user_id` the primary key.
  *
  * Timestamps: the parquet column is ns-precision; Spark reads µs.
  * Every query reduces time to whole seconds (`ts_sec`) so the DuckDB
  * oracle sees identical values.
  *
  * Scale notes: all aggregations key on (user_id[, window]) — at 100 TB
  * these shuffle once on the key and stay partial+final; the as-of
  * self-join shuffles both sides by user_id (bounded fan-out per key);
  * no global ordering is ever required (per-key order via window
  * functions only).
  */
object Events {
  import Tables._

  private val tsSecSql = "epoch(date_trunc('second', ts))::BIGINT"

  /** CDC op mapping used across queries (same CASE in oracle SQL). */
  private val opCol =
    when(col("event_type") === "signup", "insert")
      .when(col("event_type") === "error", "delete")
      .otherwise("update")

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q67_outlier_counts",
      """WITH ranked AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |thr AS (SELECT event_type, max(value) AS p90
        |  FROM ranked WHERE rn = (9 * n + 9) // 10 GROUP BY event_type)
        |SELECT r.event_type, max(r.n) AS n_events,
        |  round(max(t.p90), 2) AS p90_value,
        |  CAST(sum(CASE WHEN r.value > t.p90 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM ranked r JOIN thr t ON t.event_type = r.event_type
        |GROUP BY r.event_type ORDER BY r.event_type""".stripMargin) { (s, d) =>
      // robust outlier gate: the p90 threshold is an actual data
      // element picked by the exact rank formula (no stddev — its
      // accumulation order is engine-dependent; a quantile element is
      // not), and the comparison against it is exact on raw doubles.
      // The ranked window runs ONCE (threshold extraction only); the
      // outlier count joins the raw scan against the per-type
      // thresholds as a BROADCAST (handful of rows) — re-keying the
      // full event stream on ~5 hot event_type values would funnel
      // everything through 5 reducers, the exact skew the plan guard
      // exists to catch elsewhere.
      val ranked = events(s, d)
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("value"), col("event_id"))).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      val thr = ranked
        .filter(col("rn") === expr("(9 * n + 9) DIV 10"))
        .groupBy(col("event_type")).agg(max(col("value")).as("p90"))
      events(s, d).join(broadcast(thr), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          round(max(col("p90")), 2).as("p90_value"),
          sum(when(col("value") > col("p90"), 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy(col("event_type"))
    },

    QueryDef(
      "q61_asof_tolerance",
      s"""WITH p AS (SELECT event_id, user_id,
        |           $tsSecSql AS ts_sec
         |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT event_id, user_id,
        |           $tsSecSql AS ts_sec
         |           FROM events WHERE event_type = 'click')
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       max(c.event_id) AS last_click_id,
        |       count(c.event_id) AS n_clicks_in_window
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |                  AND c.ts_sec < p.ts_sec
        |                  AND c.ts_sec >= p.ts_sec - 3600
        |GROUP BY p.event_id, p.user_id
        |ORDER BY purchase_id""".stripMargin) { (s, d) =>
      // as-of join with tolerance (merge_asof semantics): the match
      // must fall inside a bounded look-back window, so stale state
      // never matches — the range predicate also bounds the join's
      // per-key fan-out at scale
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_sec").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user_id"), col("ts_sec").as("c_ts"))
      p.join(c,
          col("c_user_id") === col("user_id") &&
            col("c_ts") < col("p_ts") &&
            col("c_ts") >= col("p_ts") - 3600, "left")
        .groupBy(col("purchase_id"), col("user_id"))
        .agg(max(col("click_id")).as("last_click_id"),
          count(col("click_id")).as("n_clicks_in_window"))
        .orderBy(col("purchase_id"))
    },

    QueryDef(
      "q112_trend_slope",
      s"""WITH b AS (SELECT event_type,
         |    $tsSecSql AS x,
         |    CAST(round(value * 1000) AS BIGINT) AS y FROM events),
         |s AS (SELECT event_type, count(*) AS n,
         |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         |    sum(CAST(x AS HUGEINT) * y) AS sxy,
         |    sum(CAST(x AS HUGEINT) * x) AS sxx
         |  FROM b GROUP BY event_type)
         |SELECT event_type, n AS n_rows,
         |  CAST(floor(1000000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
         |    / CAST(n * sxx - sx * sx AS DOUBLE))) AS BIGINT)
         |    AS slope_micro_per_sec
         |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
      // Per-group OLS trend (metric drift detection): the slope of
      // event value over time from the same exact-integer-moment
      // recipe as q70's correlation — 128-bit sums of (x, y, xy, x²),
      // one partial+final keyed agg, and a single identical
      // double-op sequence at the end, so the result is independent
      // of partition order and hash-matches across engines where a
      // naive regr_slope() of doubles would not.
      val d38 = "decimal(38,0)"
      val b = events(s, d).select(col("event_type"),
        col("ts_sec").as("x"),
        round(col("value") * 1000).cast("long").as("y"))
      b.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(d38).as("n"),
          sum(col("x").cast(d38)).as("sx"),
          sum(col("y").cast(d38)).as("sy"),
          sum((col("x").cast(d38) * col("y"))).as("sxy"),
          sum((col("x").cast(d38) * col("x"))).as("sxx"))
        .select(col("event_type"), col("n").cast("long").as("n_rows"),
          floor(lit(1000000.0) *
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")))
            .cast("long").as("slope_micro_per_sec"))
        .orderBy(col("event_type"))
    },

    QueryDef(
      "q107_asof_nearest",
      s"""WITH p AS (SELECT event_id, user_id, $tsSecSql AS ts_sec
         |           FROM events WHERE event_type = 'purchase'),
         |     c AS (SELECT event_id, user_id, $tsSecSql AS ts_sec
         |           FROM events WHERE event_type = 'click'),
         |     m AS (SELECT p.event_id AS purchase_id, p.user_id,
         |             c.event_id AS click_id,
         |             abs(c.ts_sec - p.ts_sec) AS gap_sec,
         |             row_number() OVER (PARTITION BY p.event_id
         |               ORDER BY abs(c.ts_sec - p.ts_sec),
         |                 CASE WHEN c.ts_sec <= p.ts_sec THEN 0 ELSE 1 END,
         |                 c.event_id) AS rn
         |           FROM p JOIN c ON c.user_id = p.user_id
         |             AND c.ts_sec >= p.ts_sec - 900
         |             AND c.ts_sec <= p.ts_sec + 900)
         |SELECT purchase_id, user_id, click_id AS nearest_click_id,
         |  gap_sec
         |FROM m WHERE rn = 1 ORDER BY purchase_id""".stripMargin) { (s, d) =>
      // the third merge_asof direction ('nearest', after q11 backward
      // and q61 tolerance-bounded backward): the click closest in
      // time to each purchase within ±900 s, ties broken backward
      // then by event id — a total order, so both engines pick the
      // same row. The tolerance bounds the range join's per-key
      // fan-out exactly as q61's look-back window does; the window
      // ranks within purchase_id partitions only (each a handful of
      // candidate clicks, never a global sort).
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_sec").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
          col("user_id").as("c_user_id"), col("ts_sec").as("c_ts"))
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(abs(col("c_ts") - col("p_ts")),
          when(col("c_ts") <= col("p_ts"), 0).otherwise(1),
          col("click_id"))
      p.join(c,
          col("c_user_id") === col("user_id") &&
            col("c_ts") >= col("p_ts") - 900 &&
            col("c_ts") <= col("p_ts") + 900)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("purchase_id"), col("user_id"),
          col("click_id").as("nearest_click_id"),
          abs(col("c_ts") - col("p_ts")).as("gap_sec"))
        .orderBy(col("purchase_id"))
    },

    QueryDef(
      "q11_asof_last_click",
      s"""WITH p AS (SELECT event_id, user_id FROM events
         |           WHERE event_type = 'purchase'),
         |     c AS (SELECT event_id, user_id FROM events
         |           WHERE event_type = 'click'),
         |     m AS (SELECT p.event_id AS purchase_id, p.user_id,
         |                  max(c.event_id) AS last_click_id
         |           FROM p LEFT JOIN c ON c.user_id = p.user_id
         |                             AND c.event_id < p.event_id
         |           GROUP BY p.event_id, p.user_id)
         |SELECT m.purchase_id, m.user_id, m.last_click_id,
         |       e.value AS last_click_value
         |FROM m LEFT JOIN events e ON e.event_id = m.last_click_id
         |ORDER BY m.purchase_id""".stripMargin) { (s, d) =>
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"),
                col("user_id").as("c_user_id"))
      val m = p.join(c,
          col("c_user_id") === col("user_id") &&
            col("click_id") < col("purchase_id"), "left")
        .groupBy(col("purchase_id"), col("user_id"))
        .agg(max(col("click_id")).as("last_click_id"))
      m.join(ev.select(col("event_id"), col("value").as("last_click_value")),
          col("event_id") === col("last_click_id"), "left")
        .select(col("purchase_id"), col("user_id"), col("last_click_id"),
                col("last_click_value"))
        .orderBy(col("purchase_id"))
    },

    QueryDef(
      "q16_cdc_snapshot_latest",
      s"""SELECT user_id, op AS last_op, value AS last_value, ts_sec
         |FROM (SELECT user_id, op, value, ts_sec,
         |        row_number() OVER (PARTITION BY user_id
         |                           ORDER BY event_id DESC) AS rn
         |      FROM (SELECT user_id, event_id, value,
         |              $tsSecSql AS ts_sec,
         |              CASE event_type WHEN 'signup' THEN 'insert'
         |                WHEN 'error' THEN 'delete'
         |                ELSE 'update' END AS op
         |            FROM events))
         |WHERE rn = 1 AND op <> 'delete'
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      events(s, d)
        .withColumn("op", opCol)
        .groupBy(col("user_id"))
        .agg(max_by(struct(col("op"), col("value"), col("ts_sec")),
          col("event_id")).as("last"))
        .filter(col("last.op") =!= "delete")
        .select(col("user_id"), col("last.op").as("last_op"),
                col("last.value").as("last_value"),
                col("last.ts_sec").as("ts_sec"))
        .orderBy(col("user_id"))
    },

    QueryDef(
      "q120_scd2_history",
      s"""WITH c AS (SELECT user_id, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS value_c,
         |    CASE event_type WHEN 'signup' THEN 'insert'
         |      WHEN 'error' THEN 'delete' ELSE 'update' END AS op
         |  FROM events),
         |v AS (SELECT user_id, op, value_c,
         |    event_id AS valid_from,
         |    lead(event_id) OVER (PARTITION BY user_id
         |                         ORDER BY event_id) AS valid_to
         |  FROM c)
         |SELECT user_id, valid_from, valid_to, op, value_c,
         |  (valid_to IS NULL AND op <> 'delete') AS is_current
         |FROM v WHERE op <> 'delete'
         |ORDER BY user_id, valid_from""".stripMargin) { (s, d) =>
      // SCD2 (type-2 slowly-changing-dimension) history — the
      // materialization every warehouse consumer of logical
      // replication builds from the change stream: each
      // insert/update opens a version valid [its LSN, next change's
      // LSN); a delete closes the prior version without opening one;
      // the open-ended surviving version is flagged current. One
      // window per key partition (PlanGuard-safe, no global sort) —
      // at 100 TB this is a single shuffle on the key followed by a
      // per-key ordered scan, the same cost class as the snapshot
      // (q16) it generalizes: q16 is exactly this table filtered to
      // is_current.
      val versions = events(s, d)
        .select(col("user_id"), col("event_id"),
          round(col("value") * 100).cast("long").as("value_c"), opCol.as("op"))
        .select(col("user_id"), col("op"), col("value_c"),
          col("event_id").as("valid_from"),
          lead(col("event_id"), 1).over(Window.partitionBy(col("user_id"))
            .orderBy(col("event_id"))).as("valid_to"))
      versions.filter(col("op") =!= "delete")
        .select(col("user_id"), col("valid_from"), col("valid_to"),
          col("op"), col("value_c"),
          (col("valid_to").isNull && col("op") =!= "delete").as("is_current"))
        .orderBy(col("user_id"), col("valid_from"))
    },

    QueryDef(
      "q121_changelog_compaction",
      s"""WITH c AS (SELECT user_id, event_id,
         |    ($tsSecSql // 3600) * 3600 AS hour_sec,
         |    CAST(round(value * 100) AS BIGINT) AS value_c,
         |    CASE event_type WHEN 'signup' THEN 'insert'
         |      WHEN 'error' THEN 'delete' ELSE 'update' END AS op
         |  FROM events)
         |SELECT user_id, hour_sec, count(*) AS n_ops,
         |  CASE WHEN arg_min(op, event_id) = 'insert'
         |         AND arg_max(op, event_id) = 'delete' THEN 'noop'
         |    WHEN arg_min(op, event_id) = 'insert' THEN 'insert'
         |    WHEN arg_max(op, event_id) = 'delete' THEN 'delete'
         |    ELSE 'update' END AS net_op,
         |  arg_max(value_c, event_id) AS last_value_c
         |FROM c GROUP BY user_id, hour_sec
         |ORDER BY user_id, hour_sec""".stripMargin) { (s, d) =>
      // Changelog compaction — collapse each key's burst of changes
      // per hour bucket into its NET effect (the pre-merge pass that
      // turns an at-least-once firehose into one upsert per key per
      // window; Kafka log-compaction semantics with a time fence).
      // insert…delete telescopes to noop, insert…update to insert,
      // update…delete to delete, else update. ONE keyed partial+final
      // aggregation via min_by/max_by — no window, no per-key sort;
      // at 100 TB the shuffle carries one row per (key, hour) per
      // map partition, and the merge sink applies n_ops-times fewer
      // writes.
      val hourSec = (col("ts_sec") / 3600).cast("long") * 3600
      events(s, d)
        .select(col("user_id"), col("event_id"), hourSec.as("hour_sec"),
          round(col("value") * 100).cast("long").as("value_c"), opCol.as("op"))
        .groupBy(col("user_id"), col("hour_sec"))
        .agg(count(lit(1)).as("n_ops"),
          min_by(col("op"), col("event_id")).as("first_op"),
          max_by(col("op"), col("event_id")).as("last_op"),
          max_by(col("value_c"), col("event_id")).as("last_value_c"))
        .select(col("user_id"), col("hour_sec"), col("n_ops"),
          when(col("first_op") === "insert" && col("last_op") === "delete",
            "noop")
            .when(col("first_op") === "insert", "insert")
            .when(col("last_op") === "delete", "delete")
            .otherwise("update").as("net_op"),
          col("last_value_c"))
        .orderBy(col("user_id"), col("hour_sec"))
    },

    QueryDef(
      "q17_hourly_event_counts",
      """SELECT date_trunc('hour', ts) AS hour_ts, event_type,
        |  count(*) AS n_events, round(sum(value), 2) AS value_sum
        |FROM events GROUP BY hour_ts, event_type
        |ORDER BY hour_ts, event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(col("hour_ts"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), r2(sum(col("value"))).as("value_sum"))
        .orderBy(col("hour_ts"), col("event_type"))
    },

    QueryDef(
      "q58_sliding_window_counts",
      """WITH w AS (SELECT event_type,
        |    unnest([ (epoch(date_trunc('second', ts))::BIGINT // 3600) * 3600,
        |             (epoch(date_trunc('second', ts))::BIGINT // 3600) * 3600 - 3600 ])
        |      AS win_start
        |  FROM events)
        |SELECT win_start, event_type, count(*) AS n_events
        |FROM w GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin) { (s, d) =>
      // batch sliding window (2h length, 1h slide) via the native
      // window() generator: each event lands in exactly two windows;
      // output keyed on the integer epoch-second window start so no
      // timezone semantics enter the oracle compare
      events(s, d)
        .groupBy(
          window(timestamp_seconds(col("ts_sec")), "2 hours", "1 hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start").cast("long").as("win_start"),
          col("event_type"), col("n_events"))
        .orderBy(col("win_start"), col("event_type"))
    },

    QueryDef(
      "q18_user_sessions",
      s"""WITH e AS (SELECT user_id, event_id, $tsSecSql AS ts_sec
         |           FROM events),
         |     flagged AS (SELECT user_id, ts_sec,
         |        CASE WHEN ts_sec - lag(ts_sec) OVER w >= 1800
         |             OR lag(ts_sec) OVER w IS NULL
         |             THEN 1 ELSE 0 END AS new_session
         |        FROM e WINDOW w AS (PARTITION BY user_id
         |                            ORDER BY ts_sec, event_id)),
         |     sess AS (SELECT user_id, ts_sec,
         |        sum(new_session) OVER (PARTITION BY user_id
         |          ORDER BY ts_sec ROWS BETWEEN UNBOUNDED PRECEDING
         |          AND CURRENT ROW) AS session_id
         |        FROM flagged),
         |     per AS (SELECT user_id, session_id, count(*) AS n,
         |                    max(ts_sec) - min(ts_sec) AS dur
         |             FROM sess GROUP BY user_id, session_id)
         |SELECT user_id, count(*) AS n_sessions,
         |  CAST(sum(n) AS BIGINT) AS total_events,
         |  CAST(floor(sum(dur) * 10000.0 / count(*)) AS BIGINT)
         |    AS avg_session_sec_4
         |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      val wRun = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_sec"))
        .withColumn("new_session",
          when(col("ts_sec") - lag(col("ts_sec"), 1).over(w) >= 1800 ||
            lag(col("ts_sec"), 1).over(w).isNull, 1).otherwise(0))
        .withColumn("session_id", sum(col("new_session")).over(wRun))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n"),
             (max(col("ts_sec")) - min(col("ts_sec"))).as("dur"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
             sum(col("n")).as("total_events"),
             floor(sum(col("dur")) * 10000.0 / count(lit(1))).cast("long")
               .as("avg_session_sec_4"))
        .orderBy(col("user_id"))
    },

    QueryDef(
      "q59_map_functions",
      """SELECT event_id,
        |  len(list_filter([
        |    CASE WHEN (event_id % 97) % 2 = 0 THEN 1 END,
        |    CASE WHEN k % 2 = 0 THEN 1 END,
        |    CASE WHEN user_id % 2 = 0 THEN 1 END], x -> x IS NOT NULL))
        |    AS n_keys,
        |  coalesce(array_to_string(list_filter([
        |    CASE WHEN (event_id % 97) % 2 = 0
        |         THEN 'eid=' || CAST((event_id % 97) * 3 AS VARCHAR) END,
        |    CASE WHEN k % 2 = 0 THEN 'k=' || CAST(k * 3 AS VARCHAR) END,
        |    CASE WHEN user_id % 2 = 0
        |         THEN 'uid=' || CAST(user_id * 3 AS VARCHAR) END],
        |    x -> x IS NOT NULL), ','), '') AS entries
        |FROM (SELECT event_id, user_id,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      // higher-order map functions over a per-event map: map_filter
      // keeps even values, transform_values scales them, map_entries +
      // array_sort + array_join canonicalize to a comparable string
      // (keys are eid < k < uid, so the sorted order matches the
      // oracle's hand-ordered list)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .withColumn("m", map(
          lit("eid"), col("event_id") % 97,
          lit("k"), col("k"),
          lit("uid"), col("user_id")))
        .withColumn("kept", map_filter(col("m"), (_, v) => v % 2 === 0))
        .withColumn("scaled", transform_values(col("kept"), (_, v) => v * 3))
        .select(col("event_id"),
          size(col("kept")).cast("long").as("n_keys"),
          array_join(transform(array_sort(map_entries(col("scaled"))),
            e => concat(e.getField("key"), lit("="),
              e.getField("value").cast("string"))), ",").as("entries"))
        .orderBy(col("event_id"))
    },

    QueryDef(
      "q19_json_props_stats",
      """SELECT event_type, count(*) AS n,
        |  CAST(floor(sum(k) * 10000.0 / count(*)) AS BIGINT) AS k_avg_4,
        |  min(k) AS k_min, max(k) AS k_max
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
             floor(sum(col("k")) * 10000.0 / count(lit(1))).cast("long")
               .as("k_avg_4"),
             min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("event_type"))
    },

    QueryDef(
      "q20_funnel",
      s"""WITH per_user AS (SELECT user_id,
         |    min(CASE WHEN event_type = 'view' THEN ts_sec END) AS v,
         |    min(CASE WHEN event_type = 'click' THEN ts_sec END) AS c,
         |    min(CASE WHEN event_type = 'purchase' THEN ts_sec END) AS p
         |  FROM (SELECT user_id, event_type, $tsSecSql AS ts_sec FROM events)
         |  GROUP BY user_id)
         |SELECT count(CASE WHEN v IS NOT NULL THEN 1 END) AS n_view,
         |  count(CASE WHEN v < c THEN 1 END) AS n_view_click,
         |  count(CASE WHEN v < c AND c < p THEN 1 END)
         |    AS n_view_click_purchase
         |FROM per_user""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", col("ts_sec"))).as("v"),
          min(when(col("event_type") === "click", col("ts_sec"))).as("c"),
          min(when(col("event_type") === "purchase", col("ts_sec"))).as("p"))
        .agg(
          count(when(col("v").isNotNull, 1)).as("n_view"),
          count(when(col("v") < col("c"), 1)).as("n_view_click"),
          count(when(col("v") < col("c") && col("c") < col("p"), 1))
            .as("n_view_click_purchase"))
    },

    QueryDef(
      "q38_tx_frames",
      s"""SELECT user_id, date_trunc('hour', ts) AS hour_ts,
         |  min($tsSecSql) AS begin_sec,
         |  max($tsSecSql) AS commit_sec,
         |  count(*) AS n_ops,
         |  count(DISTINCT event_type) AS n_op_types
         |FROM events GROUP BY user_id, hour_ts
         |ORDER BY user_id, hour_ts""".stripMargin) { (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), col("hour_ts"))
        .agg(min(col("ts_sec")).as("begin_sec"),
             max(col("ts_sec")).as("commit_sec"),
             count(lit(1)).as("n_ops"),
             countDistinct(col("event_type")).as("n_op_types"))
        .orderBy(col("user_id"), col("hour_ts"))
    },

    // ---- q173: behavior transition matrix (first-order Markov) ----
    // The clickstream model behind next-event prediction and funnel
    // design: per user, pair each event with its successor (lead over
    // the per-user time order — (ts, event_id) is a total order, so
    // both engines pick identical successors), then count transitions
    // and express each as a per-source-state rate in integer milli.
    // Scale shape: ONE window partitioned by user_id (millions of
    // small independent partitions — the sort is per-user, never
    // global), one keyed count, and a #types x #types result; the
    // per-prev total rides a tiny window over <= 5 rows, no second
    // scan of the event stream.
    QueryDef(
      "q173_event_transitions",
      """WITH t AS (SELECT user_id, event_type AS prev,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next
        |  FROM events),
        |c AS (SELECT prev, next, count(*) AS n FROM t
        |      WHERE next IS NOT NULL GROUP BY prev, next)
        |SELECT prev, next, n,
        |  CAST(n * 1000 // sum(n) OVER (PARTITION BY prev) AS BIGINT)
        |    AS rate_milli
        |FROM c ORDER BY prev, next""".stripMargin) { (s, d) =>
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wp = Window.partitionBy(col("prev"))
      t(s, d, "events")
        .select(col("user_id"), col("event_type").as("prev"),
          lead(col("event_type"), 1).over(wu).as("next"))
        .filter(col("next").isNotNull)
        .groupBy(col("prev"), col("next"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(wp))
        .select(col("prev"), col("next"), col("n"),
          expr("n * 1000 DIV tot").cast("long").as("rate_milli"))
        .orderBy(col("prev"), col("next"))
    },

    // ---- q177: conversion latency by cohort -----------------------
    // The funnel question q20/q89 (conversion COUNTS) cannot answer:
    // once a user converts, how LONG did it take? Latency = first
    // purchase at-or-after the user's first view, reported as exact
    // rank-based p50/p90 per first-view day cohort (the product-
    // analytics cut: did this week's funnel get slower?). All
    // integer: ts in whole seconds, percentiles by the ceil-rank
    // formula (q48's recipe), windows partitioned by cohort day.
    // Scale shape: two keyed per-user aggs, one user-keyed join with
    // the at-or-after predicate, then windows over per-day cohorts
    // of converted users — each stage keys on user_id or cohort_day,
    // nothing global.
    QueryDef(
      "q177_conversion_latency",
      s"""WITH v AS (SELECT user_id, min($tsSecSql) AS v0 FROM events
         |           WHERE event_type = 'view' GROUP BY user_id),
         |p AS (SELECT e.user_id, min($tsSecSql) AS p0
         |      FROM events e JOIN v USING (user_id)
         |      WHERE event_type = 'purchase' AND $tsSecSql >= v0
         |      GROUP BY e.user_id),
         |l AS (SELECT v.user_id, v0 // 86400 AS cohort_day, p0 - v0 AS lat
         |      FROM v JOIN p USING (user_id)),
         |r AS (SELECT cohort_day, lat,
         |    row_number() OVER (PARTITION BY cohort_day
         |      ORDER BY lat, user_id) AS rn,
         |    count(*) OVER (PARTITION BY cohort_day) AS n FROM l)
         |SELECT cohort_day, count(*) AS n_converted,
         |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat END) AS BIGINT)
         |    AS p50_sec,
         |  CAST(max(CASE WHEN rn = (9 * n + 9) // 10 THEN lat END) AS BIGINT)
         |    AS p90_sec,
         |  CAST(max(lat) AS BIGINT) AS max_sec
         |FROM r GROUP BY cohort_day ORDER BY cohort_day""".stripMargin) {
      (s, d) =>
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("v0"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, "user_id")
        .filter(col("ts_sec") >= col("v0"))
        .groupBy(col("user_id")).agg(min(col("ts_sec")).as("p0"))
      val l = v.join(p, "user_id")
        .select(col("user_id"), expr("v0 DIV 86400").as("cohort_day"),
          (col("p0") - col("v0")).as("lat"))
      val wd = Window.partitionBy(col("cohort_day"))
      l.withColumn("rn", row_number().over(
          wd.orderBy(col("lat"), col("user_id"))).cast("long"))
        .withColumn("n", count(lit(1)).over(wd))
        .groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("n_converted"),
          max(when(col("rn") === expr("(n + 1) DIV 2"), col("lat")))
            .cast("long").as("p50_sec"),
          max(when(col("rn") === expr("(9 * n + 9) DIV 10"), col("lat")))
            .cast("long").as("p90_sec"),
          max(col("lat")).cast("long").as("max_sec"))
        .orderBy(col("cohort_day"))
    },

    // ---- q178: exact rolling 7-day distinct actives ---------------
    // DAU/WAU/stickiness — the engagement board every event pipeline
    // serves. Distinct-count over a SLIDING window has no native
    // windowed form (count(distinct) over a frame isn't supported,
    // and sketches are approximate); the exact distributed recipe:
    // dedup to (user, day), explode each into the 7 trailing window
    // ends it contributes to, dedup again, and count per window end —
    // turning a windowed distinct into two keyed distincts + one
    // keyed count (all map-side combinable). Cost is a bounded 7x
    // fanout of the (user, day) relation — already collapsed from
    // raw events, orders of magnitude smaller — the standard trade
    // for exactness at 100 TB; beyond ~30-day windows, switch to
    // q39's HLL sketch path.
    QueryDef(
      "q178_rolling_active_users",
      s"""WITH ud AS (SELECT DISTINCT user_id, $tsSecSql // 86400 AS day
         |            FROM events),
         |mx AS (SELECT max(day) AS dmax FROM ud),
         |w AS (SELECT DISTINCT user_id, day + i AS wd
         |      FROM ud, UNNEST(range(0, 7)) AS t(i)),
         |wau AS (SELECT wd AS day, count(*) AS wau FROM w
         |        CROSS JOIN mx WHERE wd <= dmax GROUP BY wd),
         |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
         |SELECT w.day, COALESCE(dau, 0) AS dau, wau,
         |  CAST(COALESCE(dau, 0) * 1000 // wau AS BIGINT)
         |    AS stickiness_milli
         |FROM wau w LEFT JOIN dau USING (day)
         |ORDER BY w.day""".stripMargin) { (s, d) =>
      val ud = events(s, d)
        .select(col("user_id"), expr("ts_sec DIV 86400").as("day"))
        .distinct()
      val mx = ud.agg(max(col("day")).as("dmax"))
      val w = ud.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("wd"))
        .distinct()
      val wau = w.crossJoin(broadcast(mx))
        .filter(col("wd") <= col("dmax"))
        .groupBy(col("wd").as("day")).agg(count(lit(1)).as("wau"))
      val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("wau"),
          expr("COALESCE(dau, 0) * 1000 DIV wau").cast("long")
            .as("stickiness_milli"))
        .orderBy(col("day"))
    },

    // ---- q181: transaction size histogram -------------------------
    // Operational CDC telemetry: the ops-per-transaction distribution
    // (power-of-2 buckets) that sizes decoder batch buffers and flags
    // bulk-load transactions before they stall the apply loop. Frames
    // are q38's (user, hour) envelopes; the histogram is two keyed
    // aggs, the second over <= log2(max_tx) rows — at any scale the
    // heavy work is the first groupBy, which is the same shuffle q38
    // already pays.
    QueryDef(
      "q181_tx_size_histogram",
      s"""WITH tx AS (SELECT user_id, date_trunc('hour', ts) AS h,
         |            count(*) AS n_ops FROM events GROUP BY user_id, h),
         |b AS (SELECT CASE WHEN n_ops <= 1 THEN 1 WHEN n_ops <= 2 THEN 2
         |        WHEN n_ops <= 4 THEN 4 WHEN n_ops <= 8 THEN 8
         |        WHEN n_ops <= 16 THEN 16 ELSE 32 END AS bucket_cap,
         |        n_ops FROM tx)
         |SELECT bucket_cap, count(*) AS n_txs,
         |  CAST(sum(n_ops) AS BIGINT) AS total_ops
         |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin) {
      (s, d) =>
      events(s, d)
        .groupBy(col("user_id"), col("hour_ts"))
        .agg(count(lit(1)).as("n_ops"))
        .select(
          when(col("n_ops") <= 1, 1L).when(col("n_ops") <= 2, 2L)
            .when(col("n_ops") <= 4, 4L).when(col("n_ops") <= 8, 8L)
            .when(col("n_ops") <= 16, 16L).otherwise(32L).as("bucket_cap"),
          col("n_ops"))
        .groupBy(col("bucket_cap"))
        .agg(count(lit(1)).as("n_txs"),
          sum(col("n_ops")).cast("long").as("total_ops"))
        .orderBy(col("bucket_cap"))
    },

    // ---- q182: anomalous-day detection (median/MAD on volumes) ----
    // Incident detection on ingest telemetry: daily event volumes per
    // type scored against the type's own median via MAD — the q152
    // robust-screen recipe lifted from row values to TIME-SERIES
    // volumes, so a traffic spike can't inflate the baseline it is
    // judged against. All ranks partition by event_type; both median
    // rounds run over the tiny per-type daily relation (the raw
    // stream collapses in the first keyed count). dev_ratio uses
    // MAD+1 so a zero-MAD (perfectly flat) series still orders
    // deterministically instead of dividing by zero.
    QueryDef(
      "q182_anomaly_days",
      s"""WITH daily AS (SELECT event_type, $tsSecSql // 86400 AS day,
         |    count(*) AS n FROM events GROUP BY event_type, day),
         |r AS (SELECT event_type, day, n,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY n, day) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS cnt FROM daily),
         |med AS (SELECT event_type,
         |    max(CASE WHEN rn = (cnt + 1) // 2 THEN n END) AS med
         |  FROM r GROUP BY event_type),
         |dev AS (SELECT d.event_type, d.day, d.n, m.med,
         |    CASE WHEN d.n >= m.med THEN d.n - m.med
         |         ELSE m.med - d.n END AS adev
         |  FROM daily d JOIN med m ON m.event_type = d.event_type),
         |r2 AS (SELECT event_type, adev,
         |    row_number() OVER (PARTITION BY event_type
         |      ORDER BY adev, day) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS cnt FROM dev),
         |mad AS (SELECT event_type,
         |    max(CASE WHEN rn = (cnt + 1) // 2 THEN adev END) AS mad
         |  FROM r2 GROUP BY event_type)
         |SELECT v.event_type, v.day, v.n, CAST(v.med AS BIGINT) AS med,
         |  CAST(a.mad AS BIGINT) AS mad,
         |  CAST(v.adev * 1000 // (a.mad + 1) AS BIGINT)
         |    AS dev_ratio_milli,
         |  v.adev > 3 * a.mad AS flagged
         |FROM dev v JOIN mad a USING (event_type)
         |ORDER BY dev_ratio_milli DESC, v.event_type, v.day
         |LIMIT 20""".stripMargin) { (s, d) =>
      val daily = events(s, d)
        .groupBy(col("event_type"), expr("ts_sec DIV 86400").as("day"))
        .agg(count(lit(1)).as("n"))
      val wt = Window.partitionBy(col("event_type"))
      def medianOf(df: DataFrame, c: String): DataFrame =
        df.withColumn("rn", row_number().over(
            wt.orderBy(col(c), col("day"))).cast("long"))
          .withColumn("cnt", count(lit(1)).over(wt))
          .groupBy(col("event_type"))
          .agg(max(when(col("rn") === expr("(cnt + 1) DIV 2"), col(c)))
            .as(s"med_$c"))
      val med = medianOf(daily, "n")
        .select(col("event_type"), col("med_n").as("med"))
      val dev = daily.join(broadcast(med), "event_type")
        .withColumn("adev",
          when(col("n") >= col("med"), col("n") - col("med"))
            .otherwise(col("med") - col("n")))
      val mad = medianOf(dev, "adev")
        .select(col("event_type"), col("med_adev").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .select(col("event_type"), col("day"), col("n"),
          col("med").cast("long").as("med"),
          col("mad").cast("long").as("mad"),
          expr("adev * 1000 DIV (mad + 1)").cast("long")
            .as("dev_ratio_milli"),
          (col("adev") > col("mad") * 3).as("flagged"))
        .orderBy(col("dev_ratio_milli").desc, col("event_type"), col("day"))
        .limit(20)
    },

    // ---- q183: value concentration (Pareto share) -----------------
    // The skew dashboard behind both capacity planning and q77/q96's
    // salting decisions: how much of each event type's total value
    // sits with the top decile of its users? Exact integer: values
    // on the cent lattice, decile by ceil-rank over (cents DESC,
    // user_id). The rank window partitions by event_type over the
    // per-user aggregate — the raw stream collapses in the first
    // keyed sum, so the sorted relation is #users x #types rows.
    QueryDef(
      "q183_value_concentration",
      """WITH u AS (SELECT event_type, user_id,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS cents
        |  FROM events GROUP BY event_type, user_id),
        |r AS (SELECT event_type, user_id, cents,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY cents DESC, user_id) AS rk,
        |    count(*) OVER (PARTITION BY event_type) AS n_users,
        |    sum(cents) OVER (PARTITION BY event_type) AS total FROM u)
        |SELECT event_type, CAST(max(n_users) AS BIGINT) AS n_users,
        |  CAST(max(total) AS BIGINT) AS total_cents,
        |  CAST(count(CASE WHEN rk <= (n_users + 9) // 10 THEN 1 END)
        |    AS BIGINT) AS top_decile_users,
        |  CAST(sum(CASE WHEN rk <= (n_users + 9) // 10 THEN cents
        |           ELSE 0 END) * 1000 // max(total) AS BIGINT)
        |    AS top_decile_share_milli
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin) {
      (s, d) =>
      val u = events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      val wt = Window.partitionBy(col("event_type"))
      u.withColumn("rk", row_number().over(
          wt.orderBy(col("cents").desc, col("user_id"))).cast("long"))
        .withColumn("n_users", count(lit(1)).over(wt))
        .withColumn("total", sum(col("cents")).over(wt))
        .groupBy(col("event_type"))
        .agg(max(col("n_users")).cast("long").as("n_users"),
          max(col("total")).cast("long").as("total_cents"),
          count(when(col("rk") <= expr("(n_users + 9) DIV 10"), 1))
            .cast("long").as("top_decile_users"),
          expr("sum(CASE WHEN rk <= (n_users + 9) DIV 10 THEN cents " +
            "ELSE 0L END) * 1000 DIV max(total)").cast("long")
            .as("top_decile_share_milli"))
        .orderBy(col("event_type"))
    },

    // ---- q184: CDC apply-order violation audit --------------------
    // The consistency check a downstream apply loop runs on its own
    // input: an UPDATE arriving immediately after a DELETE for the
    // same key (no reinsert between) is unapplyable — the row it
    // targets no longer exists. Either the publisher reordered, a
    // partial replay skipped an insert, or filters dropped it (B7's
    // actions option makes this easy to cause). Detection is one
    // lag window per key (user_id — millions of small partitions)
    // and one keyed count; first_viol_lsn gives the replay restart
    // point per damaged key.
    QueryDef(
      "q184_apply_order_audit",
      s"""WITH o AS (SELECT user_id, event_id,
         |    CASE event_type WHEN 'signup' THEN 'insert'
         |      WHEN 'error' THEN 'delete' ELSE 'update' END AS op,
         |    $tsSecSql AS ts_sec FROM events),
         |s AS (SELECT user_id, event_id, op,
         |    lag(op) OVER (PARTITION BY user_id
         |      ORDER BY ts_sec, event_id) AS prev_op FROM o),
         |v AS (SELECT user_id, event_id FROM s
         |      WHERE op = 'update' AND prev_op = 'delete')
         |SELECT user_id, count(*) AS n_viol,
         |  min(event_id) AS first_viol_lsn
         |FROM v GROUP BY user_id
         |ORDER BY n_viol DESC, user_id LIMIT 20""".stripMargin) { (s, d) =>
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"),
          when(col("event_type") === "signup", "insert")
            .when(col("event_type") === "error", "delete")
            .otherwise("update").as("op"),
          col("ts_sec"))
        .withColumn("prev_op", lag(col("op"), 1).over(wu))
        .filter(col("op") === "update" && col("prev_op") === "delete")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_viol"),
          min(col("event_id")).as("first_viol_lsn"))
        .orderBy(col("n_viol").desc, col("user_id"))
        .limit(20)
    },

    // ---- q280: slot retention accounting + disk-fill forecast ------
    // The operational hazard every logical-replication deployment
    // monitors: an unacked slot pins WAL on the server (the reference
    // ack path — `logical-replication-service.ts:274-294` — exists
    // precisely to advance `restart_lsn`), and a lagging consumer
    // fills the disk. This census treats the event log as the wire's
    // frame stream (q264's conventions: slot = event_id % 8, lsn =
    // event_id·4, frame bytes = 25-byte XLogData header + payload),
    // simulates per-slot ack floors that lag the head by
    // (slot+1)·25 frames, and reports per slot: the acked floor, the
    // retained frame count and bytes past it, the slot's observed
    // byte rate per hour, and the integer hours until a 1 MiB
    // retention cap — the pg_replication_slots dashboard as one
    // keyed aggregation. Scale shape: two keyed aggs over the frame
    // log (floor derivation, then retained rollup) + an 8-row
    // broadcast join; nothing holds more than k = #slots rows after
    // the scans.
    QueryDef(
      "q280_slot_retention_forecast",
      s"""WITH f AS (SELECT event_id, event_id % 8 AS shard,
         |    event_id * 4 AS lsn,
         |    25 + len(props) AS bytes, $tsSecSql AS ts_sec
         |  FROM events),
         |fl AS (SELECT shard,
         |    4 * (max(event_id) - 8 * (shard + 1) * 25) AS floor_lsn,
         |    CAST(sum(bytes) AS BIGINT) AS total_bytes,
         |    greatest(1, max(ts_sec) - min(ts_sec)) AS span_sec
         |  FROM f GROUP BY shard),
         |ret AS (SELECT f.shard, count(*) AS n_retained,
         |    CAST(sum(f.bytes) AS BIGINT) AS retained_bytes
         |  FROM f JOIN fl ON fl.shard = f.shard
         |  WHERE f.lsn > fl.floor_lsn GROUP BY f.shard)
         |SELECT fl.shard, CAST(fl.floor_lsn AS BIGINT) AS floor_lsn,
         |  CAST(coalesce(ret.n_retained, 0) AS BIGINT) AS n_retained,
         |  CAST(coalesce(ret.retained_bytes, 0) AS BIGINT)
         |    AS retained_bytes,
         |  CAST(fl.total_bytes * 3600 // fl.span_sec AS BIGINT)
         |    AS rate_bph,
         |  CAST(greatest(0, (1048576 - coalesce(ret.retained_bytes, 0))
         |    * fl.span_sec // (fl.total_bytes * 3600)) AS BIGINT)
         |    AS hours_to_cap
         |FROM fl LEFT JOIN ret ON ret.shard = fl.shard
         |ORDER BY fl.shard""".stripMargin) { (s, d) =>
      val f = events(s, d)
        .select((col("event_id") % 8).as("shard"),
          (col("event_id") * 4).as("lsn"),
          (lit(25) + length(col("props"))).cast("long").as("bytes"),
          col("ts_sec"), col("event_id"))
        .tcache() // floor derivation + retained rollup share the scan
      val fl = f.groupBy(col("shard"))
        .agg(((max(col("event_id")) - (col("shard") + 1) * lit(8) * 25) * 4)
            .as("floor_lsn"),
          sum(col("bytes")).as("total_bytes"),
          greatest(lit(1L), max(col("ts_sec")) - min(col("ts_sec")))
            .as("span_sec"))
      val ret = f.join(broadcast(fl.select(col("shard"),
            col("floor_lsn"))), Seq("shard"))
        .filter(col("lsn") > col("floor_lsn"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_retained"),
          sum(col("bytes")).as("retained_bytes"))
      fl.join(ret, Seq("shard"), "left")
        .select(col("shard"), col("floor_lsn").cast("long").as("floor_lsn"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("retained_bytes"), lit(0L)).as("retained_bytes"),
          expr("total_bytes * 3600 DIV span_sec").cast("long")
            .as("rate_bph"),
          expr("greatest(0, (1048576 - coalesce(retained_bytes, 0))" +
            " * span_sec DIV (total_bytes * 3600))").cast("long")
            .as("hours_to_cap"))
        .orderBy(col("shard"))
    },

    // ---- q289: frame-log erasure-exposure census --------------------
    // The oracle-gated twin of forgetBatch's `n_frames_retained`
    // (r14): an erasure cascade scrubs every DERIVED store, but the
    // raw replay log keeps a forgotten subject's change frames until
    // every slot's confirmed floor passes them (PG WAL semantics —
    // scrubbing under a live slot would desync resumed consumers).
    // This census states that exposure per shard, on q280's frame
    // conventions (shard = event_id % 8, lsn = event_id·4, per-slot
    // floors lagging the head): of the RETAINED (above-floor)
    // transactions, how many carry a forget-split subject
    // (md5-h32(user) % 17 = 3 — the erasure cohort), the exposure
    // fraction in milli, the highest exposed LSN (the floor every
    // slot must pass for this shard to read clean), and the retained
    // backlog at or below it (how much the laggard must consume
    // before retention-bounded compliance completes). Scale shape:
    // one shared frame scan → two keyed aggs + an 8-row broadcast
    // floor join; the subject split is a map-side hash predicate,
    // never a subject × log join.
    QueryDef(
      "q289_framelog_erasure_exposure",
      s"""WITH f AS (SELECT event_id, event_id % 8 AS shard,
         |    event_id * 4 AS lsn, user_id FROM events),
         |fl AS (SELECT shard,
         |    4 * (max(event_id) - 8 * (shard + 1) * 25) AS floor_lsn
         |  FROM f GROUP BY shard),
         |ret AS (SELECT f.shard, f.lsn, f.user_id,
         |    (${Text.h32Sql("CAST(f.user_id AS VARCHAR)")}) % 17 = 3
         |      AS exposed
         |  FROM f JOIN fl ON fl.shard = f.shard
         |  WHERE f.lsn > fl.floor_lsn),
         |agg AS (SELECT shard,
         |    count(*) AS n_retained,
         |    CAST(sum(CASE WHEN exposed THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_exposed,
         |    max(CASE WHEN exposed THEN lsn END) AS mxl
         |  FROM ret GROUP BY shard),
         |clr AS (SELECT r.shard, count(*) AS n_to_clear
         |  FROM ret r JOIN agg a ON a.shard = r.shard
         |  WHERE r.lsn <= a.mxl GROUP BY r.shard)
         |SELECT fl.shard, CAST(fl.floor_lsn AS BIGINT) AS floor_lsn,
         |  CAST(coalesce(a.n_retained, 0) AS BIGINT) AS n_retained,
         |  CAST(coalesce(a.n_exposed, 0) AS BIGINT) AS n_exposed,
         |  CAST(coalesce(a.n_exposed, 0) * 1000
         |    // greatest(1, coalesce(a.n_retained, 0)) AS BIGINT)
         |    AS exposure_milli,
         |  CAST(coalesce(a.mxl, -1) AS BIGINT) AS max_exposed_lsn,
         |  CAST(coalesce(c.n_to_clear, 0) AS BIGINT) AS n_to_clear
         |FROM fl LEFT JOIN agg a ON a.shard = fl.shard
         |LEFT JOIN clr c ON c.shard = fl.shard
         |ORDER BY fl.shard""".stripMargin) { (s, d) =>
      graft.cdc.GraftFunctions.register(s)
      val f = events(s, d)
        .select((col("event_id") % 8).as("shard"),
          (col("event_id") * 4).as("lsn"), col("user_id"))
        .tcache() // floor derivation + retained scan share it
      val fl = f.groupBy(col("shard"))
        .agg(((max(expr("lsn DIV 4")) - (col("shard") + 1) * lit(8) * 25)
          * 4).as("floor_lsn"))
      val ret = f.join(broadcast(fl), Seq("shard"))
        .filter(col("lsn") > col("floor_lsn"))
        .select(col("shard"), col("lsn"),
          (pmod(graft.cdc.GraftFunctions.md5_h32(
            col("user_id").cast("string")), lit(17L)) === 3L)
            .as("exposed"))
        .tcache() // exposure agg + backlog agg share it
      val agg = ret.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_retained"),
          sum(when(col("exposed"), 1L).otherwise(0L)).as("n_exposed"),
          max(when(col("exposed"), col("lsn"))).as("mxl"))
      val clr = ret.join(broadcast(agg.select(col("shard"), col("mxl"))),
          Seq("shard"))
        .filter(col("lsn") <= col("mxl"))
        .groupBy(col("shard")).agg(count(lit(1)).as("n_to_clear"))
      fl.join(agg, Seq("shard"), "left")
        .join(clr, Seq("shard"), "left")
        .select(col("shard"), col("floor_lsn").cast("long").as("floor_lsn"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_exposed"), lit(0L)).as("n_exposed"),
          expr("coalesce(n_exposed, 0) * 1000" +
            " DIV greatest(1, coalesce(n_retained, 0))")
            .as("exposure_milli"),
          coalesce(col("mxl"), lit(-1L)).as("max_exposed_lsn"),
          coalesce(col("n_to_clear"), lit(0L)).as("n_to_clear"))
        .orderBy(col("shard"))
    },

    // ---- q293: ack-lag SLO census per slot ---------------------------
    // q280 forecasts disk; this grades LATENCY — the other half of
    // the replication-slot dashboard. Model (q280's frame
    // conventions, shard = event_id % 8, lsn = event_id·4): each
    // consumer sends a standby-status ack every 32nd frame of its
    // shard (the reference's periodic-ack knob,
    // `logical-replication-service.ts` auto-ack machinery), so a
    // frame's ack latency is the gap between its own timestamp and
    // the timestamp of its group's closing frame — the tail of the
    // log is acked by the shard's final frame. Per slot: frames,
    // exact p50/p99 ack lag in seconds (order statistics, never an
    // interpolation), worst lag, and the fraction acked within a
    // 60 s SLO in milli. Scale shape: one shard-partitioned
    // row-number window to form ack groups, one (shard, group) keyed
    // agg for the closing timestamp, one shard-partitioned rank over
    // lags, then a k=#slots-row output — the log is scanned twice,
    // shuffled on its natural shard key both times.
    QueryDef(
      "q293_ack_lag_slo",
      s"""WITH f AS (SELECT event_id % 8 AS shard, event_id * 4 AS lsn,
         |    $tsSecSql AS ts_sec FROM events),
         |g AS (SELECT shard, lsn, ts_sec,
         |    (row_number() OVER (PARTITION BY shard ORDER BY lsn) - 1)
         |      // 32 AS grp
         |  FROM f),
         |ack AS (SELECT shard, grp, max(ts_sec) AS ack_ts
         |  FROM g GROUP BY shard, grp),
         |lagged AS (SELECT g.shard, g.lsn,
         |    greatest(0, ack.ack_ts - g.ts_sec) AS lag_sec
         |  FROM g JOIN ack ON ack.shard = g.shard AND ack.grp = g.grp),
         |r AS (SELECT shard, lag_sec, row_number() OVER (
         |    PARTITION BY shard ORDER BY lag_sec, lsn) AS rn,
         |    count(*) OVER (PARTITION BY shard) AS n
         |  FROM lagged)
         |SELECT shard, CAST(max(n) AS BIGINT) AS n_frames,
         |  CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lag_sec END)
         |    AS BIGINT) AS p50_lag_sec,
         |  CAST(max(CASE WHEN rn = (99 * n + 99) // 100 THEN lag_sec END)
         |    AS BIGINT) AS p99_lag_sec,
         |  CAST(max(lag_sec) AS BIGINT) AS max_lag_sec,
         |  CAST(sum(CASE WHEN lag_sec <= 60 THEN 1 ELSE 0 END) * 1000
         |    // max(n) AS BIGINT) AS slo_milli
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin) { (s, d) =>
      val f = events(s, d)
        .select((col("event_id") % 8).as("shard"),
          (col("event_id") * 4).as("lsn"), col("ts_sec"))
      val g = f.withColumn("grp",
          expr("(row_number() OVER (PARTITION BY shard ORDER BY lsn)" +
            " - 1) DIV 32"))
        .tcache() // group formation + closing-ts agg share the scan
      val ack = g.groupBy(col("shard"), col("grp"))
        .agg(max(col("ts_sec")).as("ack_ts"))
      val lagged = g.join(ack, Seq("shard", "grp"))
        .select(col("shard"), col("lsn"),
          greatest(lit(0L), col("ack_ts") - col("ts_sec")).as("lag_sec"))
      val wr = Window.partitionBy(col("shard"))
        .orderBy(col("lag_sec"), col("lsn"))
      val wn = Window.partitionBy(col("shard"))
      lagged.withColumn("rn", row_number().over(wr))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("shard"))
        .agg(max(col("n")).as("n_frames"),
          max(when(col("rn") === expr("(n + 1) DIV 2"),
            col("lag_sec"))).as("p50_lag_sec"),
          max(when(col("rn") === expr("(99 * n + 99) DIV 100"),
            col("lag_sec"))).as("p99_lag_sec"),
          max(col("lag_sec")).as("max_lag_sec"),
          expr("sum(CASE WHEN lag_sec <= 60 THEN 1 ELSE 0 END) * 1000" +
            " DIV max(n)").as("slo_milli"))
        .orderBy(col("shard"))
    },

    // ---- q297: session-gap parameter sweep -----------------------------
    // q18 sessionizes at ONE inactivity gap; this prices the choice —
    // the session-window timeout every streaming sessionization
    // (Events session windows, `StreamOps` stateful variants) must
    // pick. Per candidate gap: total sessions, sessions per user and
    // mean events per session in milli — read the elbow, pick the
    // gap. One lag window (user-partitioned) computes every
    // inter-event delta ONCE; the sweep is a 4-row broadcast spine
    // against the delta stream, never a re-sessionization per
    // candidate. Scale shape: one keyed window + one keyed agg;
    // output is 4 rows.
    QueryDef(
      "q297_session_gap_sweep",
      s"""WITH e AS (SELECT user_id, event_id, $tsSecSql AS ts_sec
         |           FROM events),
         |dl AS (SELECT user_id, ts_sec - lag(ts_sec) OVER (
         |    PARTITION BY user_id ORDER BY ts_sec, event_id) AS delta
         |  FROM e),
         |spine AS (SELECT * FROM (VALUES (60), (300), (900), (3600))
         |          g(gap_sec)),
         |agg AS (SELECT s.gap_sec,
         |    sum(CASE WHEN dl.delta IS NULL OR dl.delta >= s.gap_sec
         |        THEN 1 ELSE 0 END) AS n_sessions,
         |    count(*) AS n_events
         |  FROM dl CROSS JOIN spine s GROUP BY 1),
         |u AS (SELECT count(DISTINCT user_id) AS n_users FROM e)
         |SELECT CAST(a.gap_sec AS BIGINT) AS gap_sec,
         |  CAST(a.n_sessions AS BIGINT) AS n_sessions,
         |  CAST(a.n_sessions * 1000 // u.n_users AS BIGINT)
         |    AS sess_per_user_milli,
         |  CAST(a.n_events * 1000 // a.n_sessions AS BIGINT)
         |    AS events_per_sess_milli
         |FROM agg a CROSS JOIN u ORDER BY gap_sec""".stripMargin) {
      (s, d) =>
      val e = events(s, d)
        .select(col("user_id"), col("event_id"), col("ts_sec"))
        .tcache() // the lag-delta stream + the user count share it
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      val dl = e.select(
        (col("ts_sec") - lag(col("ts_sec"), 1).over(wu)).as("delta"))
      val spine = {
        val ss = s; import ss.implicits._
        Seq(60L, 300L, 900L, 3600L).toDF("gap_sec")
      }
      val agg = dl.crossJoin(broadcast(spine))
        .groupBy(col("gap_sec"))
        .agg(sum(when(col("delta").isNull ||
            col("delta") >= col("gap_sec"), 1L).otherwise(0L))
            .as("n_sessions"),
          count(lit(1)).as("n_events"))
      val u = e.agg(countDistinct(col("user_id")).as("n_users"))
      agg.crossJoin(broadcast(u))
        .select(col("gap_sec"), col("n_sessions"),
          expr("n_sessions * 1000 DIV n_users")
            .as("sess_per_user_milli"),
          expr("n_events * 1000 DIV n_sessions")
            .as("events_per_sess_milli"))
        .orderBy(col("gap_sec"))
    },

    // ---- q298: watermark-lateness sweep --------------------------------
    // The other streaming parameter with no free lunch: a short
    // watermark drops late data, a long one holds state. On the
    // q280 frame conventions (shard = event_id % 8 = the arrival
    // stream, event_id = arrival order within it), an event's
    // lateness is how far the shard's running max event-time had
    // already passed it on arrival. Per candidate delay: events that
    // a `withWatermark(delay)` would drop, in ppm — read the knee,
    // pick the delay. Scale shape: lateness is ONE shard-partitioned
    // running-max window over the log; the sweep is a 4-row
    // broadcast spine against the lateness stream — never a
    // re-ingestion per candidate.
    QueryDef(
      "q298_watermark_lateness_sweep",
      s"""WITH f AS (SELECT event_id % 8 AS shard, event_id,
         |    $tsSecSql AS ts_sec FROM events),
         |lt AS (SELECT greatest(0, max(ts_sec) OVER (
         |      PARTITION BY shard ORDER BY event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    - ts_sec) AS late_sec
         |  FROM f),
         |spine AS (SELECT * FROM (VALUES (0), (60), (300), (1800))
         |          d(delay_sec))
         |SELECT CAST(s.delay_sec AS BIGINT) AS delay_sec,
         |  count(*) AS n_events,
         |  CAST(sum(CASE WHEN lt.late_sec > s.delay_sec
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN lt.late_sec > s.delay_sec
         |      THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
         |    AS drop_ppm
         |FROM lt CROSS JOIN spine s
         |GROUP BY 1 ORDER BY delay_sec""".stripMargin) { (s, d) =>
      val ws = Window.partitionBy(col("shard")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val lt = events(s, d)
        .select((col("event_id") % 8).as("shard"), col("event_id"),
          col("ts_sec"))
        .select(greatest(lit(0L),
          max(col("ts_sec")).over(ws) - col("ts_sec")).as("late_sec"))
      val spine = {
        val ss = s; import ss.implicits._
        Seq(0L, 60L, 300L, 1800L).toDF("delay_sec")
      }
      lt.crossJoin(broadcast(spine))
        .groupBy(col("delay_sec"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("late_sec") > col("delay_sec"), 1L)
            .otherwise(0L)).as("n_dropped"))
        .withColumn("drop_ppm",
          expr("n_dropped * 1000000 DIV n_events"))
        .orderBy(col("delay_sec"))
    }
  )
}
