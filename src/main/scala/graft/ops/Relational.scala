package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage over the TPC-H-ish tables: hash/partial
  * aggregation, broadcast + shuffle joins, semi/anti joins, window
  * functions (ranking + analytic), rollup/cube, set ops, top-k, and a
  * range (theta) join. These are the operators the reference delegates
  * to its consumers (SURVEY.md §2 Part C) expressed as native Spark
  * plans so Catalyst gets pushdown/pruning/join-selection for free.
  *
  * Scale notes (100 TB): every aggregate here is a partial+final hash
  * agg (map-side combine); dimension joins (`nation`, `region`,
  * `supplier`, buckets) are explicitly `broadcast()`; fact-fact joins
  * (orders × lineitem) shuffle on the join key only, and AQE can
  * re-plan skew at runtime. No driver-side loops, no collects.
  */
object Relational {
  import Tables._

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
        |  CAST(floor(sum(l_quantity) * 10000 / count(*)) AS BIGINT) AS avg_qty_4,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          r2(sum(col("l_quantity"))).as("sum_qty"),
          r2(sum(col("l_extendedprice"))).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("sum_disc_price"),
          floor(sum(col("l_quantity")) * 10000 / count(lit(1))).cast("long")
            .as("avg_qty_4"),
          r4(avg(col("l_discount"))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    QueryDef(
      "q02_region_segment_sales",
      """SELECT r_name, c_mktsegment,
        |  count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS acctbal_sum
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, c_mktsegment
        |ORDER BY r_name, c_mktsegment""".stripMargin) { (s, d) =>
      customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
             r2(sum(col("c_acctbal"))).as("acctbal_sum"))
        .orderBy(col("r_name"), col("c_mktsegment"))
    },

    QueryDef(
      "q03_top_building_orders",
      """SELECT o_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
        |  o_orderdate
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      // the segment-filtered customer side is pruned to one key column
      // but still scales linearly with SF, so the broadcast-vs-shuffle
      // choice is left to Catalyst/AQE size estimates (it broadcasts
      // at bench scale, and falls back to a shuffle join at SFs where
      // a forced broadcast would OOM)
      customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .join(orders(s, d), col("c_custkey") === col("o_custkey"))
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .join(lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > lit("1997-01-01").cast("timestamp"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
        .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    QueryDef(
      "q105_decimal_ledger",
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS gross_cents,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
        |    AS BIGINT) AS net_e4,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      // Financial-grade exact aggregation: money is fixed to integer
      // cents at the scan edge (2-decimal values round exactly, never
      // on a half-ulp boundary) and every downstream op — the
      // discount multiply against an integer percent and the
      // partial+final sum — is exact int64 arithmetic, associative
      // and commutative, so the result is independent of partition
      // count, merge order, and AQE re-planning, unlike double sums
      // whose low bits drift with reduction shape. net lands in 1e-4
      // currency units (cents × integer percent). Integer outputs
      // also keep the oracle in int64: DuckDB's DECIMAL(38,x) /
      // HUGEINT sums hash differently driver-side even when values
      // match. Headroom: ~9e9 rows/group before int64 net overflows —
      // beyond that, regroup finer or widen to decimal internally.
      // The per-row fixing is free inside codegen; only the final
      // sums cross the shuffle (one struct per nation per partition).
      // nation broadcasts; orders/customer joins shuffle on keys.
      val li = lineitem(s, d).select(col("l_orderkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_discount") * 100).cast("long").as("disc_pct"))
      li.join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation(s, d).select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum(col("cents")).as("gross_cents"),
          sum(col("cents") * (lit(100L) - col("disc_pct"))).as("net_e4"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    QueryDef(
      "q114_ordered_string_agg",
      """WITH d AS (SELECT DISTINCT o_orderstatus, o_orderpriority
        |           FROM orders)
        |SELECT o_orderstatus,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority)
        |    AS priorities,
        |  count(*) AS n_priorities
        |FROM d GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) {
      (s, d) =>
        // ordered string aggregation (listagg surface): collect_set
        // is unordered and collect_list partition-order-dependent, so
        // the canonical form is array_sort before array_join — the
        // only deterministic way to serialize a group's members to a
        // string in a distributed engine, and byte-identical to the
        // oracle's ORDER BY'd string_agg over the distinct pairs.
        orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            array_join(array_sort(collect_set(col("o_orderpriority"))), ",")
              .as("priorities"),
            size(collect_set(col("o_orderpriority"))).cast("long")
              .as("n_priorities"))
          .orderBy(col("o_orderstatus"))
    },

    QueryDef(
      "q04_late_shipment_semi",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) {
      (s, d) =>
        val o = orders(s, d)
        val li = lineitem(s, d)
        o.join(li,
            li("l_orderkey") === o("o_orderkey") &&
              li("l_shipdate") > o("o_orderdate") + expr("INTERVAL 90 DAY"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
    },

    QueryDef(
      "q05_customers_without_orders",
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      val c = customer(s, d)
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("c_mktsegment"))
    },

    QueryDef(
      "q06_revenue_forecast",
      """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"))
    },

    QueryDef(
      "q07_topk_parts_per_brand",
      """SELECT p_brand, rn, p_partkey, p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand
        |      ORDER BY p_retailprice DESC, p_partkey) AS rn
        |  FROM part) WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      part(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn"), col("p_partkey"),
                col("p_retailprice"))
        .orderBy(col("p_brand"), col("rn"))
    },

    QueryDef(
      "q08_customer_order_running",
      """SELECT o_custkey, o_orderkey,
        |  round(lag(o_totalprice) OVER w, 2) AS prev_price,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |    AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .withColumn("prev_price", r2(lag(col("o_totalprice"), 1).over(w)))
        .withColumn("running_total",
          r2(sum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
        .select(col("o_custkey"), col("o_orderkey"), col("prev_price"),
                col("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    QueryDef(
      "q09_rollup_returns",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(r2(sum(col("l_quantity"))).as("sum_qty"),
             count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
                coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
                col("sum_qty"), col("n_rows"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    QueryDef(
      "q10_cube_order_status",
      """SELECT coalesce(o_orderstatus, 'ALL') AS orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS orderpriority,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY orderstatus, orderpriority""".stripMargin) { (s, d) =>
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             r2(sum(col("o_totalprice"))).as("total_price"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
                coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
                col("n_orders"), col("total_price"))
        .orderBy(col("orderstatus"), col("orderpriority"))
    },

    QueryDef(
      "q12_custkey_setops",
      """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |             AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'),
        |     b AS (SELECT DISTINCT o_custkey AS custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |             AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
        |SELECT 'both' AS tag, custkey FROM (SELECT custkey FROM a
        |  INTERSECT SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'only_1995' AS tag, custkey FROM (SELECT custkey FROM a
        |  EXCEPT SELECT custkey FROM b)
        |UNION ALL
        |SELECT 'only_1996' AS tag, custkey FROM (SELECT custkey FROM b
        |  EXCEPT SELECT custkey FROM a)
        |ORDER BY tag, custkey""".stripMargin) { (s, d) =>
      val o = orders(s, d)
      def yr(from: String, to: String) = o
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(to).cast("timestamp"))
        .select(col("o_custkey").as("custkey")).distinct()
      val a = yr("1995-01-01", "1996-01-01")
      val b = yr("1996-01-01", "1997-01-01")
      a.intersect(b).select(lit("both").as("tag"), col("custkey"))
        .unionAll(a.except(b).select(lit("only_1995").as("tag"), col("custkey")))
        .unionAll(b.except(a).select(lit("only_1996").as("tag"), col("custkey")))
        .orderBy(col("tag"), col("custkey"))
    },

    QueryDef(
      "q13_top_suppliers_per_nation",
      """SELECT n_name, rn, s_name, revenue FROM (
        |  SELECT n_name, s_name, revenue,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY revenue DESC, s_suppkey) AS rn
        |  FROM (SELECT l_suppkey,
        |          round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        |        FROM lineitem GROUP BY l_suppkey)
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey)
        |WHERE rn <= 2 ORDER BY n_name, rn""".stripMargin) { (s, d) =>
      val rev = lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
      rev
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("n_name"), col("rn"), col("s_name"), col("revenue"))
        .orderBy(col("n_name"), col("rn"))
    },

    QueryDef(
      "q57_topk_udaf",
      """SELECT n_name, rank, s_name, s_acctbal FROM (
        |  SELECT n_name, s_name, s_acctbal,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY s_acctbal DESC, s_suppkey) AS rank
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
        |WHERE rank <= 3 ORDER BY n_name, rank""".stripMargin) { (s, d) =>
      // same result as the q13 window pattern, but through the custom
      // bounded TopK Aggregator: partial buffers are capped at k, so
      // the per-group shuffle carries k rows per map partition instead
      // of every supplier — the UDAF surface done scale-first
      val topk = udaf(new Aggregators.TopK(3))
      supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(topk(col("s_acctbal"), col("s_suppkey"), col("s_name")).as("top"))
        .select(col("n_name"), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col("n_name"), (col("pos") + 1).as("rank"),
          col("e")("payload").as("s_name"), col("e")("score").as("s_acctbal"))
        .orderBy(col("n_name"), col("rank"))
    },

    QueryDef(
      "q68_full_outer_diff",
      """WITH a AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |             AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
        |     b AS (SELECT DISTINCT o_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |             AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
        |SELECT CASE WHEN a.o_custkey IS NULL THEN 'added'
        |            WHEN b.o_custkey IS NULL THEN 'churned'
        |            ELSE 'retained' END AS status,
        |  count(*) AS n_customers
        |FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey
        |GROUP BY status ORDER BY status""".stripMargin) { (s, d) =>
      // snapshot reconciliation via FULL OUTER join — the diff shape
      // for comparing two materialized CDC snapshots (added / churned
      // / retained keys); both sides pre-reduce to distinct keys so
      // the join input is key-sized
      def yr(from: String, to: String) = orders(s, d)
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(to).cast("timestamp"))
        .select(col("o_custkey")).distinct()
      val a = yr("1996-01-01", "1997-01-01").withColumnRenamed("o_custkey", "a_key")
      val b = yr("1997-01-01", "1998-01-01").withColumnRenamed("o_custkey", "b_key")
      a.join(b, col("a_key") === col("b_key"), "full_outer")
        .select(when(col("a_key").isNull, "added")
          .when(col("b_key").isNull, "churned")
          .otherwise("retained").as("status"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("status"))
    },

    QueryDef(
      "q69_bag_setops",
      """WITH a AS (SELECT o_custkey FROM orders
        |           WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
        |     b AS (SELECT o_custkey FROM orders
        |           WHERE o_orderstatus = 'F')
        |SELECT 'except_all' AS op, count(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, count(*) AS n
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |ORDER BY op""".stripMargin) { (s, d) =>
      // bag-semantics set ops (multiplicity-aware EXCEPT ALL /
      // INTERSECT ALL) — the multiset complement of q12's distinct
      // set ops; Spark plans both as counted anti/semi aggregations
      val a = orders(s, d)
        .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey"))
      val b = orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      val ex = a.exceptAll(b).agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("n"))
      val in = a.intersectAll(b).agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("n"))
      ex.unionAll(in).orderBy(col("op"))
    },

    QueryDef(
      "q14_distinct_orders_parts",
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS n_orders,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_orderkey")).as("n_orders"),
               countDistinct(col("l_partkey")).as("n_parts"),
               count(lit(1)).as("n_rows"))
          .orderBy(col("l_returnflag"))
    },

    // HLL sketch audit — raw approx values differ across engines, so
    // the result exposes only engine-independent facts: the exact
    // distinct counts plus booleans asserting the HLL estimate sits
    // within a 10% envelope. At rsd=0.02 the error is probabilistic
    // (unlike q101's GK sketch, which has a hard bound), so the
    // envelope is 5x the rsd — a bound the estimator practically
    // never exceeds on ANY dataset — rather than a tight 2.5-sigma
    // one a new SF could trip. DuckDB pins the exact counts and the
    // flags as literal TRUE, turning the sketch's accuracy guarantee
    // into a hash-matched oracle row (same recipe as the q101
    // percentile_approx audit).
    QueryDef(
      "q39_approx_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  TRUE AS orders_within_10pct,
        |  TRUE AS parts_within_10pct
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
        lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("exact_orders"),
            countDistinct(col("l_partkey")).as("exact_parts"),
            approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"),
            approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
          .select(
            col("l_returnflag"), col("exact_orders"), col("exact_parts"),
            (abs(col("approx_orders") - col("exact_orders")) <=
              col("exact_orders") * 0.10).as("orders_within_10pct"),
            (abs(col("approx_parts") - col("exact_parts")) <=
              col("exact_parts") * 0.10).as("parts_within_10pct"))
          .orderBy(col("l_returnflag"))
    },

    QueryDef(
      "q15_price_bucket_range_join",
      """SELECT gs AS bucket_id, count(*) AS n_parts,
        |  round(avg(p_retailprice), 4) AS avg_price
        |FROM generate_series(0, 19) t(gs)
        |JOIN part ON p_retailprice >= 900.0 + gs * 5.0
        |         AND p_retailprice < 900.0 + (gs + 1) * 5.0
        |GROUP BY gs ORDER BY gs""".stripMargin) { (s, d) =>
      val buckets = s.range(0, 20).select(col("id").as("bucket_id"))
      part(s, d)
        .join(broadcast(buckets),
          col("p_retailprice") >= lit(900.0) + col("bucket_id") * 5.0 &&
            col("p_retailprice") < lit(900.0) + (col("bucket_id") + 1) * 5.0)
        .groupBy(col("bucket_id"))
        .agg(count(lit(1)).as("n_parts"),
             r4(avg(col("p_retailprice"))).as("avg_price"))
        .orderBy(col("bucket_id"))
    },

    QueryDef(
      "q70_corr_stats",
      """WITH b AS (SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |s AS (SELECT l_returnflag, count(*) AS n,
        |    sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM b GROUP BY l_returnflag)
        |SELECT l_returnflag, n AS n_rows,
        |  CAST(sx AS BIGINT) AS sum_qty, CAST(sy AS BIGINT) AS sum_price_cents,
        |  CAST(floor(10000.0 * (CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))))) AS BIGINT)
        |    AS corr_qty_price_4
        |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Pearson correlation from exact integer moments: Spark's corr()
      // and DuckDB's accumulate doubles in engine-dependent order, so
      // their outputs don't hash-match. Instead both engines sum exact
      // integers (quantity, price in cents; 128-bit sums — DECIMAL(38,0)
      // here, HUGEINT in the oracle) and apply the textbook formula with
      // an identical double-op sequence at the very end — one partial+
      // final keyed agg, overflow-safe at any row count, same plan shape
      // as plain corr() at scale.
      val d38 = "decimal(38,0)"
      val b = lineitem(s, d).select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      b.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast(d38).as("n"),
          sum(col("x").cast(d38)).as("sx"),
          sum(col("y").cast(d38)).as("sy"),
          sum((col("x") * col("y")).cast(d38)).as("sxy"),
          sum((col("x") * col("x")).cast(d38)).as("sxx"),
          sum((col("y") * col("y")).cast(d38)).as("syy"))
        .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
          col("sx").cast("long").as("sum_qty"),
          col("sy").cast("long").as("sum_price_cents"),
          floor(lit(10000.0) *
            ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
                sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double")))))
            .cast("long").as("corr_qty_price_4"))
        .orderBy(col("l_returnflag"))
    },

    // ---- q176: per-group trimmed mean -----------------------------
    // The robust location estimate between q88's mean/stddev (dragged
    // by outliers) and q152's median/MAD (discards all magnitude):
    // drop the bottom and top decile BY RANK and average the middle
    // 80% — the standard metric for price/latency dashboards where a
    // few fat-finger rows would otherwise move the mean. Exact
    // integer end to end: prices on the cent lattice (the q105
    // ledger recipe), rank over the total order (cents, orderkey,
    // linenumber), integer DIV for the mean. The rank window
    // partitions by returnflag (PlanGuard: never unpartitioned);
    // with few, huge groups at 100 TB the sort concentrates — the
    // production alternative is q166's histogram bisection to find
    // the two decile cut values, then one filtered agg; rank-based
    // trimming is the exact-tie-handling reference semantics.
    QueryDef(
      "q176_trimmed_mean",
      """WITH c AS (SELECT l_returnflag AS flag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    l_orderkey, l_linenumber FROM lineitem),
        |r AS (SELECT flag, cents,
        |    row_number() OVER (PARTITION BY flag
        |      ORDER BY cents, l_orderkey, l_linenumber) AS rk,
        |    count(*) OVER (PARTITION BY flag) AS n FROM c)
        |SELECT flag, CAST(max(n) AS BIGINT) AS n_items,
        |  count(*) AS n_kept,
        |  CAST(sum(cents) // count(*) AS BIGINT) AS trimmed_mean_cents
        |FROM r WHERE rk > n // 10 AND rk <= n - n // 10
        |GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
      // Order-statistics rewrite (r17, the r16-deferred proof sketch):
      // the rank window sorted EVERY lineitem row inside 3 flag
      // partitions — a 3-way-serialized sort whose wall was the whole
      // query. But the kept SUM doesn't depend on which tie-rows
      // survive: dropping the k = n DIV 10 lowest-ranked rows under
      // ANY total order extending (cents asc) drops all rows with
      // cents < b plus exactly (k − |cents < b|) rows AT the boundary
      // value b — identical sum either way. So aggregate to a
      // per-(flag, cents) HISTOGRAM first (map-side partial, one
      // small shuffle), run the cumulative window over histogram rows
      // (≈ distinct prices per flag, orders of magnitude fewer than
      // items), and subtract the trimmed mass with exact boundary
      // arithmetic. n_items / n_kept / trimmed_mean_cents are
      // value-identical (oracle-pinned at both SFs); no per-row sort
      // remains in the plan.
      import org.apache.spark.sql.expressions.Window
      val c = lineitem(s, d).select(
        col("l_returnflag").as("flag"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      val h = c.groupBy(col("flag"), col("cents"))
        .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("s"))
      val wOrd = Window.partitionBy(col("flag")).orderBy(col("cents"))
      val wAll = Window.partitionBy(col("flag"))
      val e = h
        .withColumn("cume", sum(col("cnt")).over(wOrd))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .withColumn("tot", sum(col("s")).over(wAll))
        .withColumn("k", expr("n DIV 10"))
        // bottom-k mass: buckets fully below the cut drop whole; the
        // boundary bucket drops only its first k − (cume − cnt) rows
        .withColumn("dbot",
          when(col("cume") <= col("k"), col("s"))
            .when(col("cume") - col("cnt") < col("k"),
              (col("k") - (col("cume") - col("cnt"))) * col("cents"))
            .otherwise(lit(0L)))
        // top-k mass, mirrored: rows ranked > n − k
        .withColumn("dtop",
          when(col("cume") - col("cnt") >= col("n") - col("k"), col("s"))
            .when(col("cume") > col("n") - col("k"),
              (col("cume") - (col("n") - col("k"))) * col("cents"))
            .otherwise(lit(0L)))
      e.groupBy(col("flag"))
        .agg(max(col("n")).cast("long").as("n_items"),
          (max(col("n")) - lit(2) * max(col("k"))).cast("long")
            .as("n_kept"),
          expr("(max(tot) - sum(dbot) - sum(dtop))" +
            " DIV (max(n) - 2 * max(k))").cast("long")
            .as("trimmed_mean_cents"))
        .orderBy(col("flag"))
    },

    // ---- q180: receivables aging by region ------------------------
    // The classic finance aging report (open balances bucketed by
    // 30/60/90 days outstanding) as a scale exercise: the "as of"
    // anchor is the dataset's own max order day (a 1-row broadcast,
    // never a driver-side collect), ages are integer day arithmetic,
    // money rides the cent lattice, and the three dimension hops
    // (customer, nation, region) broadcast — the fact table is
    // touched once with only keyed aggs after it. Buckets are CASE
    // ladders, not a bucket-table join.
    QueryDef(
      "q180_receivables_aging",
      """WITH o AS (SELECT o_custkey,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
        |      AS day
        |  FROM orders WHERE o_orderstatus <> 'F'),
        |mx AS (SELECT max(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
        |    o_orderdate)) AS refday FROM orders),
        |b AS (SELECT o_custkey, cents,
        |    CASE WHEN refday - day <= 30 THEN '00-30'
        |         WHEN refday - day <= 60 THEN '31-60'
        |         WHEN refday - day <= 90 THEN '61-90'
        |         ELSE '90+' END AS bucket
        |  FROM o CROSS JOIN mx)
        |SELECT r_name, bucket, count(*) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS open_cents
        |FROM b
        |JOIN customer ON c_custkey = o_custkey
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey
        |GROUP BY r_name, bucket ORDER BY r_name, bucket""".stripMargin) {
      (s, d) =>
      val epoch = lit("1995-01-01").cast("timestamp")
      val o = orders(s, d).filter(col("o_orderstatus") =!= "F")
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          datediff(col("o_orderdate"), epoch).as("day"))
      val mx = orders(s, d)
        .agg(max(datediff(col("o_orderdate"), epoch)).as("refday"))
      // nation x region collapses to a 25-row broadcast; customer is
      // fact-sized at scale, so it joins keyed (AQE picks the strategy)
      val nr = nation(s, d).select(col("n_nationkey"), col("n_regionkey"))
        .join(broadcast(region(s, d)
          .select(col("r_regionkey"), col("r_name"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("r_name"))
      val cust = customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("r_name"))
      o.crossJoin(broadcast(mx))
        .select(col("o_custkey"), col("cents"),
          when(col("refday") - col("day") <= 30, "00-30")
            .when(col("refday") - col("day") <= 60, "31-60")
            .when(col("refday") - col("day") <= 90, "61-90")
            .otherwise("90+").as("bucket"))
        .join(cust, col("c_custkey") === col("o_custkey"))
        .groupBy(col("r_name"), col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("cents")).cast("long").as("open_cents"))
        .orderBy(col("r_name"), col("bucket"))
    }
  )
}
