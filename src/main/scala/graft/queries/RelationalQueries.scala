package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import QueryDef.sql

/** General relational layer, verified against the DuckDB oracle
  * (SURVEY.md §2.7/§2.10 — absent from the reference, required of the
  * engine). Each query is written Spark-first and scale-aware:
  * dimension joins broadcast, aggregates rely on map-side partials,
  * windows shuffle once on their partition keys.
  */
object RelationalQueries {

  val all: Seq[QueryDef] = Seq(

    sql("q01_pricing_summary")(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_extendedprice), 4) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    sql("q02_top_revenue_orders")(
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |GROUP BY l_orderkey
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    sql("q03_nation_revenue")(
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY n_name
        |ORDER BY n_name""") { (s, d) =>
      // nation (25 rows) and customer (0.015% of lineitem) broadcast; the
      // only large shuffle is the lineitem⋈orders key exchange.
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    sql("q04_priority_with_big_item")(
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, d) =>
      Tables.orders(s, d)
        .join(
          Tables.lineitem(s, d).filter(col("l_quantity") > 45).select(col("l_orderkey")),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },

    sql("q05_region_revenue")(
      """SELECT r_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |JOIN orders ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
        |GROUP BY r_name
        |ORDER BY r_name""") { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("r_name"))
    },

    sql("q06_forecast_revenue")(
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))
    },

    sql("q07_top_parts_per_brand")(
      """SELECT p_brand, p_partkey, p_retailprice
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand
        |                           ORDER BY p_retailprice DESC, p_partkey) AS rn
        |      FROM part) t
        |WHERE rn <= 3
        |ORDER BY p_brand, p_partkey""") { (s, d) =>
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .orderBy(col("p_brand"), col("p_partkey"))
    },

    sql("q08_running_spend")(
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""") { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    sql("q09_event_value_delta")(
      """SELECT user_id, event_id,
        |  round(value - lag(value) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id), 4) AS delta
        |FROM events
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          round(col("value") - lag(col("value"), 1).over(w), 4).as("delta"))
        .orderBy(col("user_id"), col("event_id"))
    },

    sql("q10_customers_with_orders")(
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    sql("q11_customers_without_orders")(
      """SELECT c_custkey, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },

    sql("q12_setops")(
      """SELECT 'intersect' AS op, c_custkey FROM
        |  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
        |   INTERSECT
        |   SELECT o_custkey FROM orders) x
        |UNION ALL
        |SELECT 'except' AS op, c_custkey FROM
        |  (SELECT c_custkey FROM customer
        |   EXCEPT
        |   SELECT o_custkey FROM orders) y
        |ORDER BY op, c_custkey""") { (s, d) =>
      val cust = Tables.customer(s, d)
      val ord = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      val inter = cust.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        .intersect(ord).select(lit("intersect").as("op"), col("c_custkey"))
      val exc = cust.select(col("c_custkey"))
        .except(ord).select(lit("except").as("op"), col("c_custkey"))
      inter.unionAll(exc).orderBy(col("op"), col("c_custkey"))
    },

    sql("q13_distinct_counts")(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS distinct_parts,
        |  count(DISTINCT l_suppkey) AS distinct_supps,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("distinct_parts"),
          countDistinct(col("l_suppkey")).as("distinct_supps"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    sql("q14_value_percentiles")(
      """SELECT event_type,
        |  round(quantile_cont(value, 0.5), 4) AS p50,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(max(value), 4) AS vmax
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(max(col("value")), 4).as("vmax"))
        .orderBy(col("event_type"))
    },

    sql("q15_value_dispersion")(
      """SELECT event_type,
        |  round(stddev_samp(value), 4) AS sd,
        |  round(var_samp(value), 4) AS variance,
        |  round(avg(value), 4) AS mean
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          round(stddev_samp(col("value")), 4).as("sd"),
          round(var_samp(col("value")), 4).as("variance"),
          round(avg(col("value")), 4).as("mean"))
        .orderBy(col("event_type"))
    },

    sql("q16_rollup_customers")(
      """SELECT r_name, n_name, count(*) AS n_customers
        |FROM region
        |JOIN nation ON n_regionkey = r_regionkey
        |JOIN customer ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""") { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },

    // CUBE grouping sets: all four (event_type, user-band) grouping
    // combinations in one aggregation pass — the other half of q16's
    // ROLLUP coverage
    sql("q27_cube_events")(
      """SELECT event_type, cast(user_id % 3 AS BIGINT) AS user_band,
        |  cast(count(*) AS BIGINT) AS n,
        |  round(sum(value), 4) + 0.0 AS value_sum
        |FROM events
        |GROUP BY CUBE(event_type, user_id % 3)
        |ORDER BY event_type NULLS FIRST, user_band NULLS FIRST""") { (s, d) =>
      Tables.events(s, d)
        .cube(col("event_type"), (col("user_id") % 3).as("user_band"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("value")), 4) + 0.0).as("value_sum"))
        .orderBy(col("event_type").asc_nulls_first, col("user_band").asc_nulls_first)
    },

    sql("q17_status_pivot")(
      """SELECT o_orderpriority,
        |  round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS total_f,
        |  round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE 0 END), 2) AS total_o,
        |  round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice ELSE 0 END), 2) AS total_p
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, d) =>
      def tot(status: String) =
        round(sum(when(col("o_orderstatus") === status, col("o_totalprice")).otherwise(0)), 2)
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(tot("F").as("total_f"), tot("O").as("total_o"), tot("P").as("total_p"))
        .orderBy(col("o_orderpriority"))
    },

    sql("q18_common_sizes_per_type")(
      """SELECT p_type, p_size, cnt
        |FROM (SELECT p_type, p_size, count(*) AS cnt,
        |        dense_rank() OVER (PARTITION BY p_type
        |                           ORDER BY count(*) DESC, p_size) AS dr
        |      FROM part GROUP BY p_type, p_size) t
        |WHERE dr <= 2
        |ORDER BY p_type, p_size""") { (s, d) =>
      val w = Window.partitionBy(col("p_type")).orderBy(col("cnt").desc, col("p_size"))
      Tables.part(s, d)
        .groupBy(col("p_type"), col("p_size"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("dr", dense_rank().over(w))
        .filter(col("dr") <= 2)
        .drop("dr")
        .orderBy(col("p_type"), col("p_size"))
    },

    sql("q19_value_bands")(
      """SELECT band, count(*) AS n, round(sum(value), 2) AS total
        |FROM events
        |JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 100.0),
        |             ('high', 100.0, 100000.0)) b(band, lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY band
        |ORDER BY band""") { (s, d) =>
      import s.implicits._
      // tiny literal dim table → broadcast nested-loop range join
      val bands = Seq(("low", 0.0, 50.0), ("mid", 50.0, 100.0),
        ("high", 100.0, 100000.0)).toDF("band", "lo", "hi")
      Tables.events(s, d)
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
        .orderBy(col("band"))
    },

    sql("q20_last_event_per_user")(
      """SELECT user_id,
        |  arg_max(value, event_id) AS last_value,
        |  max(event_id) AS last_event_id,
        |  count(*) AS n_events
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          max_by(col("value"), col("event_id")).as("last_value"),
          max(col("event_id")).as("last_event_id"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    },

    // gap-based sessionization via Spark's native session_window (one
    // shuffle on (user, merged window), batch and streaming identical —
    // graft.streaming.Sessionize); the oracle rebuilds the same sessions
    // with the classic gaps-and-islands lag + running-sum construction.
    // Session end = last event + gap, matching session_window's bound.
    sql("q21_session_windows")(
      """WITH lagged AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |),
        |sess AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM lagged
        |)
        |SELECT user_id,
        |  epoch_us(min(ts)) AS session_start_us,
        |  epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us,
        |  cast(count(*) AS BIGINT) AS n_events,
        |  round(sum(value), 4) AS total_value
        |FROM sess
        |GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""") { (s, d) =>
      graft.streaming.Sessionize
        .sessions(Tables.events(s, d), "ts", "user_id", "value")
        .orderBy(col("user_id"), col("session_start_us"))
    },

    // as-of (point-in-time) join: every event picks up the timestamp and
    // value of the most recent 'error' event of the same user at or
    // before its own timestamp. Spark has no ASOF JOIN — the engine's
    // operators/AsOfJoin does it with ONE key shuffle and a running
    // last(ignoreNulls) window, no join node and no range explosion; the
    // oracle is DuckDB's native ASOF LEFT JOIN over the same tables.
    sql("q22_asof_join")(
      """WITH cp AS (
        |  SELECT user_id, ts, max(value) AS value FROM events
        |  WHERE event_type = 'error' GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  epoch_us(cp.ts) AS err_ts_us, cp.value AS err_value
        |FROM events e ASOF LEFT JOIN cp
        |  ON e.user_id = cp.user_id AND e.ts >= cp.ts
        |ORDER BY e.event_id""") { (s, d) =>
      val events = Tables.events(s, d)
      // One row per (user_id, ts): ties on the right timestamp would make
      // the propagated payload sort-order-dependent (AsOfJoin contract).
      val checkpoints = events.filter(col("event_type") === "error")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("value"))
      graft.operators.AsOfJoin.asOf(
          events.select(col("event_id"), col("user_id"), col("ts")),
          checkpoints, keys = Seq("user_id"),
          leftTsCol = "ts", rightTsCol = "ts",
          payload = Seq("ts", "value"), outPrefix = "err_")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          unix_micros(col("err_ts")).as("err_ts_us"),
          col("err_value"))
        .orderBy(col("event_id"))
    },

    // interval-containment join: attach to every event the session
    // window [start, end) that contains it (sessions are themselves an
    // engine product — q21's session_window aggregation). Spark would
    // plan the point-in-interval predicate as a nested-loop join; the
    // engine's operators/RangeJoin bucketizes both sides so it becomes
    // an equi-join on (user, bucket) + a residual containment filter.
    // The oracle rebuilds the same sessions with gaps-and-islands SQL
    // and joins with the raw inequality (DuckDB IEJoin).
    sql("q23_interval_join")(
      """WITH lagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |),
        |sess AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM lagged
        |),
        |agg AS (
        |  SELECT user_id,
        |    epoch_us(min(ts)) AS session_start_us,
        |    epoch_us(max(ts) + INTERVAL 30 MINUTE) AS session_end_us
        |  FROM sess GROUP BY user_id, sid
        |)
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  a.session_start_us, a.session_end_us
        |FROM events e JOIN agg a ON e.user_id = a.user_id
        |  AND epoch_us(e.ts) >= a.session_start_us
        |  AND epoch_us(e.ts) < a.session_end_us
        |ORDER BY e.event_id""") { (s, d) =>
      val events = Tables.events(s, d)
      val sessions = graft.streaming.Sessionize
        .sessions(events, "ts", "user_id", "value")
        .select(col("user_id"), col("session_start_us"), col("session_end_us"))
      graft.operators.RangeJoin.interval(
          events.select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us")),
          sessions, keys = Seq("user_id"),
          ptCol = "ts_us", loCol = "session_start_us",
          hiCol = "session_end_us",
          bucketWidth = 30L * 60L * 1000000L)
        .select(col("event_id"), col("user_id"), col("ts_us"),
          col("session_start_us"), col("session_end_us"))
        .orderBy(col("event_id"))
    },

    // Ordered funnel analysis: per user, the signup → click → purchase
    // progression where each step must occur strictly AFTER the
    // previous step's first completion — the classic product-analytics
    // sequence query. All timestamp math is integer microseconds in
    // BOTH engines (no ns-vs-µs comparison semantics); every stage is a
    // user-keyed aggregation/join, so the whole funnel is three
    // hash-partitioned passes — no window over the event log.
    sql("q24_funnel_stages")(
      """WITH ue AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS tsu FROM events
        |),
        |s AS (SELECT user_id, min(tsu) AS ts_s FROM ue
        |      WHERE event_type = 'signup' GROUP BY user_id),
        |c AS (SELECT ue.user_id, min(tsu) AS ts_c FROM ue JOIN s USING (user_id)
        |      WHERE event_type = 'click' AND tsu > ts_s GROUP BY ue.user_id),
        |p AS (SELECT ue.user_id, min(tsu) AS ts_p FROM ue JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND tsu > ts_c GROUP BY ue.user_id),
        |u AS (SELECT DISTINCT user_id FROM ue)
        |SELECT u.user_id,
        |  CASE WHEN ts_p IS NOT NULL THEN 3
        |       WHEN ts_c IS NOT NULL THEN 2
        |       WHEN ts_s IS NOT NULL THEN 1 ELSE 0 END AS funnel_stage,
        |  coalesce(ts_s, -1) AS signup_us,
        |  coalesce(ts_c, -1) AS first_click_us,
        |  coalesce(ts_p, -1) AS purchase_us
        |FROM u LEFT JOIN s USING (user_id) LEFT JOIN c USING (user_id)
        |  LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id""") { (s, d) =>
      val ue = Tables.events(s, d).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tsu"))
      val su = ue.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("tsu")).as("ts_s"))
      val cl = ue.join(su, "user_id")
        .filter(col("event_type") === "click" && col("tsu") > col("ts_s"))
        .groupBy(col("user_id")).agg(min(col("tsu")).as("ts_c"))
      val pu = ue.join(cl, "user_id")
        .filter(col("event_type") === "purchase" && col("tsu") > col("ts_c"))
        .groupBy(col("user_id")).agg(min(col("tsu")).as("ts_p"))
      ue.select(col("user_id")).distinct()
        .join(su, Seq("user_id"), "left")
        .join(cl, Seq("user_id"), "left")
        .join(pu, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("ts_p").isNotNull, 3)
            .when(col("ts_c").isNotNull, 2)
            .when(col("ts_s").isNotNull, 1).otherwise(0).as("funnel_stage"),
          coalesce(col("ts_s"), lit(-1L)).as("signup_us"),
          coalesce(col("ts_c"), lit(-1L)).as("first_click_us"),
          coalesce(col("ts_p"), lit(-1L)).as("purchase_us"))
        .orderBy(col("user_id"))
    },

    // Weekly cohort retention: users grouped by first-activity week,
    // retention = share of the cohort active in each later week — the
    // other product-analytics staple. Both engines truncate to ISO
    // Monday weeks; offsets are exact day-diffs / 7 (both weeks are
    // truncated, so the difference is always a multiple of 7).
    sql("q25_cohort_retention")(
      """WITH ue AS (
        |  SELECT user_id, date_trunc('week', ts) AS wk FROM events
        |),
        |firstwk AS (SELECT user_id, min(wk) AS cohort FROM ue GROUP BY user_id),
        |cohorts AS (SELECT cohort, count(*) AS n0 FROM firstwk GROUP BY cohort),
        |act AS (SELECT DISTINCT user_id, wk FROM ue),
        |ret AS (
        |  SELECT f.cohort,
        |    cast(date_diff('day', f.cohort, a.wk) // 7 AS INT) AS week_offset,
        |    cast(count(*) AS BIGINT) AS n_active
        |  FROM act a JOIN firstwk f USING (user_id)
        |  GROUP BY 1, 2)
        |SELECT epoch_us(r.cohort) AS cohort_us, week_offset, n_active,
        |  round(n_active / n0::DOUBLE, 4) AS retention
        |FROM ret r JOIN cohorts co ON r.cohort = co.cohort
        |ORDER BY cohort_us, week_offset""") { (s, d) =>
      val ue = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val firstwk = ue.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      val cohorts = firstwk.groupBy(col("cohort")).agg(count(lit(1)).as("n0"))
      val act = ue.distinct()
      // act is (user_id, wk)-distinct and wk determines the group, so a
      // plain count equals count(DISTINCT user) at one agg pass less
      act.join(firstwk, "user_id")
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int").as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(cohorts, "cohort")
        .select(unix_micros(col("cohort")).as("cohort_us"), col("week_offset"),
          col("n_active"),
          round(col("n_active") / col("n0").cast("double"), 4).as("retention"))
        .orderBy(col("cohort_us"), col("week_offset"))
    },

    // Hopping-window aggregates: Spark's native window(ts, 1h, 15min)
    // assigns each event to its 4 overlapping hour windows — the
    // sliding-window shape streaming dashboards use, here as batch.
    // The oracle replays the assignment as integer-µs grid arithmetic
    // (each event's window starts are the 4 preceding 15-min marks),
    // which is exactly Spark's window-start formula.
    sql("q26_hopping_stats")(
      """SELECT ws_us, cast(count(*) AS BIGINT) AS n,
        |  round(sum(value), 4) + 0.0 AS value_sum
        |FROM (
        |  SELECT value,
        |    (epoch_us(ts) // 900000000 - k) * 900000000 AS ws_us
        |  FROM events, unnest([0, 1, 2, 3]) AS t(k)) x
        |GROUP BY ws_us
        |ORDER BY ws_us""") { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"))
        .agg(count(lit(1)).as("n"),
          (round(sum(col("value")), 4) + 0.0).as("value_sum"))
        .select(unix_micros(col("w.start")).as("ws_us"), col("n"), col("value_sum"))
        .orderBy(col("ws_us"))
    },

    // SCD2 dimension build (Kimball slowly-changing-dimension type 2)
    // from the event stream: collapse each user's CONSECUTIVE equal
    // event_type observations (gaps-and-islands via lag + running
    // change count), emit half-open validity intervals; the current
    // interval's valid_to is NULL. Everything — both windows, the
    // island aggregation, and the interval-chaining lead — partitions
    // by user_id, so the whole build is ONE user_id exchange; no
    // global window anywhere (unique (ts, event_id) ordering makes the
    // default window frames equal across engines).
    sql("q28_scd2_intervals")(
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |g AS (
        |  SELECT user_id, ts, event_type,
        |    sum(CASE WHEN prev IS NULL OR prev <> event_type THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM o),
        |iv AS (
        |  SELECT user_id, grp, min(event_type) AS event_type,
        |    min(ts) AS vf, count(*) AS n_events
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, grp::BIGINT AS version, event_type,
        |  epoch_us(vf) AS valid_from_us,
        |  epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY grp)) AS valid_to_us,
        |  n_events::BIGINT AS n_events
        |FROM iv
        |ORDER BY user_id, version""") { (s, d) =>
      // the island index IS the SCD2 version number; chaining and the
      // output order key on it, not valid_from, so several same-ts
      // events in one user can never make the result order-ambiguous
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .withColumn("grp",
          sum(when(col("prev").isNull || col("prev") =!= col("event_type"), 1)
            .otherwise(0)).over(wrun))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("event_type")).as("event_type"), min(col("ts")).as("vf"),
          count(lit(1)).as("n_events"))
      val chain = Window.partitionBy(col("user_id")).orderBy(col("grp"))
      iv.select(col("user_id"), col("grp").cast("long").as("version"),
          col("event_type"),
          unix_micros(col("vf")).as("valid_from_us"),
          unix_micros(lead(col("vf"), 1).over(chain)).as("valid_to_us"),
          col("n_events"))
        .orderBy(col("user_id"), col("version"))
    },

    // Trailing-window anomaly detection: hourly event counts per type,
    // z-scored against the PRECEDING 6 hours (frame excludes the
    // current row — the classic monitoring baseline). The hourly
    // aggregation and both window sums are pure integers; the mean /
    // sample-variance / sqrt are row-local double arithmetic on those
    // exact integers, so both engines compute identical bits. Windows
    // partition by event_type — no global window; z is NULL until the
    // baseline has ≥3 hours or when the baseline is constant.
    sql("q29_event_anomaly")(
      """WITH h AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |    count(*)::BIGINT AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, hour, n,
        |    (sum(n) OVER trail)::BIGINT AS s,
        |    (sum(n * n) OVER trail)::BIGINT AS s2,
        |    (count(*) OVER trail)::BIGINT AS k
        |  FROM h
        |  WINDOW trail AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, hour, n,
        |  CASE WHEN k >= 3 AND (k * s2 - s * s) > 0
        |       THEN round((n - s / k::DOUBLE)
        |            / sqrt((k * s2 - s * s) / (k::DOUBLE * (k - 1))), 4) + 0.0
        |       ELSE NULL END AS z
        |FROM w
        |ORDER BY event_type, hour""") { (s, d) =>
      val trail = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-6, -1)
      Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 3600000000").as("hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("hour"), col("n"),
          sum(col("n")).over(trail).as("s"),
          sum(col("n") * col("n")).over(trail).as("s2"),
          count(lit(1)).over(trail).as("k"))
        .select(col("event_type"), col("hour"), col("n"),
          when(col("k") >= 3 && (col("k") * col("s2") - col("s") * col("s")) > 0,
            round((col("n") - col("s") / col("k").cast("double")) /
              sqrt((col("k") * col("s2") - col("s") * col("s")) /
                (col("k").cast("double") * (col("k") - 1))), 4) + 0.0)
            .otherwise(lit(null).cast("double")).as("z"))
        .orderBy(col("event_type"), col("hour"))
    },

    // Time-grid gap fill with forward fill — the resampling step the
    // reference domain (sensor streams) runs before any comparison of
    // irregular channels: per user, an hourly grid spanning their
    // observations, each point carrying the latest value at-or-before
    // it. The per-hour "latest" is one max(struct(tsu, event_id,
    // value)) argmax (unique (tsu, event_id) makes it total); the fill
    // is last_value IGNORE NULLS over the user partition — everything
    // shuffles on user_id once. Values pass through untouched (no
    // arithmetic → bit-identical); the first grid point is always
    // observed, so no leading-null policy is needed.
    sql("q30_gap_fill")(
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 3600000000 AS hour,
        |    epoch_us(ts) AS tsu, event_id, value
        |  FROM events),
        |span AS (SELECT user_id, min(hour) AS h0, max(hour) AS h1
        |         FROM e GROUP BY user_id),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hour FROM span),
        |mt AS (SELECT user_id, hour, max(tsu) AS mtsu FROM e GROUP BY 1, 2),
        |me AS (
        |  SELECT e.user_id, e.hour, max(e.event_id) AS meid
        |  FROM e JOIN mt ON mt.user_id = e.user_id AND mt.hour = e.hour
        |    AND e.tsu = mt.mtsu
        |  GROUP BY 1, 2),
        |obs AS (
        |  SELECT e.user_id, e.hour, min(e.value) AS obs_v
        |  FROM e
        |  JOIN mt ON mt.user_id = e.user_id AND mt.hour = e.hour AND e.tsu = mt.mtsu
        |  JOIN me ON me.user_id = e.user_id AND me.hour = e.hour
        |    AND e.event_id = me.meid
        |  GROUP BY 1, 2)
        |SELECT g.user_id, g.hour,
        |  last_value(o.obs_v IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  o.obs_v IS NOT NULL AS observed
        |FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.hour = g.hour
        |ORDER BY g.user_id, g.hour""") { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 3600000000").as("hour"),
          unix_micros(col("ts")).as("tsu"), col("event_id"), col("value"))
      val grid = ev.groupBy(col("user_id"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hour"))
      val obs = ev.groupBy(col("user_id"), col("hour"))
        .agg(max(struct(col("tsu"), col("event_id"), col("value").as("v"))).as("m"))
        .select(col("user_id"), col("hour"), col("m.v").as("obs_v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(obs, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          last(col("obs_v"), ignoreNulls = true).over(w).as("value"),
          col("obs_v").isNotNull.as("observed"))
        .orderBy(col("user_id"), col("hour"))
    },

    // Event-type transition matrix (first-order Markov counts): per
    // user-ordered stream, count (prev → next) pairs and the per-row
    // transition probability as an integer fixed point. One user_id
    // window for the lag, one aggregation, one bounded window over the
    // |types|² transition rows for the row-normalizer — never over the
    // data.
    sql("q31_event_transitions")(
      """WITH o AS (
        |  SELECT user_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev
        |  FROM events),
        |c AS (
        |  SELECT prev AS from_type, event_type AS to_type,
        |    count(*)::BIGINT AS n
        |  FROM o WHERE prev IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  (10000 * n // sum(n) OVER (PARTITION BY from_type))::BIGINT AS p_e4
        |FROM c
        |ORDER BY from_type, to_type""") { (s, d) =>
      val lagW = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val c = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev", lag(col("event_type"), 1).over(lagW))
        .where(col("prev").isNotNull)
        .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      c.withColumn("tot",
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n"),
          expr("10000 * n div tot").as("p_e4"))
        .orderBy(col("from_type"), col("to_type"))
    },

    // Top-N-with-others rollup (the BI report staple): revenue by
    // nation, top 5 by revenue kept by name, the tail collapsed into
    // one OTHER row, plus integer fixed-point share-of-total. Rank by
    // (rounded revenue, name) so the cut is engine-independent; both
    // windows run over the 25 aggregated nation rows, never the data.
    sql("q32_top_nations_others")(
      """WITH rev AS (
        |  SELECT n.n_name AS nation,
        |    round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n ON n.n_nationkey = c.c_nationkey
        |  GROUP BY n.n_name),
        |rk AS (
        |  SELECT nation, revenue,
        |    row_number() OVER (ORDER BY revenue DESC, nation) AS rnk
        |  FROM rev),
        |grouped AS (
        |  SELECT CASE WHEN rnk <= 5 THEN nation ELSE 'OTHER' END AS bucket,
        |    min(CASE WHEN rnk <= 5 THEN rnk ELSE 6 END) AS ord,
        |    round(sum(revenue), 2) AS revenue
        |  FROM rk GROUP BY 1)
        |SELECT bucket, revenue,
        |  floor(10000 * revenue / sum(revenue) OVER ())::BIGINT AS share_e4
        |FROM grouped
        |ORDER BY ord, bucket""") { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.nation(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      val rk = rev.withColumn("rnk", row_number().over(
        Window.orderBy(col("revenue").desc, col("nation"))))
      val grouped = rk
        .groupBy(when(col("rnk") <= 5, col("nation")).otherwise("OTHER")
          .as("bucket"))
        .agg(min(when(col("rnk") <= 5, col("rnk")).otherwise(6)).as("ord"),
          round(sum(col("revenue")), 2).as("revenue"))
      grouped
        .withColumn("tot", sum(col("revenue")).over(
          Window.partitionBy()))
        .select(col("bucket"), col("revenue"),
          floor(lit(10000) * col("revenue") / col("tot")).cast("long")
            .as("share_e4"), col("ord"))
        .orderBy(col("ord"), col("bucket"))
        .drop("ord")
    }
  )
}
