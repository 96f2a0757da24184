package graft.queries

import graft.Tables
import graft.ops.{AsOf, Inventory}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator coverage (SURVEY.md §2.3-§2.7): scans with
  * pushdown, equi/outer/semi/anti joins, grouped + distinct aggregation,
  * latest-per-key inventory, as-of join, windows/top-k, set ops, pivot,
  * session/tumbling windows.
  *
  * Determinism rules for the DuckDB hash-compare: money sums are summed
  * as DECIMAL (exact, order-independent) and only cast to double at the
  * end; timestamps are emitted as epoch milliseconds; every top-k has a
  * total tiebreak order.
  */
object Relational {
  private val d2 = DecimalType(18, 2)
  private val d4 = DecimalType(18, 4)

  val defs: Seq[QDef] = Seq(

    // §2.4 grouped sum — the reference's rewards rollup shape
    // (src/be_db_reward.erl:159-236): sum/count by group over the fact table.
    QDef("q1_agg",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(
            sum(col("l_quantity").cast(d2)).cast("double").as("sum_qty"),
            sum(col("l_extendedprice").cast(d2)).cast("double").as("sum_base_price"),
            sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(d4))
              .cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             |  count(*) AS count_order
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // §2.3 filter + projection — must push to the parquet scan.
    QDef("q2_filter_project",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .filter(col("l_quantity") < 10 && col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_partkey"), col("l_linenumber"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).cast(d4)
              .cast("double").as("revenue"))
      },
      Some("""SELECT l_orderkey, l_partkey, l_linenumber,
             |  CAST(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)) AS DOUBLE) AS revenue
             |FROM lineitem WHERE l_quantity < 10 AND l_discount > 0.05""".stripMargin)),

    // §2.5 multi-way equi join + agg; nation/region are broadcast dims.
    QDef("q3_join_agg",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = broadcast(Tables.nation(s, dir))
        val r = broadcast(Tables.region(s, dir))
        o.join(c, o("o_custkey") === c("c_custkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy("r_name", "n_name")
          .agg(sum(col("o_totalprice").cast(d2)).cast("double").as("total_spend"),
            count(lit(1)).as("n_orders"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
             |  count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // §2.5 left outer join with coalesce — the gateway_status candidate
    // shape (src/be_db_gateway_status.erl:67-83).
    QDef("q4_left_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val agg = Tables.orders(s, dir).groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            sum(col("o_totalprice").cast(d2)).cast("double").as("spend"))
        c.join(agg, c("c_custkey") === agg("o_custkey"), "left_outer")
          .select(col("c_custkey"), col("c_name"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"),
            coalesce(col("spend"), lit(0.0)).as("spend"))
      },
      Some("""SELECT c_custkey, c_name,
             |  coalesce(n_orders, 0) AS n_orders, coalesce(spend, 0.0) AS spend
             |FROM customer LEFT JOIN (
             |  SELECT o_custkey, count(*) AS n_orders,
             |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
             |  FROM orders GROUP BY o_custkey) o ON c_custkey = o_custkey""".stripMargin)),

    // §2.5 anti join — the geocoder's NOT EXISTS candidates
    // (src/be_db_geocoder.erl:33).
    QDef("q5_anti_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)""".stripMargin)),

    // §2.5 semi join (EXISTS).
    QDef("q6_semi_join",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val o = Tables.orders(s, dir).filter(col("o_totalprice") > 100000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .select("c_custkey", "c_nationkey")
      },
      Some("""SELECT c_custkey, c_nationkey FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)""".stripMargin)),

    // §2.4 latest-per-key argmax — inventory semantics
    // (migrations/1590689602:32-62) as one hash agg, no window sort.
    QDef("q7_latest_per_key",
      (s, dir) => {
        Inventory.latestPerKey(
          Tables.events(s, dir)
            .withColumn("value", col("value").cast(d2).cast("double")),
          key = Seq("user_id"), ver = "event_id",
          latestCols = Seq("event_type", "value"))
      },
      Some("""SELECT user_id,
             |  arg_max(event_type, event_id) AS last_event_type,
             |  CAST(arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS DOUBLE) AS last_value,
             |  min(event_id) AS first_event_id, max(event_id) AS last_event_id,
             |  count(*) AS n_rows
             |FROM events GROUP BY user_id""".stripMargin)),

    // §2.5 as-of join — oracle-price point-in-time lookup
    // (src/be_db_backfill.erl:288-299): for each purchase, the most recent
    // signup time of the same user at or before it.
    QDef("q8_asof_join",
      (s, dir) => {
        val e = Tables.events(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = e.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"),
            unix_millis(col("ts")).as("signup_ms"))
        AsOf.asofJoin(purchases, signups, key = Seq("user_id"),
            timeCol = "ts", valueCols = Seq("signup_ms"))
          .select(col("event_id"), col("user_id"),
            col("asof_signup_ms").as("last_signup_ms"))
      },
      Some("""SELECT e.event_id, e.user_id,
             |  (SELECT max(epoch_ms(s.ts)) FROM events s
             |   WHERE s.user_id = e.user_id AND s.event_type = 'signup'
             |     AND s.ts <= e.ts) AS last_signup_ms
             |FROM events e WHERE e.event_type = 'purchase'""".stripMargin)),

    // §2.6 top-k per group with total tiebreak order.
    QDef("q9_window_topk",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        Tables.orders(s, dir)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
             |  FROM orders) t WHERE rn <= 3""".stripMargin)),

    // §2.6 running sum (frame) — exact via DECIMAL accumulation.
    QDef("q10_running_sum",
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("run_sum", sum(col("value").cast(d2)).over(w).cast("double"))
          .select("event_id", "user_id", "run_sum")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
             |    PARTITION BY user_id ORDER BY event_id
             |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum
             |FROM events""".stripMargin)),

    // §2.7 set ops — EXCEPT (oracle key reconciliation,
    // src/be_db_vars.erl:115-120).
    QDef("q11_set_except",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        o.filter(col("o_orderstatus") === "F").select("o_custkey").distinct()
          .except(o.filter(col("o_orderstatus") === "O").select("o_custkey").distinct())
      },
      Some("""SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |EXCEPT
             |SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    // §2.4 exact distinct counts (src/be_db_stats.erl:152-178).
    QDef("q12_distinct_counts",
      (s, dir) => {
        Tables.lineitem(s, dir).groupBy("l_returnflag")
          .agg(countDistinct(col("l_partkey")).as("n_parts"),
            countDistinct(col("l_suppkey")).as("n_supps"),
            count(lit(1)).as("n_rows"))
      },
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
             |  count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // §2.4 scalar stats as (name, value) rows — the stats_inventory shape
    // (src/be_db_stats.erl:111-217).
    QDef("q13_scalar_stats",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val stats = Seq(
          o.agg(max(col("o_totalprice")).as("value"))
            .select(lit("max_order_price").as("name"), col("value")),
          o.agg(count(lit(1)).cast("double").as("value"))
            .select(lit("n_orders").as("name"), col("value")),
          c.agg(count(lit(1)).cast("double").as("value"))
            .select(lit("n_customers").as("name"), col("value")),
          o.agg(unix_millis(max(col("o_orderdate")).cast("timestamp")).cast("double").as("value"))
            .select(lit("max_orderdate_ms").as("name"), col("value")))
        stats.reduce(_ unionByName _)
      },
      Some("""SELECT 'max_order_price' AS name, max(o_totalprice) AS value FROM orders
             |UNION ALL SELECT 'n_orders', CAST(count(*) AS DOUBLE) FROM orders
             |UNION ALL SELECT 'n_customers', CAST(count(*) AS DOUBLE) FROM customer
             |UNION ALL SELECT 'max_orderdate_ms', CAST(epoch_ms(max(o_orderdate)) AS DOUBLE) FROM orders""".stripMargin)),

    // §2.4 grouped rollup over the stream table.
    QDef("q14_grouped_rollup",
      (s, dir) => {
        Tables.events(s, dir).groupBy("user_id", "event_type")
          .agg(sum(col("value").cast(d2)).cast("double").as("total_value"),
            count(lit(1)).as("n"))
      },
      Some("""SELECT user_id, event_type,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
             |  count(*) AS n
             |FROM events GROUP BY user_id, event_type""".stripMargin)),

    // §2.3 JSON field projection (fields->>'k',
    // src/be_db_backfill.erl:24,56-60) + aggregation.
    QDef("q15_json_project",
      (s, dir) => {
        Tables.events(s, dir)
          .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
          .groupBy("event_type")
          .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
      },
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(json_extract_string(props, '$.k')) AS n_k
             |FROM events GROUP BY event_type""".stripMargin)),

    // Pivot (wide feature matrix — a training-pipeline staple).
    QDef("q16_pivot",
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = Tables.events(s, dir)
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(sum(col("value").cast(d2)).cast("double"))
        types.foldLeft(p)((df, t) =>
          df.withColumn(t, coalesce(col(t), lit(0.0))))
      },
      Some("""SELECT user_id,
             |  coalesce(CAST(sum(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS click,
             |  coalesce(CAST(sum(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS error,
             |  coalesce(CAST(sum(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS purchase,
             |  coalesce(CAST(sum(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS signup,
             |  coalesce(CAST(sum(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS view
             |FROM events GROUP BY user_id""".stripMargin)),

    // §2.9 tumbling time window (daily) — batch form of the streaming agg.
    QDef("q17_tumbling_window",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(d2)).cast("double").as("total_value"))
          .select(unix_millis(col("w.start")).as("day_ms"), col("event_type"),
            col("n"), col("total_value"))
      },
      Some("""SELECT epoch_ms(date_trunc('day', ts)) AS day_ms, event_type,
             |  count(*) AS n,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // §2.9 session window (30-min inactivity gap) — batch session_window;
    // oracle is the classic gaps-and-islands rewrite.
    QDef("q18_session_window",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(d2)).cast("double").as("total_value"))
          .select(col("user_id"), unix_millis(col("w.start")).as("session_start_ms"),
            col("n_events"), col("total_value"))
      },
      Some("""WITH flagged AS (
             |  SELECT user_id, ts, value,
             |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |           > INTERVAL 30 MINUTE OR
             |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |    THEN 1 ELSE 0 END AS new_session
             |  FROM events),
             |sessions AS (
             |  SELECT user_id, ts, value,
             |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS session_id
             |  FROM flagged)
             |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
             |  count(*) AS n_events,
             |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
             |FROM sessions GROUP BY user_id, session_id""".stripMargin))
  )
}
