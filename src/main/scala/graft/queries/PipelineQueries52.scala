package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-second pipeline group — forecast honesty and optimizer
  * honesty:
  *
  *  - q319: rolling-origin backtest of the seasonal-naive forecaster.
  *    The forecast for day d is the expanding mean of PRIOR same-
  *    day-of-week values (what q316's decomposition implies is the
  *    right naive model for this feed); the backtest walks forward so
  *    no future value ever leaks into a forecast (the window is
  *    UNBOUNDED PRECEDING TO 1 PRECEDING within the (type, dow)
  *    partition). Reported per type: evaluated days, MAE, and BIAS —
  *    the signed mean error (sign-split division; a biased forecaster
  *    with small MAE is still wrong in one direction and the two
  *    numbers separate that). All frames calendar-bounded.
  *  - q320: join cardinality-estimation audit — System-R's
  *    |A⋈B| ≈ |A|·|B| / max(d_A(k), d_B(k)) evaluated against the
  *    TRUE join size for every FK edge of the TPC-H-ish schema. The
  *    estimate needs only per-table statistics (one aggregation per
  *    side); the truth is the real equi-join count. The audit is the
  *    honesty check behind every broadcast/shuffle decision an
  *    optimizer makes from stats — and the output shows exactly
  *    where the uniform-key assumption fails. Error in micro,
  *    divide-the-larger-side convention.
  */
object PipelineQueries52 {

  private val vmSql = "CAST(floor(value * 1000000.0) AS BIGINT)"

  val defs: Seq[QDef] = Seq(

    QDef("q319_seasonal_naive_backtest",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"))
        val daily = ev.crossJoin(broadcast(bounds))
          .select(col("event_type"),
            datediff(to_date(col("ts")), col("d0")).cast("long")
              .as("d"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("event_type", "d")
          .agg(expr("sum(vm) div count(*)").as("m"))
          .withColumn("dow", pmod(col("d"), lit(7L)))
        val wPrior = Window.partitionBy("event_type", "dow")
          .orderBy("d").rowsBetween(Window.unboundedPreceding, -1)
        val bt = daily
          .withColumn("ps", sum("m").over(wPrior))
          .withColumn("pc", count(lit(1)).over(wPrior))
          .filter(col("pc") >= 1)
          .withColumn("f", expr("ps div pc")) // m ≥ 0 ⇒ sums ≥ 0
          .withColumn("e", col("m") - col("f"))
        bt.groupBy("event_type")
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("e"))).as("sae"), sum("e").as("se"))
          .select(col("event_type"), col("n_eval"),
            expr("sae div n_eval").as("mae_micro"),
            expr("CASE WHEN se < 0 THEN -((-se) div n_eval) " +
              "ELSE se div n_eval END").as("bias_micro"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0 FROM events),
              |dy AS (SELECT event_type,
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
              |      AS d,
              |    CAST(sum($vmSql) AS BIGINT)
              |      // CAST(count(*) AS BIGINT) AS m
              |  FROM events, b GROUP BY 1, 2),
              |bt AS (SELECT event_type, d, m,
              |    CAST(sum(m) OVER w AS BIGINT) AS ps,
              |    CAST(count(*) OVER w AS BIGINT) AS pc
              |  FROM (SELECT *, d % 7 AS dow FROM dy)
              |  WINDOW w AS (PARTITION BY event_type, dow ORDER BY d
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
              |ev AS (SELECT event_type, m - (ps // pc) AS e
              |  FROM bt WHERE pc >= 1)
              |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
              |  CAST(sum(abs(e)) AS BIGINT)
              |    // CAST(count(*) AS BIGINT) AS mae_micro,
              |  CASE WHEN CAST(sum(e) AS BIGINT) < 0 THEN
              |    -((-CAST(sum(e) AS BIGINT))
              |      // CAST(count(*) AS BIGINT))
              |  ELSE CAST(sum(e) AS BIGINT)
              |    // CAST(count(*) AS BIGINT) END AS bias_micro
              |FROM ev GROUP BY 1""".stripMargin)),

    QDef("q320_cardinality_audit",
      (s, dir) => {
        def stats(df: org.apache.spark.sql.DataFrame, key: String) =
          df.agg(count(lit(1)).as("rows"),
            count_distinct(col(key)).as("nd"))
        def edge(name: String,
                 a: org.apache.spark.sql.DataFrame, ka: String,
                 b: org.apache.spark.sql.DataFrame, kb: String) = {
          val sa = stats(a.select(col(ka)), ka)
            .select(col("rows").as("ra"), col("nd").as("da"))
          val sb = stats(b.select(col(kb)), kb)
            .select(col("rows").as("rb"), col("nd").as("db"))
          val actual = a.select(col(ka).as("k"))
            .join(b.select(col(kb).as("k")), "k")
            .agg(count(lit(1)).as("actual"))
          sa.crossJoin(sb).crossJoin(actual)
            .select(lit(name).as("edge"), col("ra"), col("rb"),
              col("da"), col("db"),
              expr("ra * rb div greatest(da, db)").as("est"),
              col("actual"))
            .withColumn("err_micro",
              expr("abs(est - actual) * 1000000L div actual"))
        }
        val li = Tables.lineitem(s, dir)
        edge("lineitem-orders", li, "l_orderkey",
            Tables.orders(s, dir), "o_orderkey")
          .unionByName(edge("lineitem-part", li, "l_partkey",
            Tables.part(s, dir), "p_partkey"))
          .unionByName(edge("lineitem-supplier", li, "l_suppkey",
            Tables.supplier(s, dir), "s_suppkey"))
          .unionByName(edge("orders-customer",
            Tables.orders(s, dir), "o_custkey",
            Tables.customer(s, dir), "c_custkey"))
          .unionByName(edge("customer-nation",
            Tables.customer(s, dir), "c_nationkey",
            Tables.nation(s, dir), "n_nationkey"))
      },
      Some {
        def edgeSql(name: String, ta: String, ka: String,
                    tb: String, kb: String) =
          s"""SELECT '$name' AS edge,
             |  (SELECT CAST(count(*) AS BIGINT) FROM $ta) AS ra,
             |  (SELECT CAST(count(*) AS BIGINT) FROM $tb) AS rb,
             |  (SELECT CAST(count(DISTINCT $ka) AS BIGINT) FROM $ta)
             |    AS da,
             |  (SELECT CAST(count(DISTINCT $kb) AS BIGINT) FROM $tb)
             |    AS db,
             |  (SELECT CAST(count(*) AS BIGINT) FROM $ta) *
             |    (SELECT CAST(count(*) AS BIGINT) FROM $tb) //
             |    greatest(
             |      (SELECT CAST(count(DISTINCT $ka) AS BIGINT)
             |        FROM $ta),
             |      (SELECT CAST(count(DISTINCT $kb) AS BIGINT)
             |        FROM $tb)) AS est,
             |  (SELECT CAST(count(*) AS BIGINT) FROM $ta a
             |    JOIN $tb b ON a.$ka = b.$kb) AS actual""".stripMargin
        val es = Seq(
          edgeSql("lineitem-orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          edgeSql("lineitem-part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          edgeSql("lineitem-supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          edgeSql("orders-customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          edgeSql("customer-nation", "customer", "c_nationkey",
            "nation", "n_nationkey"))
        Some("WITH e AS (" + es.mkString("\nUNION ALL\n") + ")\n" +
          "SELECT edge, ra, rb, da, db, est, actual,\n" +
          "  abs(est - actual) * 1000000 // actual AS err_micro\n" +
          "FROM e")
      }.get)
  )
}
