package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fiftieth pipeline group — survival analysis and seasonal
  * decomposition on the event feed:
  *
  *  - q315: user retention hazard table (the Kaplan-Meier life table,
  *    hazard form). Lifetime = last-active − first-active day;
  *    users whose last activity falls on the feed's final day are
  *    CENSORED (still alive at observation end — counting them as
  *    churned is the classic survival-analysis mistake). Per lifetime
  *    t: at-risk count (everyone with lifetime ≥ t — a reverse
  *    cumulative over the ≤#days life-table rows), churned (uncensored
  *    deaths at t), censored, and the discrete hazard d(t)/n(t) in
  *    micro. The KM survival curve is the running product of
  *    (1 − hazard) — a cross-engine float hazard, so the table stops
  *    at the hazard (exact integers); consumers fold the product.
  *    One corpus pass → per-user (first, last); everything after is
  *    life-table-sized.
  *  - q316: additive seasonal-trend decomposition (STL-lite) of the
  *    per-type daily mean: trend = centered 7-day moving average
  *    (ends average the available frame — same definition both
  *    engines), seasonal = per-day-of-week mean of the detrended
  *    series, residual = value − trend − seasonal. q273 reports the
  *    dow profile; this SUBTRACTS it, which is what an anomaly screen
  *    needs (q288's robust-z fires on residuals, not raw means).
  *    Detrended values go negative, so every integer mean on them is
  *    the sign-split truncating division, token-for-token in both
  *    engines. All windows partition by event type over calendar-
  *    bounded rows.
  */
object PipelineQueries50 {

  private val vmSql = "CAST(floor(value * 1000000.0) AS BIGINT)"

  /** Sign-split integer mean: trunc(sum/n) in both engines. */
  private def truncDiv(sumC: String, cntC: String): String =
    s"CASE WHEN $sumC < 0 THEN -((-($sumC)) div $cntC) " +
      s"ELSE ($sumC) div $cntC END"

  val defs: Seq[QDef] = Seq(

    QDef("q315_retention_hazard",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"),
          to_date(max("ts")).as("d1"))
        val users = ev.crossJoin(broadcast(bounds))
          .select(col("user_id"),
            datediff(to_date(col("ts")), col("d0")).cast("long")
              .as("d"),
            datediff(col("d1"), col("d0")).cast("long").as("dmax"))
          .groupBy("user_id", "dmax")
          .agg(min("d").as("f"), max("d").as("l"))
          .select(col("user_id"), (col("l") - col("f")).as("t"),
            (col("l") === col("dmax")).cast("long").as("cens"))
        val lt = users.groupBy("t")
          .agg(sum(lit(1) - col("cens")).as("churned"),
            sum("cens").as("censored"))
        val w = Window.orderBy(col("t").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        // life-table-sized frame (≤ #days rows): the reverse
        // cumulative window is bounded.
        lt.withColumn("n_at_risk",
            sum(col("churned") + col("censored")).over(w))
          .select(col("t"), col("n_at_risk"), col("churned"),
            col("censored"),
            expr("churned * 1000000L div n_at_risk")
              .as("hazard_micro"))
      },
      Some("""WITH b AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1
             |  FROM events),
             |u AS (SELECT user_id,
             |    min(date_diff('day', b.d0, ts::DATE)) AS f,
             |    max(date_diff('day', b.d0, ts::DATE)) AS l,
             |    any_value(date_diff('day', b.d0, b.d1)) AS dmax
             |  FROM events, b GROUP BY 1),
             |lt AS (SELECT CAST(l - f AS BIGINT) AS t,
             |    CAST(sum(CASE WHEN l = dmax THEN 0 ELSE 1 END)
             |      AS BIGINT) AS churned,
             |    CAST(sum(CASE WHEN l = dmax THEN 1 ELSE 0 END)
             |      AS BIGINT) AS censored
             |  FROM u GROUP BY 1)
             |SELECT t,
             |  CAST(sum(churned + censored) OVER (ORDER BY t DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS n_at_risk,
             |  churned, censored,
             |  churned * 1000000 // CAST(sum(churned + censored)
             |    OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND CURRENT ROW) AS BIGINT) AS hazard_micro
             |FROM lt""".stripMargin)),

    QDef("q316_seasonal_decomposition",
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
        val wMa = Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-3, 3)
        val t2 = daily
          .withColumn("ms", sum("m").over(wMa))
          .withColumn("mc", count(lit(1)).over(wMa))
          .withColumn("trend", expr("ms div mc")) // m ≥ 0 ⇒ sum ≥ 0
          .withColumn("detr", col("m") - col("trend"))
          .withColumn("dow", pmod(col("d"), lit(7L)))
        val seasonal = t2.groupBy("event_type", "dow")
          .agg(sum("detr").as("sd"), count(lit(1)).as("cd"))
          .select(col("event_type"), col("dow"),
            expr(truncDiv("sd", "cd")).as("seasonal"))
        t2.join(seasonal, Seq("event_type", "dow"))
          .select(col("event_type"), col("d"), col("m"),
            col("trend"), col("seasonal"),
            (col("m") - col("trend") - col("seasonal")).as("resid"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0 FROM events),
              |dy AS (SELECT event_type,
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
              |      AS d,
              |    CAST(sum($vmSql) AS BIGINT)
              |      // CAST(count(*) AS BIGINT) AS m
              |  FROM events, b GROUP BY 1, 2),
              |tr AS (SELECT event_type, d, m,
              |    CAST(sum(m) OVER w AS BIGINT)
              |      // CAST(count(*) OVER w AS BIGINT) AS trend
              |  FROM dy
              |  WINDOW w AS (PARTITION BY event_type ORDER BY d
              |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              |dt AS (SELECT event_type, d, m, trend,
              |    m - trend AS detr, d % 7 AS dow FROM tr),
              |se AS (SELECT event_type, dow,
              |    CASE WHEN CAST(sum(detr) AS BIGINT) < 0 THEN
              |      -((-(CAST(sum(detr) AS BIGINT)))
              |        // CAST(count(*) AS BIGINT))
              |    ELSE CAST(sum(detr) AS BIGINT)
              |      // CAST(count(*) AS BIGINT) END AS seasonal
              |  FROM dt GROUP BY 1, 2)
              |SELECT dt.event_type, dt.d, dt.m, dt.trend,
              |  se.seasonal, dt.m - dt.trend - se.seasonal AS resid
              |FROM dt JOIN se ON dt.event_type = se.event_type
              |  AND dt.dow = se.dow""".stripMargin))
  )
}
