package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-second pipeline group — the metric-feed MONITORING layer
  * over the events table: experiment lift, seasonality, changepoint
  * detection, and rolling actives. These are the queries a data-ops
  * dashboard replays hourly, so every one of them reduces the corpus
  * to an O(#types · #days) frame in a single aggregation pass and
  * does all subsequent work on that tiny frame.
  *
  *  - q272: two-variant lift table (deterministic user-hash holdout):
  *    per-type n/mean/variance per variant, relative lift, and the
  *    squared Welch t-statistic — variance from the (n·Σy²−(Σy)²)
  *    moment identity in exact milli units, t² kept rational so no
  *    square root crosses the engine boundary.
  *  - q273: day-of-week seasonality index — activity share × 7 vs
  *    uniform (milli) and the per-dow value mean; the dayofweek
  *    convention trap (Spark 1-7 Sunday-first vs DuckDB 0-6) is
  *    handled in the oracle exactly as q254 established.
  *  - q274: CUSUM changepoint screen — cumulative sum of (daily mean −
  *    global mean) deviations per type; the argmax |S| day is the
  *    classical changepoint candidate. Deviations are signed, so both
  *    the per-day mean and the global mean come from sign-split
  *    integer division trees; the argmax is totally ordered
  *    (|S| desc, day asc).
  *  - q275: rolling 7-day distinct actives (WAU by day): each deduped
  *    (user, day) pair is exploded to the ≤7 target days it supports
  *    — a bounded 7× fanout of the ALREADY-deduplicated frame, never
  *    of raw events — then one distinct-count per day. The naive
  *    per-day range self-join over raw events is the quadratic trap
  *    this shape avoids.
  */
object PipelineQueries32 {

  val defs: Seq[QDef] = Seq(

    // Two-variant lift with Welch t² — variant = user_id % 2, the
    // deterministic holdout. One aggregation to (type, variant)
    // moments, then pure arithmetic on the 2-row-per-type frame.
    // Magnitudes (milli units): Σy² ≤ ~5e14 per group, n·Σy² ≤ ~1e18
    // — inside Long; the DECIMAL(38,0) swap applies at a larger tier.
    QDef("q272_ab_lift",
      (s, dir) => {
        val m = Tables.events(s, dir)
          .select(col("event_type"),
            pmod(col("user_id"), lit(2L)).as("variant"),
            floor(col("value") * lit(1000.0)).cast("long").as("ym"))
          .groupBy("event_type", "variant")
          .agg(count(lit(1)).as("n"), sum("ym").as("sy"),
            sum(expr("ym * ym")).as("syy"))
        m.groupBy("event_type")
          .agg(
            coalesce(max(when(col("variant") === 0, col("n"))), lit(0L))
              .as("n0"),
            coalesce(max(when(col("variant") === 1, col("n"))), lit(0L))
              .as("n1"),
            coalesce(max(when(col("variant") === 0, col("sy"))), lit(0L))
              .as("sy0"),
            coalesce(max(when(col("variant") === 1, col("sy"))), lit(0L))
              .as("sy1"),
            coalesce(max(when(col("variant") === 0, col("syy"))), lit(0L))
              .as("syy0"),
            coalesce(max(when(col("variant") === 1, col("syy"))), lit(0L))
              .as("syy1"))
          .selectExpr("event_type", "n0", "n1",
            "sy0 div greatest(n0, 1L) AS mean0_milli",
            "sy1 div greatest(n1, 1L) AS mean1_milli",
            "(greatest(n0, 1L) * syy0 - sy0 * sy0)" +
              " div greatest(n0 * greatest(n0 - 1, 1L), 1L)" +
              " AS var0_milli2",
            "(greatest(n1, 1L) * syy1 - sy1 * sy1)" +
              " div greatest(n1 * greatest(n1 - 1, 1L), 1L)" +
              " AS var1_milli2")
          .selectExpr("event_type", "n0", "n1", "mean0_milli",
            "mean1_milli", "var0_milli2", "var1_milli2",
            """CASE WHEN mean1_milli - mean0_milli < 0
              |  THEN -((1000 * (mean0_milli - mean1_milli))
              |    div greatest(mean0_milli, 1L))
              |  ELSE (1000 * (mean1_milli - mean0_milli))
              |    div greatest(mean0_milli, 1L)
              |END AS lift_milli""".stripMargin,
            "((mean1_milli - mean0_milli) * (mean1_milli - mean0_milli)" +
              " * 1000) div greatest(var0_milli2 div greatest(n0, 1L)" +
              " + var1_milli2 div greatest(n1, 1L), 1L) AS t2_milli")
      },
      Some("""WITH m AS (SELECT event_type, user_id % 2 AS variant,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(ym) AS BIGINT) AS sy,
             |    CAST(sum(ym * ym) AS BIGINT) AS syy
             |  FROM (SELECT event_type, user_id,
             |      CAST(floor(1000.0 * value) AS BIGINT) AS ym
             |    FROM events) e
             |  GROUP BY 1, 2),
             |w AS (SELECT event_type,
             |    coalesce(max(CASE WHEN variant = 0 THEN n END), 0)
             |      AS n0,
             |    coalesce(max(CASE WHEN variant = 1 THEN n END), 0)
             |      AS n1,
             |    coalesce(max(CASE WHEN variant = 0 THEN sy END), 0)
             |      AS sy0,
             |    coalesce(max(CASE WHEN variant = 1 THEN sy END), 0)
             |      AS sy1,
             |    coalesce(max(CASE WHEN variant = 0 THEN syy END), 0)
             |      AS syy0,
             |    coalesce(max(CASE WHEN variant = 1 THEN syy END), 0)
             |      AS syy1
             |  FROM m GROUP BY event_type),
             |v AS (SELECT event_type, n0, n1,
             |    sy0 // greatest(n0, 1) AS mean0_milli,
             |    sy1 // greatest(n1, 1) AS mean1_milli,
             |    (greatest(n0, 1) * syy0 - sy0 * sy0)
             |      // greatest(n0 * greatest(n0 - 1, 1), 1)
             |      AS var0_milli2,
             |    (greatest(n1, 1) * syy1 - sy1 * sy1)
             |      // greatest(n1 * greatest(n1 - 1, 1), 1)
             |      AS var1_milli2
             |  FROM w)
             |SELECT event_type, n0, n1,
             |  CAST(mean0_milli AS BIGINT) AS mean0_milli,
             |  CAST(mean1_milli AS BIGINT) AS mean1_milli,
             |  CAST(var0_milli2 AS BIGINT) AS var0_milli2,
             |  CAST(var1_milli2 AS BIGINT) AS var1_milli2,
             |  CAST(CASE WHEN mean1_milli - mean0_milli < 0
             |    THEN -((1000 * (mean0_milli - mean1_milli))
             |      // greatest(mean0_milli, 1))
             |    ELSE (1000 * (mean1_milli - mean0_milli))
             |      // greatest(mean0_milli, 1)
             |  END AS BIGINT) AS lift_milli,
             |  CAST(((mean1_milli - mean0_milli)
             |      * (mean1_milli - mean0_milli) * 1000)
             |    // greatest(var0_milli2 // greatest(n0, 1)
             |      + var1_milli2 // greatest(n1, 1), 1) AS BIGINT)
             |    AS t2_milli
             |FROM v""".stripMargin)),

    // Day-of-week seasonality: activity index (share × 7 vs uniform,
    // milli) and value mean per (type, dow). O(#types · 7) rows after
    // one scan.
    QDef("q273_dow_seasonality",
      (s, dir) => {
        val d = Tables.events(s, dir)
          .select(col("event_type"),
            dayofweek(col("ts")).cast("long").as("dow"),
            floor(col("value") * lit(1000.0)).cast("long").as("ym"))
          .groupBy("event_type", "dow")
          .agg(count(lit(1)).as("n"), sum("ym").as("sy"))
          .localCheckpoint() // totals + index read it
        val tot = d.groupBy("event_type").agg(sum("n").as("tot"))
        d.join(broadcast(tot), "event_type")
          .selectExpr("event_type", "dow", "n",
            "(7000 * n) div tot AS idx_milli",
            "sy div n AS mean_milli")
      },
      Some("""WITH d AS (SELECT event_type,
             |    CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(floor(1000.0 * value) AS BIGINT))
             |      AS BIGINT) AS sy
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
             |  FROM d GROUP BY 1)
             |SELECT event_type, dow, n,
             |  CAST((7000 * n) // tot AS BIGINT) AS idx_milli,
             |  CAST(sy // n AS BIGINT) AS mean_milli
             |FROM d JOIN t USING (event_type)""".stripMargin)),

    // CUSUM changepoint screen: S_d = Σ_{d' ≤ d} (mean_d' − mean_g),
    // argmax |S_d| is the changepoint candidate. Everything after the
    // daily rollup is windows/joins over O(#days) rows per type. Both
    // means are sign-split-safe (values ≥ 0 here, but the deviation
    // and S are signed — only ADDITION touches them, never div).
    QDef("q274_cusum_changepoint",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            floor(col("value") * lit(1000.0)).cast("long").as("ym"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum("ym").as("sy"))
          .localCheckpoint() // global mean + cusum read it
        val g = daily.groupBy("event_type")
          .agg(sum("n").as("gn"), sum("sy").as("gsy"))
          .selectExpr("event_type", "gsy div gn AS gmean")
        val wc = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wr = Window.partitionBy("event_type")
          .orderBy(col("abs_s").desc, col("day").asc)
        daily.join(broadcast(g), "event_type")
          .selectExpr("event_type", "day", "sy div n - gmean AS dev")
          .withColumn("s", sum("dev").over(wc))
          .withColumn("abs_s", abs(col("s")))
          .withColumn("rn", row_number().over(wr))
          .filter(col("rn") === 1)
          .select(col("event_type"), col("day").as("cp_day"),
            col("s").as("cusum_milli"), col("abs_s").as("abs_cusum_milli"))
      },
      Some("""WITH d AS (SELECT event_type,
             |    epoch_us(ts) // 86400000000 AS day,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CAST(floor(1000.0 * value) AS BIGINT))
             |      AS BIGINT) AS sy
             |  FROM events GROUP BY 1, 2),
             |g AS (SELECT event_type,
             |    CAST(sum(sy) AS BIGINT) // CAST(sum(n) AS BIGINT)
             |      AS gmean
             |  FROM d GROUP BY 1),
             |c AS (SELECT d.event_type, day,
             |    sum(sy // n - gmean) OVER (PARTITION BY d.event_type
             |      ORDER BY day) AS s
             |  FROM d JOIN g USING (event_type)),
             |r AS (SELECT event_type, day, s, abs(s) AS abs_s,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY abs(s) DESC, day ASC) AS rn
             |  FROM c)
             |SELECT event_type, CAST(day AS BIGINT) AS cp_day,
             |  CAST(s AS BIGINT) AS cusum_milli,
             |  CAST(abs_s AS BIGINT) AS abs_cusum_milli
             |FROM r WHERE rn = 1""".stripMargin)),

    // Rolling 7-day distinct actives by day. The deduped (user, day)
    // frame explodes to its ≤7 supported target days (bounded fanout
    // of the SMALL frame), one distinct-count per target day, clipped
    // to the observed range so trailing phantom days don't appear.
    QDef("q275_rolling_actives",
      (s, dir) => {
        val ud = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
          .localCheckpoint() // fanout + max-day read it
        val mx = ud.agg(max("day").as("mxd"))
        ud.select(col("user_id"),
            explode(sequence(col("day"), col("day") + 6)).as("d"))
          .crossJoin(broadcast(mx))
          .filter(col("d") <= col("mxd"))
          .groupBy(col("d").as("day"))
          .agg(count_distinct(col("user_id")).as("wau"))
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id,
             |    epoch_us(ts) // 86400000000 AS day FROM events),
             |mx AS (SELECT max(day) AS mxd FROM ud),
             |f AS (SELECT user_id, unnest(generate_series(day, day + 6))
             |    AS d FROM ud)
             |SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT)
             |  AS wau
             |FROM f CROSS JOIN mx WHERE d <= mxd
             |GROUP BY d""".stripMargin))
  )
}
