package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-fourth pipeline group — sparse time-series repair, the two
  * classical gap-fill semantics every metrics/feature store needs and
  * no prior query expresses (q254's heatmap aggregates observed slots;
  * q275's rolling actives is count-based; neither REPAIRS a series):
  *
  *  - q303: date-spine densification + last-observation-carried-forward
  *    (LOCF). Per purchasing user, the daily spend series over the
  *    corpus's full [min_day, max_day] range, missing days filled with
  *    the last observed daily total. The spine is generated, never
  *    scanned: one `sequence()` explode over the global day bounds
  *    cross-joined against the (small) purchasing-user dimension; the
  *    fact scan stays one aggregation. `last(_, ignoreNulls)` over a
  *    per-user ordered frame is the whole fill — no iterative logic.
  *  - q304: linear interpolation between the surrounding observations
  *    (the other repair semantic — LOCF holds a step function, interp
  *    draws the chord). Surrounding observation (day, value) pairs come
  *    from ONE struct-valued `last/first(ignoreNulls)` window pair —
  *    no self-join against the observation table. Exact integer micro
  *    arithmetic: the chord numerator can be negative, and Spark's
  *    `div` TRUNCATES while DuckDB's `//` FLOORS, so the division is
  *    explicitly sign-split token-for-token in both engines (the house
  *    rule). Edge days before the first / after the last observation
  *    take the nearest observed value (LOCF/NOCB) and are labeled.
  *
  * Scale: the grid is |users| × |days| — output-sized, never corpus-
  * sized; both windows partition by user_id (bounded frames, no
  * global sort); the spine explode is O(days) on the driver-broadcast
  * bounds row. At 100 TB the only corpus-sized pass is the initial
  * per-(user, day) aggregation, which is the minimum any densifier
  * must pay.
  */
object PipelineQueries44 {

  private val vmSql = "CAST(floor(value * 1000000.0) AS BIGINT)"

  val defs: Seq[QDef] = Seq(

    QDef("q303_gap_fill_locf",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"),
          to_date(max("ts")).as("d1"))
        val spine = bounds
          .select(explode(sequence(lit(0),
            datediff(col("d1"), col("d0")))).as("day_idx"))
          .select(col("day_idx").cast("long").as("day_idx"))
        val daily = ev.filter(col("event_type") === "purchase")
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            datediff(to_date(col("ts")), col("d0"))
              .cast("long").as("day_idx"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("user_id", "day_idx")
          .agg(sum("vm").as("spend"), count(lit(1)).as("n"))
        val users = daily.select("user_id").distinct()
        val grid = users.crossJoin(broadcast(spine))
        val w = Window.partitionBy("user_id").orderBy("day_idx")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid.join(daily, Seq("user_id", "day_idx"), "left")
          .select(col("user_id"), col("day_idx"),
            last(col("spend"), ignoreNulls = true).over(w)
              .as("spend_locf_micro"),
            when(col("n").isNotNull, lit(1)).otherwise(lit(0))
              .as("observed"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1
              |  FROM events),
              |sp AS (SELECT CAST(unnest(generate_series(0,
              |    date_diff('day', d0, d1))) AS BIGINT) AS day_idx
              |  FROM b),
              |o AS (SELECT user_id,
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
              |      AS day_idx,
              |    CAST(sum($vmSql) AS BIGINT) AS spend,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM events, b WHERE event_type = 'purchase'
              |  GROUP BY 1, 2),
              |u AS (SELECT DISTINCT user_id FROM o),
              |g AS (SELECT user_id, day_idx FROM u CROSS JOIN sp)
              |SELECT g.user_id, g.day_idx,
              |  last_value(o.spend IGNORE NULLS) OVER (
              |    PARTITION BY g.user_id ORDER BY g.day_idx
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS spend_locf_micro,
              |  CASE WHEN o.n IS NOT NULL THEN 1 ELSE 0 END AS observed
              |FROM g LEFT JOIN o USING (user_id, day_idx)""".stripMargin)),

    QDef("q304_linear_interp",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"),
          to_date(max("ts")).as("d1"))
        val spine = bounds
          .select(explode(sequence(lit(0),
            datediff(col("d1"), col("d0")))).as("day_idx"))
          .select(col("day_idx").cast("long").as("day_idx"))
        val daily = ev.filter(col("event_type") === "purchase")
          .crossJoin(broadcast(bounds))
          .select(col("user_id"),
            datediff(to_date(col("ts")), col("d0"))
              .cast("long").as("day_idx"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("user_id", "day_idx")
          // per-day MEAN spend (truncating integer div — both engines
          // see non-negative vm sums, so floor == trunc here)
          .agg(expr("sum(vm) div count(*)").as("mv"))
        val users = daily.select("user_id").distinct()
        val grid = users.crossJoin(broadcast(spine))
        val wPrev = Window.partitionBy("user_id").orderBy("day_idx")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wNext = Window.partitionBy("user_id").orderBy("day_idx")
          .rowsBetween(0, Window.unboundedFollowing)
        grid.join(daily, Seq("user_id", "day_idx"), "left")
          .withColumn("pv", last(when(col("mv").isNotNull,
            struct(col("day_idx").as("d"), col("mv").as("v"))),
            ignoreNulls = true).over(wPrev))
          .withColumn("nx", first(when(col("mv").isNotNull,
            struct(col("day_idx").as("d"), col("mv").as("v"))),
            ignoreNulls = true).over(wNext))
          .withColumn("num",
            (col("nx.v") - col("pv.v")) * (col("day_idx") - col("pv.d")))
          .withColumn("den", col("nx.d") - col("pv.d"))
          .select(col("user_id"), col("day_idx"),
            when(col("mv").isNotNull, col("mv"))
              .when(col("pv").isNotNull && col("nx").isNotNull,
                col("pv.v") + when(col("num") < 0,
                  -expr("(-num) div den")).otherwise(expr("num div den")))
              .otherwise(coalesce(col("pv.v"), col("nx.v")))
              .as("value_micro"),
            when(col("mv").isNotNull, lit("obs"))
              .when(col("pv").isNotNull && col("nx").isNotNull,
                lit("interp"))
              .otherwise(lit("edge")).as("kind"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0, max(ts::DATE) AS d1
              |  FROM events),
              |sp AS (SELECT CAST(unnest(generate_series(0,
              |    date_diff('day', d0, d1))) AS BIGINT) AS day_idx
              |  FROM b),
              |o AS (SELECT user_id,
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
              |      AS day_idx,
              |    CAST(sum($vmSql) AS BIGINT)
              |      // CAST(count(*) AS BIGINT) AS mv
              |  FROM events, b WHERE event_type = 'purchase'
              |  GROUP BY 1, 2),
              |u AS (SELECT DISTINCT user_id FROM o),
              |g AS (SELECT user_id, day_idx FROM u CROSS JOIN sp),
              |j AS (SELECT g.user_id, g.day_idx, o.mv FROM g
              |  LEFT JOIN o USING (user_id, day_idx)),
              |w AS (SELECT user_id, day_idx, mv,
              |    last_value(CASE WHEN mv IS NOT NULL THEN
              |      {'d': day_idx, 'v': mv} END IGNORE NULLS) OVER (
              |      PARTITION BY user_id ORDER BY day_idx
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS pv,
              |    first_value(CASE WHEN mv IS NOT NULL THEN
              |      {'d': day_idx, 'v': mv} END IGNORE NULLS) OVER (
              |      PARTITION BY user_id ORDER BY day_idx
              |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
              |      AS nx
              |  FROM j)
              |SELECT user_id, day_idx,
              |  CASE WHEN mv IS NOT NULL THEN mv
              |    WHEN pv IS NOT NULL AND nx IS NOT NULL THEN
              |      pv.v + (CASE WHEN (nx.v - pv.v) *
              |          (day_idx - pv.d) < 0
              |        THEN -((-((nx.v - pv.v) * (day_idx - pv.d)))
              |          // (nx.d - pv.d))
              |        ELSE ((nx.v - pv.v) * (day_idx - pv.d))
              |          // (nx.d - pv.d) END)
              |    ELSE coalesce(pv.v, nx.v) END AS value_micro,
              |  CASE WHEN mv IS NOT NULL THEN 'obs'
              |    WHEN pv IS NOT NULL AND nx IS NOT NULL THEN 'interp'
              |    ELSE 'edge' END AS kind
              |FROM w""".stripMargin))
  )
}
