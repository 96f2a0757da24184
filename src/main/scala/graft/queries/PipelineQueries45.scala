package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-fifth pipeline group — robust statistics and the third privacy
  * audit axis:
  *
  *  - q305: Theil-Sen robust trend per event type, side by side with the
  *    OLS slope on the same daily means. Theil-Sen (median of all
  *    pairwise slopes) has a 29% breakdown point where OLS has 0% — one
  *    corrupted day can drag OLS arbitrarily but moves the pairwise-
  *    slope median by one rank. The pairwise join runs on the DAILY
  *    AGGREGATE (≤ ~days²/2 pairs per type — bounded by the calendar,
  *    never by the corpus), the q288-family discipline for quadratic
  *    constructions. Slopes are exact integer micro/day with the
  *    sign-split truncating division mirrored token-for-token in both
  *    engines; the median is the LOWER median (element at rank
  *    ⌈n/2⌉ under a total order) so no two-value averaging ever
  *    introduces a fraction. OLS comes from the closed-form integer
  *    moment sums n·Σxy − Σx·Σy over n·Σx² − (Σx)², same division
  *    discipline.
  *  - q306: t-closeness (Li, Li, Venkatasubramanian, ICDE 2007) — the
  *    audit axis k-anonymity (q271-family) and l-diversity (q299)
  *    cannot see: a QI group can be large AND diverse yet still leak
  *    because its sensitive-value DISTRIBUTION diverges from the
  *    corpus's. For the ORDERED sensitive attribute (length bucket)
  *    the earth-mover's distance degenerates to the mean absolute
  *    cumulative difference: EMD = (1/(m−1))·Σᵢ|cumᵢ(group) −
  *    cumᵢ(global)|. Computed entirely in cross-multiplied integers
  *    (cum_g·N − cum_all·n_g — no per-bucket fractions), on a
  *    group×bucket grid built from two broadcast-sized dimensions, with
  *    ONE corpus aggregation feeding both sides.
  */
object PipelineQueries45 {

  private val vmSql = "CAST(floor(value * 1000000.0) AS BIGINT)"
  /** Sensitive-attribute bucket width for q306 (chars). */
  private val BucketW = 100

  val defs: Seq[QDef] = Seq(

    QDef("q305_theil_sen_trend",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .crossJoin(broadcast(Tables.events(s, dir)
            .agg(to_date(min("ts")).as("d0"))))
          .select(col("event_type"),
            datediff(to_date(col("ts")), col("d0")).cast("long").as("d"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("event_type", "d")
          .agg(expr("sum(vm) div count(*)").as("m"))
          .localCheckpoint() // feeds the pair join twice + OLS moments
        val pairs = daily.as("a")
          .join(daily.as("b"),
            col("a.event_type") === col("b.event_type") &&
              col("a.d") < col("b.d"))
          .select(col("a.event_type").as("event_type"),
            col("a.d").as("d1"), col("b.d").as("d2"),
            (col("b.m") - col("a.m")).as("num"),
            (col("b.d") - col("a.d")).as("den"))
          .withColumn("slope", when(col("num") < 0,
            -expr("(-num) div den")).otherwise(expr("num div den")))
        val wr = Window.partitionBy("event_type")
          .orderBy(col("slope").asc, col("d1").asc, col("d2").asc)
        val ts = pairs
          .withColumn("rk", row_number().over(wr))
          .withColumn("np",
            count(lit(1)).over(Window.partitionBy("event_type")))
          .filter(col("rk") === expr("(np + 1) div 2"))
          .select(col("event_type"), col("np").as("n_pairs"),
            col("slope").as("theil_sen_micro_per_day"))
        val ols = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("d").as("sx"),
            sum("m").as("sy"), sum(col("d") * col("d")).as("sxx"),
            sum(col("d") * col("m")).as("sxy"))
          .select(col("event_type"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("den"))
          .withColumn("ols_micro_per_day", when(col("num") < 0,
            -expr("(-num) div den")).otherwise(expr("num div den")))
          .select("event_type", "ols_micro_per_day")
        ts.join(ols, "event_type")
          .select(col("event_type"), col("n_pairs"),
            col("theil_sen_micro_per_day"), col("ols_micro_per_day"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0 FROM events),
              |dy AS MATERIALIZED (SELECT event_type,
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT) AS d,
              |    CAST(sum($vmSql) AS BIGINT)
              |      // CAST(count(*) AS BIGINT) AS m
              |  FROM events, b GROUP BY 1, 2),
              |pr AS (SELECT a.event_type, a.d AS d1, b.d AS d2,
              |    b.m - a.m AS num, b.d - a.d AS den
              |  FROM dy a JOIN dy b ON a.event_type = b.event_type
              |    AND a.d < b.d),
              |sl AS (SELECT event_type, d1, d2,
              |    CASE WHEN num < 0 THEN -((-num) // den)
              |      ELSE num // den END AS slope
              |  FROM pr),
              |rk AS (SELECT event_type, slope,
              |    row_number() OVER (PARTITION BY event_type
              |      ORDER BY slope, d1, d2) AS rk,
              |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
              |      AS np
              |  FROM sl),
              |ts AS (SELECT event_type, np AS n_pairs,
              |    slope AS theil_sen_micro_per_day
              |  FROM rk WHERE rk = (np + 1) // 2),
              |ol AS (SELECT event_type,
              |    CAST(count(*) AS BIGINT) * CAST(sum(d * m) AS BIGINT)
              |      - CAST(sum(d) AS BIGINT) * CAST(sum(m) AS BIGINT)
              |      AS num,
              |    CAST(count(*) AS BIGINT) * CAST(sum(d * d) AS BIGINT)
              |      - CAST(sum(d) AS BIGINT) * CAST(sum(d) AS BIGINT)
              |      AS den
              |  FROM dy GROUP BY 1),
              |ob AS (SELECT event_type,
              |    CASE WHEN num < 0 THEN -((-num) // den)
              |      ELSE num // den END AS ols_micro_per_day
              |  FROM ol)
              |SELECT event_type, n_pairs, theil_sen_micro_per_day,
              |  ols_micro_per_day
              |FROM ts JOIN ob USING (event_type)""".stripMargin)),

    QDef("q306_t_closeness",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("lang"), col("source"),
            expr(s"n_chars div $BucketW").as("bkt"))
        val cells = docs.groupBy("lang", "source", "bkt")
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds groups, buckets, grid and cums
        val groups = cells.groupBy("lang", "source")
          .agg(sum("c").as("ng"))
        val buckets = cells.groupBy("bkt").agg(sum("c").as("cb"))
        val total = buckets.agg(sum("cb").as("nn"),
          count(lit(1)).as("m"))
        // group×bucket grid: both dimensions are broadcast-sized
        // (langs×sources and the bounded bucket set), so zero-count
        // cells exist explicitly and every cumulative sum is complete.
        val grid = groups.crossJoin(broadcast(buckets))
          .join(cells, Seq("lang", "source", "bkt"), "left")
          .withColumn("cg", coalesce(col("c"), lit(0L)))
        val wc = Window.partitionBy("lang", "source").orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, 0)
        grid
          .withColumn("cum_g", sum("cg").over(wc))
          .withColumn("cum_all", sum("cb").over(wc))
          .crossJoin(broadcast(total))
          // cross-multiplied cumulative difference: no fractions
          .withColumn("ad",
            abs(col("cum_g") * col("nn") - col("cum_all") * col("ng")))
          .groupBy(col("lang"), col("source"), col("ng"), col("nn"),
            col("m"))
          .agg(sum("ad").as("emd_scaled"))
          .select(col("lang"), col("source"), col("ng").as("n_group"),
            expr("emd_scaled * 1000000L div (ng * nn * (m - 1))")
              .as("t_closeness_micro"))
      },
      Some(s"""WITH d AS (SELECT lang, source,
              |    n_chars // $BucketW AS bkt FROM documents),
              |ce AS MATERIALIZED (SELECT lang, source, bkt,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM d GROUP BY 1, 2, 3),
              |gr AS (SELECT lang, source, CAST(sum(c) AS BIGINT) AS ng
              |  FROM ce GROUP BY 1, 2),
              |bk AS (SELECT bkt, CAST(sum(c) AS BIGINT) AS cb
              |  FROM ce GROUP BY 1),
              |tt AS (SELECT CAST(sum(cb) AS BIGINT) AS nn,
              |    CAST(count(*) AS BIGINT) AS m FROM bk),
              |gd AS (SELECT gr.lang, gr.source, gr.ng, bk.bkt, bk.cb,
              |    coalesce(ce.c, 0) AS cg
              |  FROM gr CROSS JOIN bk
              |  LEFT JOIN ce ON ce.lang = gr.lang
              |    AND ce.source = gr.source AND ce.bkt = bk.bkt),
              |cu AS (SELECT lang, source, ng, cb, cg,
              |    sum(cg) OVER w AS cum_g, sum(cb) OVER w AS cum_all
              |  FROM gd
              |  WINDOW w AS (PARTITION BY lang, source ORDER BY bkt
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              |ag AS (SELECT lang, source, ng, nn, m,
              |    CAST(sum(abs(cum_g * nn - cum_all * ng)) AS BIGINT)
              |      AS emd_scaled
              |  FROM cu CROSS JOIN tt
              |  GROUP BY 1, 2, 3, 4, 5)
              |SELECT lang, source, ng AS n_group,
              |  emd_scaled * 1000000 // (ng * nn * (m - 1))
              |    AS t_closeness_micro
              |FROM ag""".stripMargin))
  )
}
