package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-seventh pipeline group — operational alerting and warehouse
  * history construction:
  *
  *  - q288: daily anomaly alert table — each (type, day) daily mean
  *    scored by the modified z-rule against the type's own median/MAD
  *    of daily means (q266's robust screen lifted from row level to
  *    the day series; a mean/stddev rule would let one bad day drag
  *    its own threshold). Everything beyond the daily rollup is
  *    O(#types · #days) arithmetic; the z-rule stays integer
  *    (6745·dev vs 35000·MAD, z reported in milli via one div tree).
  *  - q289: SCD Type-2 interval construction — the warehouse history
  *    table: per user, consecutive runs of the same event_type
  *    collapse into [valid_from, valid_to) intervals with a version
  *    counter; the open current row carries NULL valid_to. All
  *    windows partition by user (bounded — the q9 rule) with the
  *    (ts, event_id) total order the funnel family pinned.
  */
object PipelineQueries37 {

  val defs: Seq[QDef] = Seq(

    QDef("q288_daily_anomaly_alerts",
      (s, dir) => {
        val daily = Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"),
            floor(col("value") * lit(1000.0)).cast("long").as("ym"))
          .groupBy("event_type", "day")
          .agg(count(lit(1)).as("n"), sum("ym").as("sy"))
          .selectExpr("event_type", "day", "sy div n AS mean_milli")
          .localCheckpoint() // median pass + dev pass + flag pass
        val n = daily.groupBy("event_type").agg(count(lit(1)).as("nd"))
        val wv = Window.partitionBy("event_type").orderBy("mean_milli")
          .rowsBetween(Window.unboundedPreceding, 0)
        val med = daily
          .groupBy("event_type", "mean_milli")
          .agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(wv))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(min(when(col("cum") >= expr("(50 * nd + 99) div 100"),
            col("mean_milli"))).as("med"))
        val dev = daily.join(broadcast(med), "event_type")
          .selectExpr("event_type", "abs(mean_milli - med) AS dv")
          .groupBy("event_type", "dv").agg(count(lit(1)).as("c"))
        val wd = Window.partitionBy("event_type").orderBy("dv")
          .rowsBetween(Window.unboundedPreceding, 0)
        val mad = dev.withColumn("cum", sum("c").over(wd))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(min(when(col("cum") >= expr("(50 * nd + 99) div 100"),
            col("dv"))).as("mad"))
        daily.join(broadcast(med.join(mad, "event_type")), "event_type")
          .selectExpr("event_type", "day", "mean_milli",
            "med AS med_milli", "mad AS mad_milli",
            "abs(mean_milli - med) AS dv")
          .selectExpr("event_type", "day", "mean_milli", "med_milli",
            "mad_milli",
            "(6745 * dv) div (10 * greatest(mad_milli, 1L))" +
              " AS modz_milli",
            """CASE WHEN mad_milli = 0 THEN dv > 0
              |  ELSE 6745 * dv > 35000 * mad_milli
              |END AS flagged""".stripMargin)
      },
      Some("""WITH d AS (SELECT event_type,
             |    epoch_us(ts) // 86400000000 AS day,
             |    CAST(sum(CAST(floor(1000.0 * value) AS BIGINT))
             |        AS BIGINT)
             |      // CAST(count(*) AS BIGINT) AS mean_milli
             |  FROM events GROUP BY 1, 2),
             |n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nd
             |  FROM d GROUP BY 1),
             |h AS (SELECT event_type, mean_milli,
             |    CAST(count(*) AS BIGINT) AS c FROM d GROUP BY 1, 2),
             |hc AS (SELECT event_type, mean_milli, c,
             |    sum(c) OVER (PARTITION BY event_type
             |      ORDER BY mean_milli) AS cum FROM h),
             |md AS (SELECT event_type,
             |    min(CASE WHEN cum >= (50*nd + 99) // 100
             |      THEN mean_milli END) AS med
             |  FROM hc JOIN n USING (event_type) GROUP BY event_type),
             |dv AS (SELECT d.event_type, abs(mean_milli - med) AS dv,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM d JOIN md USING (event_type) GROUP BY 1, 2),
             |dc AS (SELECT event_type, dv, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY dv)
             |      AS cum FROM dv),
             |ma AS (SELECT event_type,
             |    min(CASE WHEN cum >= (50*nd + 99) // 100 THEN dv END)
             |      AS mad
             |  FROM dc JOIN n USING (event_type) GROUP BY event_type)
             |SELECT d.event_type, CAST(day AS BIGINT) AS day,
             |  CAST(mean_milli AS BIGINT) AS mean_milli,
             |  CAST(med AS BIGINT) AS med_milli,
             |  CAST(mad AS BIGINT) AS mad_milli,
             |  CAST((6745 * abs(mean_milli - med))
             |    // (10 * greatest(mad, 1)) AS BIGINT) AS modz_milli,
             |  CASE WHEN mad = 0 THEN abs(mean_milli - med) > 0
             |    ELSE 6745 * abs(mean_milli - med) > 35000 * mad
             |  END AS flagged
             |FROM d JOIN md USING (event_type)
             |  JOIN ma USING (event_type)""".stripMargin)),

    QDef("q289_scd2_intervals",
      (s, dir) => {
        val wo = Window.partitionBy("user_id")
          .orderBy(col("tus").asc, col("eid").asc)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id").cast("long").as("eid"), col("event_type"))
        val changes = ev
          .withColumn("prev", lag("event_type", 1).over(wo))
          .filter(col("prev").isNull ||
            col("prev") =!= col("event_type"))
        val wc = Window.partitionBy("user_id")
          .orderBy(col("tus").asc, col("eid").asc)
        // exclusive end ([from, to) — the standard SCD2 convention):
        // an inclusive lead-1 end would INVERT the interval when two
        // change events share a timestamp (the (ts, event_id) tie);
        // with the exclusive bound a tie yields an empty-but-ordered
        // interval instead.
        changes
          .withColumn("version", row_number().over(wc).cast("long"))
          .withColumn("valid_to", lead("tus", 1).over(wc))
          .select(col("user_id"), col("event_type"), col("version"),
            col("tus").as("valid_from_us"),
            col("valid_to").as("valid_to_us"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus,
             |    event_id AS eid, event_type FROM events),
             |c AS (SELECT user_id, tus, eid, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY tus, eid) AS prev
             |  FROM e),
             |f AS (SELECT user_id, tus, eid, event_type FROM c
             |  WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type,
             |  CAST(row_number() OVER w AS BIGINT) AS version,
             |  CAST(tus AS BIGINT) AS valid_from_us,
             |  CAST(lead(tus) OVER w AS BIGINT) AS valid_to_us
             |FROM f
             |WINDOW w AS (PARTITION BY user_id ORDER BY tus, eid)"""
        .stripMargin))
  )
}
