package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-sixth pipeline group — sequential hypothesis testing on the
  * live conversion stream:
  *
  *  - q327: Wald SPRT conversion-rate monitor. The fixed-horizon A/B
  *    machinery (q272's Welch t²) answers "is the rate different,
  *    given all the data"; the Sequential Probability Ratio Test
  *    answers the operational question "how early could we have
  *    STOPPED?" with α/β guarantees (Wald 1945). The log-likelihood
  *    ratio increments are constants of (p0, p1) only, so they are
  *    computed ONCE in Scala and embedded as the SAME integer-micro
  *    literals in both engines (the q293 nDCG discount-table rule —
  *    libm never crosses engines at query time). The daily LLR is
  *    then pure integer: conversions·K1 + non-conversions·K0;
  *    the running sum and the first boundary crossing fall out of a
  *    calendar-bounded window. Output: per-day cumulative LLR, the
  *    decision state, and the day the test would have stopped.
  */
object PipelineQueries56 {

  /** SPRT design: H0 p=0.18 vs H1 p=0.22, α=β=0.05. */
  private val P0 = 0.18
  private val P1 = 0.22
  /** Integer-micro LLR increments, computed once in Scala and shared
    * verbatim with the oracle SQL (floor keeps them deterministic). */
  private val K1 = math.floor(math.log(P1 / P0) * 1e6).toLong
  private val K0 = math.floor(math.log((1 - P1) / (1 - P0)) * 1e6).toLong
  private val UpperMicro = math.floor(math.log(19.0) * 1e6).toLong
  private val LowerMicro = -UpperMicro

  val defs: Seq[QDef] = Seq(

    QDef("q327_sprt_monitor",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"))
        val daily = ev.crossJoin(broadcast(bounds))
          .groupBy(datediff(to_date(col("ts")), col("d0"))
            .cast("long").as("d"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"),
            count(lit(1)).as("n"))
          .withColumn("llr_day",
            col("conv") * K1 + (col("n") - col("conv")) * K0)
        val w = Window.orderBy("d")
          .rowsBetween(Window.unboundedPreceding, 0)
        // calendar-bounded global window (≤ #days rows)
        val cum = daily
          .withColumn("cum_llr", sum("llr_day").over(w))
          .withColumn("decision",
            when(col("cum_llr") >= UpperMicro, lit("accept_h1"))
              .when(col("cum_llr") <= LowerMicro, lit("accept_h0"))
              .otherwise(lit("continue")))
        val stop = cum.filter(col("decision") =!= "continue")
          .agg(min("d").as("stop_day"))
        cum.crossJoin(broadcast(stop))
          .select(col("d"), col("conv"), col("n"), col("cum_llr"),
            col("decision"),
            coalesce(col("stop_day"), lit(-1L)).as("stop_day"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0 FROM events),
              |dy AS (SELECT
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
              |      AS d,
              |    CAST(sum(CASE WHEN event_type = 'purchase'
              |      THEN 1 ELSE 0 END) AS BIGINT) AS conv,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM events, b GROUP BY 1),
              |cm AS (SELECT d, conv, n,
              |    CAST(sum(conv * $K1 + (n - conv) * ($K0))
              |      OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
              |      PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_llr
              |  FROM dy),
              |dc AS (SELECT d, conv, n, cum_llr,
              |    CASE WHEN cum_llr >= $UpperMicro THEN 'accept_h1'
              |      WHEN cum_llr <= $LowerMicro THEN 'accept_h0'
              |      ELSE 'continue' END AS decision
              |  FROM cm),
              |st AS (SELECT coalesce(min(d), -1) AS stop_day
              |  FROM dc WHERE decision <> 'continue')
              |SELECT d, conv, n, cum_llr, decision,
              |  CAST(stop_day AS BIGINT) AS stop_day
              |FROM dc, st""".stripMargin))
  )
}
