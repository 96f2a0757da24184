package graft.queries

import graft.Tables
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fifty-eighth pipeline group — Markov removal-effect attribution
  * (q330), the model-based credit assignment q302's first/last-touch
  * heuristics approximate. The user journey is a first-order Markov
  * chain over channels with two absorbing states (conv = first
  * purchase, null = journey end); a channel's credit is its REMOVAL
  * EFFECT (Anderl et al. 2014): how much the absorption probability
  * into conv drops when every transition into that channel is
  * redirected to null.
  *
  * Determinism contract: the absorption probability is DEFINED as the
  * K=12-step truncated value iteration in integer micro (per-state:
  * sum of micro-products, ONE division per step) — both engines
  * replay the identical iteration, the Spark side on the collected
  * |states|² matrix (a bounded driver collect, q313's discipline),
  * the oracle as K unrolled vector CTEs per variant (the q212
  * staged-DP pattern, ~60 tiny stages generated mechanically).
  * The corpus-sized work is ONE per-user window pass building
  * transition counts; everything after is |channels|²-sized.
  */
object PipelineQueries58 {

  private val Iters = 12

  /** The oracle's channel inventory is DERIVED from the query run
    * (the q30/q106 late-bound-literal pattern), never hardcoded: a
    * fixture event-type change flows into both engines identically
    * instead of failing the hash against a stale embedded list.
    */
  private object MarkovOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q330_markov_removal_attribution",
      (s, dir) => {
        val wo = Window.partitionBy("user_id")
          .orderBy(col("tus").asc, col("eid").asc)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id").cast("long").as("eid"), col("event_type"))
          .withColumn("prior_purchases",
            coalesce(sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).over(
              wo.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .filter(col("prior_purchases") === 0)
        val steps = ev
          .withColumn("rn", row_number().over(wo))
          .withColumn("nxt", lead(col("event_type"), 1).over(wo))
          .withColumn("src", when(col("event_type") === "purchase",
            lit(null).cast("string")).otherwise(col("event_type")))
          .withColumn("dst", when(col("nxt").isNull, lit("null"))
            .when(col("nxt") === "purchase", lit("conv"))
            .otherwise(col("nxt")))
        val starts = steps.filter(col("rn") === 1)
          .select(lit("start").as("src"),
            when(col("event_type") === "purchase", lit("conv"))
              .otherwise(col("event_type")).as("dst"))
        val trans = steps.filter(col("src").isNotNull)
          .select(col("src"), col("dst"))
          .unionByName(starts)
          .groupBy("src", "dst").agg(count(lit(1)).as("c"))
          .collect().map(r =>
            (r.getString(0), r.getString(1), r.getLong(2)))
        // |channels|²-sized from here: integer-micro value iteration
        val outs = trans.groupBy(_._1).view
          .mapValues(_.map(_._3).sum).toMap
        val p = trans.map { case (a, b, c) =>
          (a, b) -> c * 1000000L / outs(a)
        }.toMap
        val channels = trans.map(_._1).distinct
          .filterNot(_ == "start").sorted
        MarkovOracle.sql = Some(markovOracleSql(channels))
        def absorb(removed: Option[String]): Long = {
          val states = "start" +: channels
          def edge(a: String, b: String): Long = removed match {
            case Some(r) if b == r => 0L
            case Some(r) if b == "null" =>
              p.getOrElse((a, "null"), 0L) + p.getOrElse((a, r), 0L)
            case _ => p.getOrElse((a, b), 0L)
          }
          var v = states.map(_ => 0L)
          for (_ <- 1 to Iters) {
            v = states.map { a =>
              val inner = states.indices.map(i =>
                edge(a, states(i)) * v(i)).sum +
                edge(a, "conv") * 1000000L
              inner / 1000000L
            }
          }
          v.head // v(start)
        }
        val base = absorb(None)
        val rows = Row("base", base, 0L) +: channels.map { c =>
          val vc = absorb(Some(c))
          Row(c, vc,
            if (base == 0) 0L else (base - vc) * 1000000L / base)
        }
        s.createDataFrame(s.sparkContext.parallelize(rows, 1),
          StructType(Seq(
            StructField("channel", StringType),
            StructField("p_conv_micro", LongType),
            StructField("removal_effect_micro", LongType))))
      },
      None,
      Some(() => MarkovOracle.sql))
  )

  /** Mechanically generated oracle: shared transition CTEs + K
    * unrolled value-iteration stages per variant, over the channel
    * inventory the query run derived from the data.
    */
  private def markovOracleSql(channels: Seq[String]): String = {
    def stages(tag: String, redirect: Option[String]): String = {
          val tmr = redirect match {
            case None => s"tm$tag AS (SELECT src, dst, p FROM tm)"
            case Some(r) =>
              s"""tm$tag AS (SELECT src,
                 |    CASE WHEN dst = '$r' THEN 'null' ELSE dst END
                 |      AS dst,
                 |    CAST(sum(p) AS BIGINT) AS p
                 |  FROM tm GROUP BY 1, 2)""".stripMargin
          }
          val its = (1 to Iters).map { k =>
            val prev =
              if (k == 1) s"(SELECT src AS s, 0 AS v FROM tm$tag)"
              else s"v$tag${k - 1}"
            s"""v$tag$k AS (SELECT m.src AS s,
               |    CAST(sum(CASE WHEN m.dst = 'conv'
               |        THEN m.p * 1000000
               |      WHEN m.dst IN ('null') THEN 0
               |      ELSE m.p * coalesce(v.v, 0) END) // 1000000
               |      AS BIGINT) AS v
               |  FROM tm$tag m LEFT JOIN $prev v ON v.s = m.dst
               |  GROUP BY 1)""".stripMargin
          }
          (tmr +: its).mkString(",\n")
        }
        val variants = stages("b", None) + ",\n" +
          channels.map(c => stages(c, Some(c))).mkString(",\n")
        val selects = channels.map(c =>
          s"""SELECT '$c' AS channel,
             |  (SELECT v FROM v$c$Iters WHERE s = 'start')
             |    AS p_conv_micro,
             |  CASE WHEN (SELECT v FROM vb$Iters WHERE s = 'start')
             |      = 0 THEN 0
             |    ELSE ((SELECT v FROM vb$Iters WHERE s = 'start') -
             |      (SELECT v FROM v$c$Iters WHERE s = 'start'))
             |      * 1000000 //
             |      (SELECT v FROM vb$Iters WHERE s = 'start') END
             |    AS removal_effect_micro""".stripMargin)
        s"""WITH kept AS (SELECT user_id, epoch_us(ts) AS tus,
                |    event_id AS eid, event_type,
                |    coalesce(CAST(sum(CASE WHEN event_type =
                |      'purchase' THEN 1 ELSE 0 END) OVER (
                |      PARTITION BY user_id ORDER BY epoch_us(ts),
                |      event_id ROWS BETWEEN UNBOUNDED PRECEDING AND
                |      1 PRECEDING) AS BIGINT), 0) AS pp
                |  FROM events QUALIFY pp = 0),
                |st AS (SELECT user_id, tus, eid, event_type,
                |    row_number() OVER w AS rn,
                |    lead(event_type, 1) OVER w AS nxt
                |  FROM kept
                |  WINDOW w AS (PARTITION BY user_id
                |    ORDER BY tus, eid)),
                |tr AS (SELECT event_type AS src,
                |    CASE WHEN nxt IS NULL THEN 'null'
                |      WHEN nxt = 'purchase' THEN 'conv'
                |      ELSE nxt END AS dst
                |  FROM st WHERE event_type <> 'purchase'
                |  UNION ALL
                |  SELECT 'start',
                |    CASE WHEN event_type = 'purchase' THEN 'conv'
                |      ELSE event_type END
                |  FROM st WHERE rn = 1),
                |tc AS (SELECT src, dst, CAST(count(*) AS BIGINT)
                |    AS c FROM tr GROUP BY 1, 2),
                |ot AS (SELECT src, CAST(sum(c) AS BIGINT) AS o
                |  FROM tc GROUP BY 1),
                |tm AS MATERIALIZED (SELECT tc.src, tc.dst,
                |    tc.c * 1000000 // ot.o AS p
                |  FROM tc JOIN ot USING (src)),
                |$variants
                |SELECT 'base' AS channel,
                |  (SELECT v FROM vb$Iters WHERE s = 'start')
                |    AS p_conv_micro,
                |  CAST(0 AS BIGINT) AS removal_effect_micro
                |${selects.map("UNION ALL\n" + _).mkString("\n")}"""
          .stripMargin
  }
}
