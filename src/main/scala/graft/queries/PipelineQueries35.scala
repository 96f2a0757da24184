package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-fifth pipeline group — distributional data-quality audits
  * over the event feed:
  *
  *  - q283: Benford leading-digit audit — the classical fabricated-
  *    numbers screen. Expected shares are plan-time INTEGER literals
  *    (floor(1e6·log10(1+1/d)) computed once in Scala — no libm call
  *    crosses the engine boundary at all); the χ²-style deviation
  *    term runs on micro shares so no count product can overflow.
  *  - q284: population-stability index (PSI) between the first and
  *    second half of the time range — the industry drift metric for
  *    categorical distributions. Halves split at the integer midpoint
  *    day; the single ln is the mirrored-libm pattern (q113) over
  *    exact micro shares.
  *  - q285: per-user event-type entropy — behavioral-diversity
  *    profile. (user, type) counts collapse once; the per-user window
  *    spans at most |event types| rows (never the corpus — the q9
  *    rule); entropy terms quantize to micro-nats BEFORE the per-user
  *    sum, the established float discipline.
  */
object PipelineQueries35 {

  /** floor(1e6 · log10(1 + 1/d)) for d = 1..9 — Benford's law as
    * integer literals, identical in both engines by construction. */
  private val benfordMicro: Seq[Long] =
    (1 to 9).map(d => math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  val defs: Seq[QDef] = Seq(

    QDef("q283_benford_digits",
      (s, dir) => {
        val bf = benfordMicro.zipWithIndex
          .map { case (b, i) => (i + 1L, b) }
        val bfDf = s.createDataFrame(bf).toDF("digit", "benford_micro")
        val d = Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .filter(col("vm") >= 1)
          .select(col("event_type"),
            substring(col("vm").cast("string"), 1, 1).cast("long")
              .as("digit"))
          .groupBy("event_type", "digit").agg(count(lit(1)).as("n"))
          .localCheckpoint() // totals + output read it
        val tot = d.groupBy("event_type").agg(sum("n").as("tot"))
        d.join(broadcast(tot), "event_type")
          .join(broadcast(bfDf), "digit")
          .selectExpr("event_type", "digit", "n",
            "(1000000 * n) div tot AS share_micro", "benford_micro")
          .selectExpr("event_type", "digit", "n", "share_micro",
            "benford_micro",
            "((share_micro - benford_micro) * " +
              "(share_micro - benford_micro))" +
              " div greatest(benford_micro, 1L) AS chi2_term_micro")
      },
      Some({
        val bfRows = benfordMicro.zipWithIndex
          .map { case (b, i) => s"(${i + 1}, ${b}::BIGINT)" }
          .mkString(", ")
        s"""WITH bf(digit, benford_micro) AS (VALUES $bfRows),
           |d AS (SELECT event_type,
           |    CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS BIGINT)
           |      AS digit,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM (SELECT event_type,
           |      CAST(floor(1000000.0 * value) AS BIGINT) AS vm
           |    FROM events) e
           |  WHERE vm >= 1 GROUP BY 1, 2),
           |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
           |  FROM d GROUP BY 1),
           |w AS (SELECT event_type, CAST(digit AS BIGINT) AS digit, n,
           |    (1000000 * n) // tot AS share_micro, benford_micro
           |  FROM d JOIN t USING (event_type) JOIN bf USING (digit))
           |SELECT event_type, digit, n,
           |  CAST(share_micro AS BIGINT) AS share_micro,
           |  benford_micro,
           |  CAST(((share_micro - benford_micro)
           |      * (share_micro - benford_micro))
           |    // greatest(benford_micro, 1) AS BIGINT)
           |    AS chi2_term_micro
           |FROM w""".stripMargin
      })),

    // PSI drift between time halves. Shares in micro (≥1-guarded so
    // the log argument never degenerates); term =
    // (p1−p2)·ln(p1/p2) ≥ 0 per cell, micro-share-nat units.
    QDef("q284_psi_drift",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .localCheckpoint() // midpoint + both halves read it
        val mid = ev.agg(min("day").as("mn"), max("day").as("mx"))
          .selectExpr("(mn + mx + 1) div 2 AS mid")
        val h = ev.crossJoin(broadcast(mid))
          .select(col("event_type"),
            when(col("day") < col("mid"), 1L).otherwise(2L).as("half"))
          .groupBy("event_type", "half").agg(count(lit(1)).as("n"))
        val tot = h.groupBy("half").agg(sum("n").as("tot"))
        val p = h.join(broadcast(tot), "half")
          .selectExpr("event_type", "half",
            "greatest((1000000 * n) div tot, 1L) AS pm")
        p.groupBy("event_type")
          .agg(coalesce(max(when(col("half") === 1, col("pm"))), lit(1L))
              .as("p1m"),
            coalesce(max(when(col("half") === 2, col("pm"))), lit(1L))
              .as("p2m"))
          .select(col("event_type"), col("p1m").as("share1_micro"),
            col("p2m").as("share2_micro"),
            floor((col("p1m") - col("p2m")).cast("double") *
              log(col("p1m").cast("double") / col("p2m").cast("double")))
              .cast("long").as("psi_term_micro"))
      },
      Some("""WITH e AS (SELECT event_type,
             |    epoch_us(ts) // 86400000000 AS day FROM events),
             |m AS (SELECT (min(day) + max(day) + 1) // 2 AS mid FROM e),
             |h AS (SELECT event_type,
             |    CASE WHEN day < mid THEN 1 ELSE 2 END AS half,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM e CROSS JOIN m GROUP BY 1, 2),
             |t AS (SELECT half, CAST(sum(n) AS BIGINT) AS tot
             |  FROM h GROUP BY 1),
             |p AS (SELECT event_type, half,
             |    greatest((1000000 * n) // tot, 1) AS pm
             |  FROM h JOIN t USING (half)),
             |w AS (SELECT event_type,
             |    coalesce(max(CASE WHEN half = 1 THEN pm END), 1)
             |      AS p1m,
             |    coalesce(max(CASE WHEN half = 2 THEN pm END), 1)
             |      AS p2m
             |  FROM p GROUP BY event_type)
             |SELECT event_type,
             |  CAST(p1m AS BIGINT) AS share1_micro,
             |  CAST(p2m AS BIGINT) AS share2_micro,
             |  CAST(floor(CAST(p1m - p2m AS DOUBLE)
             |    * ln(CAST(p1m AS DOUBLE) / CAST(p2m AS DOUBLE)))
             |    AS BIGINT) AS psi_term_micro
             |FROM w""".stripMargin)),

    // Per-user event-type entropy. The per-user window spans ≤ |types|
    // rows; terms quantize to micro-nats before the sum.
    QDef("q285_user_type_entropy",
      (s, dir) => {
        val ct = Tables.events(s, dir)
          .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("user_id")
        ct.withColumn("n", sum("c").over(w))
          .select(col("user_id"), col("n"),
            floor((col("c") / col("n")) *
              log(col("n").cast("double") / col("c").cast("double")) *
              lit(1000000.0)).cast("long").as("term"))
          .groupBy("user_id")
          .agg(max("n").as("n_events"), count(lit(1)).as("n_types"),
            sum("term").as("entropy_micro_nat"))
      },
      Some("""WITH c AS (SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |n AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n
             |  FROM c GROUP BY 1),
             |t AS (SELECT user_id, n,
             |    CAST(floor((c / n)
             |      * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
             |      * 1000000.0) AS BIGINT) AS term
             |  FROM c JOIN n USING (user_id))
             |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
             |  CAST(count(*) AS BIGINT) AS n_types,
             |  CAST(sum(term) AS BIGINT) AS entropy_micro_nat
             |FROM t GROUP BY user_id""".stripMargin))
  )
}
