package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-third pipeline group — association mining on both tables:
  *
  *  - q301: collocation mining by PMI — adjacent token pairs ranked
  *    by pointwise mutual information, the classical collocation
  *    detector (q239's phrase miner ranks by FREQUENCY; PMI ranks by
  *    ASSOCIATION — "new york" beats "of the" here and not there).
  *    The corpus shuffle carries only gram/token hashes (house
  *    rule); a minimum-support gate keeps the PMI table off the
  *    hapax noise floor; winner surfaces (the readable token pair)
  *    are recovered for the top rows only, behind the support gate —
  *    never a corpus-wide string shuffle. One mirrored ln over exact
  *    integer count ratios.
  *  - q302: conversion attribution models — for every purchase,
  *    first-touch vs last-touch attribution to the preceding
  *    non-purchase event type within a 24 h lookback. The marketing
  *    classic the funnel family (ordered counts) and q274 (trend)
  *    don't express: WHICH channel gets credit under WHICH model,
  *    on the same purchases. Per-user windows over the pinned
  *    (ts, event_id) order; both models computed in ONE pass and
  *    unpivoted so the output is model-comparable by construction.
  */
object PipelineQueries43 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"
  private val MinSupport = 5

  val defs: Seq[QDef] = Seq(

    QDef("q301_collocation_pmi",
      (s, dir) => {
        // every token is hashed ONCE (array transform) — the naive
        // per-bigram md5 triple costs 3× the hashing for the same
        // stream; the bigram key is the integer pair-combine of the
        // two token hashes (deterministic in both engines, collisions
        // = pair collisions only).
        val toks = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
          .select(col("toks"), transform(col("toks"),
            t => tokenHash(t)).as("hs"))
          .localCheckpoint() // unigram counts + bigram counts + surface
        val uni = toks
          .select(explode(col("hs")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("cu"))
        val bi = toks
          .select(col("toks"), col("hs"),
            posexplode(col("toks")).as(Seq("i", "w1")))
          .filter(col("i") < size(col("toks")) - 1)
          .select(col("w1"),
            element_at(col("toks"), col("i") + 2).as("w2"),
            element_at(col("hs"), col("i") + 1).as("h1"),
            element_at(col("hs"), col("i") + 2).as("h2"))
          .withColumn("hb", expr("h1 * 1048573L + h2"))
          .localCheckpoint() // counts + the surface recovery join
        val bc = bi.groupBy("h1", "h2", "hb")
          .agg(count(lit(1)).as("cb"))
          .filter(col("cb") >= MinSupport)
        val tot = uni.agg(sum("cu").as("nu"))
        val nb = bi.agg(count(lit(1)).as("nb"))
        val scored = bc
          .join(uni.select(col("h").as("h1"), col("cu").as("c1")), "h1")
          .join(uni.select(col("h").as("h2"), col("cu").as("c2")), "h2")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(nb))
          // PMI = ln( (cb/nb) / ((c1/nu)·(c2/nu)) )
          .select(col("hb"), col("cb"), col("c1"), col("c2"),
            floor(log((col("cb") * col("nu") * col("nu")) /
              (col("nb") * col("c1") * col("c2"))) * lit(1000000.0))
              .cast("long").as("pmi_micro_nat"))
        // winners are selected on HASHES ONLY (TakeOrdered, hb as the
        // deterministic tie-break both engines share); the readable
        // surface is recovered for those ≤50 hb values behind a
        // broadcast restriction — the corpus-side shuffle never
        // carries bigram text (the q239/q253 house rule).
        val winners = scored
          .orderBy(col("pmi_micro_nat").desc, col("hb").asc)
          .limit(50)
          .localCheckpoint() // surface restriction + final join
        val surface = bi
          .join(broadcast(winners.select(col("hb"))), "hb")
          .select(col("hb"),
            concat_ws(" ", col("w1"), col("w2")).as("bigram"))
          .groupBy("hb").agg(min("bigram").as("bigram"))
        winners.join(surface, "hb")
          .select(col("bigram"), col("cb").as("n_occurrences"),
            col("c1"), col("c2"), col("pmi_micro_nat"))
      },
      Some(s"""WITH t AS MATERIALIZED (SELECT $toksSql AS toks
              |  FROM documents),
              |u AS (SELECT ${hashSql("tok")} AS h,
              |    CAST(count(*) AS BIGINT) AS cu
              |  FROM (SELECT unnest(toks) AS tok FROM t) GROUP BY 1),
              |b0 AS MATERIALIZED (SELECT h1, h2,
              |    h1 * 1048573 + h2 AS hb,
              |    w1 || ' ' || w2 AS bigram
              |  FROM (SELECT toks[i] AS w1, toks[i+1] AS w2,
              |      hs[i] AS h1, hs[i+1] AS h2
              |    FROM (SELECT toks, list_transform(toks,
              |        tok -> ${hashSql("tok")}) AS hs FROM t) tt,
              |      unnest(generate_series(1, len(toks) - 1))
              |      AS g(i))),
              |bc AS (SELECT h1, h2, hb, CAST(count(*) AS BIGINT) AS cb
              |  FROM b0 GROUP BY 1, 2, 3
              |  HAVING count(*) >= $MinSupport),
              |nu AS (SELECT CAST(sum(cu) AS BIGINT) AS nu FROM u),
              |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM b0),
              |sc AS (SELECT hb, cb, x.cu AS c1, y.cu AS c2,
              |    CAST(floor(ln((cb * nu * nu)
              |      / (nb * x.cu * y.cu)) * 1000000.0) AS BIGINT)
              |      AS pmi_micro_nat
              |  FROM bc JOIN u x ON bc.h1 = x.h
              |    JOIN u y ON bc.h2 = y.h
              |  CROSS JOIN nu CROSS JOIN nb),
              |wn AS (SELECT * FROM sc
              |  ORDER BY pmi_micro_nat DESC, hb ASC LIMIT 50),
              |sf AS (SELECT hb, min(bigram) AS bigram FROM b0
              |  GROUP BY hb)
              |SELECT bigram, cb AS n_occurrences, c1, c2,
              |  pmi_micro_nat
              |FROM wn JOIN sf USING (hb)""".stripMargin)),

    QDef("q302_attribution_models",
      (s, dir) => {
        val wo = Window.partitionBy("user_id")
          .orderBy(col("tus").asc, col("eid").asc)
        val ev = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id").cast("long").as("eid"), col("event_type"))
        // carry the running first/last qualifying touch; reset the
        // window to 24 h via the value predicate inside min/max over
        // preceding rows — per-user frames only.
        val touches = ev
          .withColumn("isTouch",
            (col("event_type") =!= "purchase").cast("boolean"))
        val wPrev = wo.rowsBetween(Window.unboundedPreceding, -1)
        val attributed = touches
          .withColumn("last_touch",
            max(when(col("isTouch"),
              struct(col("tus").as("t"), col("eid").as("e"),
                col("event_type").as("ty")))).over(wPrev))
          .withColumn("first_touch",
            min(when(col("isTouch"),
              struct(col("tus").as("t"), col("eid").as("e"),
                col("event_type").as("ty")))).over(wPrev))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("tus"),
            when(col("last_touch").isNotNull &&
              col("tus") - col("last_touch.t") <= 86400000000L,
              col("last_touch.ty")).as("last_ty"),
            when(col("first_touch").isNotNull,
              col("first_touch.ty")).as("first_ty"))
        val last = attributed
          .groupBy(coalesce(col("last_ty"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n"))
          .select(lit("last_touch_24h").as("model"), col("channel"),
            col("n"))
        val first = attributed
          .groupBy(coalesce(col("first_ty"), lit("none")).as("channel"))
          .agg(count(lit(1)).as("n"))
          .select(lit("first_touch").as("model"), col("channel"),
            col("n"))
        last.unionByName(first)
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus,
             |    event_id AS eid, event_type FROM events),
             |a AS (SELECT user_id, tus, event_type,
             |    max(CASE WHEN event_type <> 'purchase' THEN
             |      {'t': tus, 'e': eid, 'ty': event_type} END)
             |      OVER wp AS last_touch,
             |    min(CASE WHEN event_type <> 'purchase' THEN
             |      {'t': tus, 'e': eid, 'ty': event_type} END)
             |      OVER wp AS first_touch
             |  FROM e
             |  WINDOW wp AS (PARTITION BY user_id
             |    ORDER BY tus, eid
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
             |p AS (SELECT user_id, tus,
             |    CASE WHEN last_touch IS NOT NULL
             |      AND tus - last_touch.t <= 86400000000
             |      THEN last_touch.ty END AS last_ty,
             |    CASE WHEN first_touch IS NOT NULL
             |      THEN first_touch.ty END AS first_ty
             |  FROM a WHERE event_type = 'purchase')
             |SELECT 'last_touch_24h' AS model,
             |  coalesce(last_ty, 'none') AS channel,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM p GROUP BY 2
             |UNION ALL
             |SELECT 'first_touch', coalesce(first_ty, 'none'),
             |  CAST(count(*) AS BIGINT)
             |FROM p GROUP BY 2""".stripMargin))
  )
}
