package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Forty-ninth pipeline group — submodular data selection and
  * lead-lag analytics:
  *
  *  - q313: greedy set-cover source selection. "Which K sources buy the
  *    most CONTENT coverage?" is the submodular-maximization core of
  *    corpus curation (facility location / coverage functions; the
  *    greedy algorithm's (1−1/e) guarantee is Nemhauser-Wolsey-Fisher
  *    1978). Universe = distinct 3-gram shingle hashes (the token-type
  *    universe is ~31 types in this corpus — saturated by any single
  *    source; shingles measure composition, which is what transfers).
  *    K=4 driver-side rounds, each ONE anti-join + aggregation over
  *    the (source, shingle) table — the bounded-round q229 discipline;
  *    the per-round winner is a 1-row collect. Marginal gains are
  *    monotonically non-increasing (submodularity) — spec-pinned. The
  *    oracle unrolls the identical 4 stages with MATERIALIZED CTEs
  *    (the q212 Viterbi pattern).
  *  - q314: lead-lag cross-correlation between event types — does one
  *    series' daily rhythm anticipate another's? For each ordered type
  *    pair and lag ∈ [−3, 3], the covariance score between the
  *    DENSIFIED daily count series, in cross-multiplied integers
  *    (D·c(d) − S — no fractional means), summed over the overlapping
  *    day range; best lag by (score desc, |lag|, lag) — a total order.
  *    Every frame after the one corpus aggregation is
  *    (types × days)-sized. Unit note: D·c − S stays in int64 while
  *    daily counts are < ~3e8; a 100 TB deployment re-buckets to
  *    hours-of-day or scales counts down before the product (same
  *    algebra).
  */
object PipelineQueries49 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"
  private val CoverRounds = 4
  private val MaxLag = 3

  /** The (source, distinct shingle hash) table + oracle CTE both q313
    * stages share. */
  private val shCte =
    s"""t AS (SELECT source, $toksSql AS toks FROM documents),
       |sh AS MATERIALIZED (SELECT DISTINCT source,
       |    ${tokenHashSql.replace("__T__", "g")} AS h
       |  FROM (SELECT source,
       |      unnest(CASE WHEN len(toks) >= 3 THEN
       |        list_transform(generate_series(1, len(toks) - 2),
       |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |        ELSE [] END) AS g
       |    FROM t))""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q313_greedy_set_cover",
      (s, dir) => {
        val st = Tables.documents(s, dir)
          .select(col("source"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("source"),
            explode(shingleHashes(col("toks"))).as("h"))
          .distinct()
          .localCheckpoint() // joined K times in the greedy rounds
        val total = st.select("h").distinct().count()
        var covered: DataFrame =
          st.select("h").limit(0).localCheckpoint()
        var chosen = List.empty[String]
        val rows = (1 to CoverRounds).map { r =>
          val base =
            if (chosen.isEmpty) st
            else st.filter(!col("source").isin(chosen: _*))
          val gains = base
            .join(covered, Seq("h"), "left_anti")
            .groupBy("source").agg(count(lit(1)).as("gain"))
            .orderBy(col("gain").desc, col("source").asc)
            .limit(1)
          val hr = gains.head()
          val w = hr.getString(0)
          val g = hr.getLong(1)
          covered = covered
            .unionByName(st.filter(col("source") === w).select("h"))
            .distinct().localCheckpoint()
          chosen ::= w
          val cum = covered.count()
          Row(r.toLong, w, g, cum, cum * 1000000L / total)
        }
        s.createDataFrame(
          s.sparkContext.parallelize(rows.toSeq, 1),
          StructType(Seq(
            StructField("round", LongType),
            StructField("source", StringType),
            StructField("new_types", LongType),
            StructField("cum_types", LongType),
            StructField("coverage_micro", LongType))))
      },
      Some(s"""WITH $shCte,
              |tot AS (SELECT CAST(count(DISTINCT h) AS BIGINT) AS t
              |  FROM sh),
              |g1 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain
              |  FROM sh GROUP BY 1),
              |w1 AS (SELECT source, gain FROM g1
              |  ORDER BY gain DESC, source LIMIT 1),
              |c1 AS MATERIALIZED (SELECT DISTINCT h FROM sh
              |  JOIN w1 USING (source)),
              |n1 AS (SELECT CAST(count(*) AS BIGINT) AS cum FROM c1),
              |g2 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain
              |  FROM sh WHERE source NOT IN (SELECT source FROM w1)
              |    AND h NOT IN (SELECT h FROM c1) GROUP BY 1),
              |w2 AS (SELECT source, gain FROM g2
              |  ORDER BY gain DESC, source LIMIT 1),
              |c2 AS MATERIALIZED (SELECT h FROM c1 UNION
              |  SELECT h FROM sh JOIN w2 USING (source)),
              |n2 AS (SELECT CAST(count(*) AS BIGINT) AS cum FROM c2),
              |g3 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain
              |  FROM sh WHERE source NOT IN (SELECT source FROM w1)
              |    AND source NOT IN (SELECT source FROM w2)
              |    AND h NOT IN (SELECT h FROM c2) GROUP BY 1),
              |w3 AS (SELECT source, gain FROM g3
              |  ORDER BY gain DESC, source LIMIT 1),
              |c3 AS MATERIALIZED (SELECT h FROM c2 UNION
              |  SELECT h FROM sh JOIN w3 USING (source)),
              |n3 AS (SELECT CAST(count(*) AS BIGINT) AS cum FROM c3),
              |g4 AS (SELECT source, CAST(count(*) AS BIGINT) AS gain
              |  FROM sh WHERE source NOT IN (SELECT source FROM w1)
              |    AND source NOT IN (SELECT source FROM w2)
              |    AND source NOT IN (SELECT source FROM w3)
              |    AND h NOT IN (SELECT h FROM c3) GROUP BY 1),
              |w4 AS (SELECT source, gain FROM g4
              |  ORDER BY gain DESC, source LIMIT 1),
              |c4 AS (SELECT h FROM c3 UNION
              |  SELECT h FROM sh JOIN w4 USING (source)),
              |n4 AS (SELECT CAST(count(*) AS BIGINT) AS cum FROM c4)
              |SELECT CAST(1 AS BIGINT) AS round, w1.source,
              |  w1.gain AS new_types, n1.cum AS cum_types,
              |  n1.cum * 1000000 // tot.t AS coverage_micro
              |  FROM w1, n1, tot
              |UNION ALL SELECT 2, w2.source, w2.gain, n2.cum,
              |  n2.cum * 1000000 // tot.t FROM w2, n2, tot
              |UNION ALL SELECT 3, w3.source, w3.gain, n3.cum,
              |  n3.cum * 1000000 // tot.t FROM w3, n3, tot
              |UNION ALL SELECT 4, w4.source, w4.gain, n4.cum,
              |  n4.cum * 1000000 // tot.t FROM w4, n4, tot"""
        .stripMargin)),

    QDef("q314_lead_lag_xcorr",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val bounds = ev.agg(to_date(min("ts")).as("d0"),
          to_date(max("ts")).as("d1"))
        val spine = bounds.select(explode(sequence(lit(0),
          datediff(col("d1"), col("d0")))).as("d"))
          .select(col("d").cast("long").as("d"))
        val daily = ev.crossJoin(broadcast(bounds))
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), col("d0")).cast("long").as("d"))
          .agg(count(lit(1)).as("c"))
        // densified deviation series: dev(d) = D·c(d) − S (integer,
        // no fractional mean). Everything below is (types×days)-sized.
        val types = daily.select("event_type").distinct()
        val dense = types.crossJoin(broadcast(spine))
          .join(daily, Seq("event_type", "d"), "left")
          .withColumn("c", coalesce(col("c"), lit(0L)))
        val stats = dense.groupBy("event_type")
          .agg(count(lit(1)).as("dd"), sum("c").as("ss"))
        val dev = dense.join(stats, "event_type")
          .select(col("event_type"), col("d"),
            (col("dd") * col("c") - col("ss")).as("x"))
          .localCheckpoint() // both sides of the lag join
        // equi-join on the shifted day (d2 = d + lag): 7× fan-out of a
        // (types×days)-bounded frame, then a hash join — no
        // nested-loop pairing.
        val lagged = dev.as("a")
          .withColumn("lag",
            explode(sequence(lit(-MaxLag.toLong), lit(MaxLag.toLong))))
          .withColumn("d2", col("d") + col("lag"))
          .join(dev.as("b"),
            col("d2") === col("b.d") &&
              col("a.event_type") < col("b.event_type"))
          .groupBy(col("a.event_type").as("type_a"),
            col("b.event_type").as("type_b"), col("lag"))
          .agg(sum(col("a.x") * col("b.x")).as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("type_a", "type_b")
          .orderBy(col("score").desc, abs(col("lag")).asc,
            col("lag").asc)
        lagged.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("type_a"), col("type_b"),
            col("lag").as("best_lag"), col("score").as("best_score"))
      },
      Some(s"""WITH b AS (SELECT min(ts::DATE) AS d0,
              |    max(ts::DATE) AS d1 FROM events),
              |sp AS (SELECT CAST(unnest(generate_series(0,
              |    date_diff('day', d0, d1))) AS BIGINT) AS d FROM b),
              |dl AS (SELECT event_type,
              |    CAST(date_diff('day', b.d0, ts::DATE) AS BIGINT)
              |      AS d,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM events, b GROUP BY 1, 2),
              |ty AS (SELECT DISTINCT event_type FROM dl),
              |de AS (SELECT ty.event_type, sp.d,
              |    coalesce(dl.c, 0) AS c
              |  FROM ty CROSS JOIN sp LEFT JOIN dl
              |    ON dl.event_type = ty.event_type AND dl.d = sp.d),
              |st AS (SELECT event_type,
              |    CAST(count(*) AS BIGINT) AS dd,
              |    CAST(sum(c) AS BIGINT) AS ss
              |  FROM de GROUP BY 1),
              |dv AS MATERIALIZED (SELECT de.event_type, de.d,
              |    st.dd * de.c - st.ss AS x
              |  FROM de JOIN st USING (event_type)),
              |lg AS (SELECT a.event_type AS type_a,
              |    b.event_type AS type_b, b.d - a.d AS lag,
              |    CAST(sum(a.x * b.x) AS BIGINT) AS score
              |  FROM dv a JOIN dv b
              |    ON a.event_type < b.event_type
              |    AND abs(b.d - a.d) <= $MaxLag
              |  GROUP BY 1, 2, 3),
              |rk AS (SELECT type_a, type_b, lag, score,
              |    row_number() OVER (PARTITION BY type_a, type_b
              |      ORDER BY score DESC, abs(lag), lag) AS rk
              |  FROM lg)
              |SELECT type_a, type_b, lag AS best_lag,
              |  score AS best_score
              |FROM rk WHERE rk = 1""".stripMargin))
  )
}
