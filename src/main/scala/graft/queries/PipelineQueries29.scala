package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-ninth pipeline group — the remaining classic relational
  * surfaces (pivot / unpivot / RANGE-frame windows), exercised as
  * first-class operators:
  *
  *  - q250: pivot — the per-source lang-count matrix in WIDE form via
  *    `RelationalGroupedDataset.pivot` with an EXPLICIT value list
  *    (the scale-correct form: an implicit pivot runs a distinct-
  *    values job first and caps at
  *    spark.sql.pivotMaxValues — explicit values make the plan a
  *    single pass of conditional aggregates). Oracle = CASE sums,
  *    which is literally the plan Spark generates.
  *  - q251: unpivot/melt (Spark 3.4+ `Dataset.unpivot`) — lineitem's
  *    three money-ish measures to long form, then a per-measure
  *    rollup. Unpivot is a zero-shuffle Expand (×3 rows map-side),
  *    so the aggregation is the only exchange.
  *  - q252: RANGE-frame rolling window — each user's trailing-24-hour
  *    event count at every event (`rangeBetween` on the epoch-second
  *    axis, vs the ROWS frames every other window query uses). The
  *    partition is per-user (the q18/q166 contract); emitted as the
  *    per-user MAX burst so the result is O(#users), not O(events).
  */
object PipelineQueries29 {

  /** Fixture langs, pinned (TESTDATA.md); the explicit pivot list. */
  private val Langs = Seq("de", "en", "es", "fr", "zh")

  val defs: Seq[QDef] = Seq(

    QDef("q250_pivot_matrix",
      (s, dir) => {
        val wide = Tables.documents(s, dir)
          .groupBy("source")
          .pivot("lang", Langs)
          .agg(count(lit(1)))
        Langs.foldLeft(wide)((d, l) =>
            d.withColumn(s"n_$l", coalesce(col(l), lit(0L))))
          .select(col("source") +: Langs.map(l => col(s"n_$l")) :+
            Langs.map(l => col(s"n_$l")).reduce(_ + _).as("n_total"): _*)
      },
      Some {
        val cases = Langs.map(l =>
          s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT)" +
            s" AS n_$l").mkString(",\n  ")
        s"""SELECT source, $cases,
           |  CAST(count(*) AS BIGINT) AS n_total
           |FROM documents GROUP BY source""".stripMargin
      }),

    QDef("q251_unpivot_measures",
      (s, dir) => {
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"),
            col("l_quantity").cast("double").as("quantity"),
            col("l_extendedprice").cast("double").as("extendedprice"),
            col("l_discount").cast("double").as("discount"))
          .unpivot(Array(col("l_orderkey")),
            Array(col("quantity"), col("extendedprice"), col("discount")),
            "measure", "value")
          .groupBy("measure")
          .agg(count(lit(1)).as("n"),
            round(min("value"), 6).as("min_v"),
            round(max("value"), 6).as("max_v"))
      },
      Some("""WITH u AS (
             |  SELECT l_orderkey, 'quantity' AS measure,
             |    l_quantity::DOUBLE AS value FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, 'extendedprice',
             |    l_extendedprice::DOUBLE FROM lineitem
             |  UNION ALL
             |  SELECT l_orderkey, 'discount',
             |    l_discount::DOUBLE FROM lineitem)
             |SELECT measure, CAST(count(*) AS BIGINT) AS n,
             |  round(min(value), 6) AS min_v,
             |  round(max(value), 6) AS max_v
             |FROM u GROUP BY measure""".stripMargin)),

    QDef("q252_rolling_burst",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("tsec"))
          .rangeBetween(-86400L, 0L) // trailing 24 h on the value axis
        Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 1000000").as("tsec"))
          .withColumn("w24", count(lit(1)).over(w))
          .groupBy("user_id")
          .agg(max("w24").as("max_24h_events"),
            count(lit(1)).as("n_events"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) // 1000000
             |    AS tsec FROM events),
             |r AS (SELECT user_id, count(*) OVER (
             |    PARTITION BY user_id ORDER BY tsec
             |    RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW) AS w24
             |  FROM e)
             |SELECT user_id,
             |  CAST(max(w24) AS BIGINT) AS max_24h_events,
             |  CAST(count(*) AS BIGINT) AS n_events
             |FROM r GROUP BY user_id""".stripMargin)),

    // Multiset set-ops (§2.7's ALL variants): token-bag INTERSECT ALL
    // and EXCEPT ALL between the even- and odd-doc halves of the
    // corpus — multiplicity-aware overlap, which the q11/q13 DISTINCT
    // set ops deliberately erase. `intersectAll`/`exceptAll` plan as
    // count-compare aggregations (no row explosion); the output is
    // the one-row overlap scorecard.
    QDef("q253_set_ops_all",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(graft.functions.TextAnalysis.tokens(col("text")))
              .as("tok"))
          .localCheckpoint() // both halves read it
        val a = t.filter(col("doc_id") % 2 === 0).select("tok")
        val b = t.filter(col("doc_id") % 2 === 1).select("tok")
        a.intersectAll(b).agg(count(lit(1)).as("n_intersect_all"))
          .crossJoin(a.exceptAll(b)
            .agg(count(lit(1)).as("n_except_all")))
          .crossJoin(a.agg(count(lit(1)).as("n_a")))
          .crossJoin(b.agg(count(lit(1)).as("n_b")))
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |    unnest(list_filter(string_split(text, ' '),
              |      x -> x != '')) AS tok
              |  FROM documents),
              |a AS (SELECT tok FROM t WHERE doc_id % 2 = 0),
              |b AS (SELECT tok FROM t WHERE doc_id % 2 = 1)
              |SELECT
              |  (SELECT CAST(count(*) AS BIGINT) FROM
              |    (SELECT tok FROM a INTERSECT ALL SELECT tok FROM b) x)
              |    AS n_intersect_all,
              |  (SELECT CAST(count(*) AS BIGINT) FROM
              |    (SELECT tok FROM a EXCEPT ALL SELECT tok FROM b) y)
              |    AS n_except_all,
              |  (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
              |  (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b"""
        .stripMargin)),

    // Day-of-week × hour activity heatmap — the traffic-shape rollup
    // behind capacity planning and the q146/q175 rhythm audits. One
    // aggregation; share in milli of total. CROSS-ENGINE TRAP: Spark
    // `dayofweek` is 1-7 (Sunday = 1), DuckDB's is 0-6 (Sunday = 0) —
    // the oracle adds 1. Session timezone is pinned UTC everywhere,
    // so both engines bucket the same wall-clock instant.
    QDef("q254_activity_heatmap",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(dayofweek(col("ts")).cast("long").as("dow"),
            hour(col("ts")).cast("long").as("hr"))
          .groupBy("dow", "hr").agg(count(lit(1)).as("n"))
          .localCheckpoint() // total + shares read it
        e.crossJoin(broadcast(e.agg(sum("n").as("tot"))))
          .select(col("dow"), col("hr"), col("n"),
            expr("(1000 * n) div tot").as("share_milli"))
      },
      Some("""WITH h AS (SELECT dayofweek(ts) + 1 AS dow,
             |    CAST(hour(ts) AS BIGINT) AS hr,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM h)
             |SELECT CAST(dow AS BIGINT) AS dow, hr, n,
             |  CAST((1000 * n) // tot AS BIGINT) AS share_milli
             |FROM h CROSS JOIN t""".stripMargin)),

    // Funnel latency: time-to-convert quantiles (first qualifying
    // purchase − first view, ordered-funnel semantics) across
    // converted users — the latency face of q217's conversion counts.
    // One per-user window pass (the q217 staged construction), one
    // per-user aggregate, exact interpolated percentiles over the
    // O(#converted-users) frame (the q73 contract; approx_percentile
    // is the 100 TB swap).
    QDef("q255_funnel_latency",
      (s, dir) => {
        PipelineQueries24.funnelStaged(s, dir).groupBy("user_id")
          .agg(min(when(col("event_type") === "view", col("tus")))
              .as("tv"),
            min(col("pav")).as("tp"))
          .filter(col("tp").isNotNull)
          .select(expr("(tp - tv) div 1000000").as("dt_sec"))
          .agg(count(lit(1)).as("n_converted"),
            round(percentile(col("dt_sec"), lit(0.5)), 6).as("p50_sec"),
            round(percentile(col("dt_sec"), lit(0.9)), 6).as("p90_sec"))
      },
      Some(s"""WITH ${PipelineQueries24.funnelCtes},
             |u AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN tus END) AS tv,
             |    min(pav) AS tp
             |  FROM p4 GROUP BY user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_converted,
             |  round(quantile_cont((tp - tv) // 1000000, 0.5), 6)
             |    AS p50_sec,
             |  round(quantile_cont((tp - tv) // 1000000, 0.9), 6)
             |    AS p90_sec
             |FROM u WHERE tp IS NOT NULL""".stripMargin)),

    // Winsorized value statistics per event type — the outlier-robust
    // revenue/metric rollup (raw float means are both statistically
    // fragile AND cross-engine nondeterministic under reordered
    // summation). Per type: exact p05/p95 fences, then every value
    // CLIPS to the fences and quantizes to integer micro BEFORE the
    // sum — the winsorized mean is an exact long aggregation (the q78
    // rule applied to money-ish doubles). Fences broadcast back at
    // the scan; two passes total, the percentile pass bounded by the
    // q73 contract.
    QDef("q256_robust_value_stats",
      (s, dir) => {
        val e = Tables.events(s, dir)
          .select(col("event_type"), col("value"))
          .localCheckpoint() // fence pass + clip pass read it
        val fences = e.groupBy("event_type")
          .agg(round(percentile(col("value"), lit(0.05)), 6).as("p05"),
            round(percentile(col("value"), lit(0.95)), 6).as("p95"))
        e.join(broadcast(fences), "event_type")
          .select(col("event_type"), col("p05"), col("p95"),
            floor(lit(1000000.0) *
              least(greatest(col("value"), col("p05")), col("p95")))
              .cast("long").as("wv"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            max("p05").as("p05"), max("p95").as("p95"),
            sum("wv").as("sw"))
          .select(col("event_type"), col("n"), col("p05"), col("p95"),
            expr("sw div n").as("winsor_mean_micro"))
      },
      Some("""WITH f AS (SELECT event_type,
             |    round(quantile_cont(value, 0.05), 6) AS p05,
             |    round(quantile_cont(value, 0.95), 6) AS p95
             |  FROM events GROUP BY 1),
             |c AS (SELECT e.event_type, f.p05, f.p95,
             |    CAST(floor(1000000.0 *
             |      least(greatest(e.value, f.p05), f.p95)) AS BIGINT)
             |      AS wv
             |  FROM events e JOIN f USING (event_type))
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  max(p05) AS p05, max(p95) AS p95,
             |  CAST(CAST(sum(wv) AS BIGINT) // count(*) AS BIGINT)
             |    AS winsor_mean_micro
             |FROM c GROUP BY event_type""".stripMargin))
  )
}
