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

    // Both engines restrict to the pinned pivot langs BEFORE counting,
    // so n_total == Σ n_* by construction on ANY data — without the
    // filter, a row whose lang falls outside `Langs` would appear in
    // the oracle's count(*) but in no pivot column, and the engines
    // would diverge only at cross-engine verify time.
    QDef("q250_pivot_matrix",
      (s, dir) => {
        val wide = Tables.documents(s, dir)
          .filter(col("lang").isin(Langs.map(l => l: Any): _*))
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
        val inList = Langs.map(l => s"'$l'").mkString(", ")
        s"""SELECT source, $cases,
           |  CAST(count(*) AS BIGINT) AS n_total
           |FROM documents WHERE lang IN ($inList) GROUP BY source"""
          .stripMargin
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
    // count-compare aggregations (no row explosion), and they run
    // over 8-byte token HASHES, not strings — the output is counts
    // only, so the shuffle never carries token text (the q227/q239
    // house rule); the oracle replays the same md5-prefix hash.
    QDef("q253_set_ops_all",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(graft.functions.TextAnalysis.tokens(col("text")))
              .as("tok"))
          .select(col("doc_id"),
            graft.functions.TextAnalysis.tokenHash(col("tok")).as("th"))
          .localCheckpoint() // both halves read it
        val a = t.filter(col("doc_id") % 2 === 0).select("th")
        val b = t.filter(col("doc_id") % 2 === 1).select("th")
        a.intersectAll(b).agg(count(lit(1)).as("n_intersect_all"))
          .crossJoin(a.exceptAll(b)
            .agg(count(lit(1)).as("n_except_all")))
          .crossJoin(a.agg(count(lit(1)).as("n_a")))
          .crossJoin(b.agg(count(lit(1)).as("n_b")))
      },
      Some(s"""WITH t0 AS (SELECT doc_id,
              |    unnest(list_filter(string_split(text, ' '),
              |      x -> x != '')) AS tok
              |  FROM documents),
              |t AS (SELECT doc_id,
              |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS th
              |  FROM t0),
              |a AS (SELECT th FROM t WHERE doc_id % 2 = 0),
              |b AS (SELECT th FROM t WHERE doc_id % 2 = 1)
              |SELECT
              |  (SELECT CAST(count(*) AS BIGINT) FROM
              |    (SELECT th FROM a INTERSECT ALL SELECT th FROM b) x)
              |    AS n_intersect_all,
              |  (SELECT CAST(count(*) AS BIGINT) FROM
              |    (SELECT th FROM a EXCEPT ALL SELECT th FROM b) y)
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
    // summation). Values quantize to integer micro AT THE SCAN, so the
    // corpus collapses to a (type, micro-value) histogram in ONE
    // shuffle; the p05/p95 fences are the classical discrete order
    // statistic over the cumulative histogram (the q149 shape — never
    // a raw-double `percentile()` whose aggregation buffer holds
    // O(distinct values) per group), and the winsorized mean is an
    // exact long aggregation over the CLIPPED histogram itself — the
    // clip pass touches O(distinct micro values) rows, not the corpus.
    QDef("q256_robust_value_stats",
      (s, dir) => {
        val hist = Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("event_type", "vm").agg(count(lit(1)).as("c"))
          .localCheckpoint() // fence pass + clip pass read it
        val n = hist.groupBy("event_type").agg(sum("c").as("n"))
        val w = Window.partitionBy("event_type").orderBy("vm")
          .rowsBetween(Window.unboundedPreceding, 0)
        def fence(p: Int, out: String) =
          min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
            col("vm"))).as(out)
        val fences = hist.withColumn("cum", sum("c").over(w))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(fence(5, "p05m"), fence(95, "p95m"))
        hist.join(broadcast(fences), "event_type")
          .select(col("event_type"), col("p05m"), col("p95m"), col("c"),
            (col("c") *
              least(greatest(col("vm"), col("p05m")), col("p95m")))
              .as("cw"))
          .groupBy("event_type")
          .agg(sum("c").as("n"),
            max("p05m").as("p05_micro"), max("p95m").as("p95_micro"),
            sum("cw").as("sw"))
          .select(col("event_type"), col("n"),
            col("p05_micro"), col("p95_micro"),
            expr("sw div n").as("winsor_mean_micro"))
      },
      Some("""WITH h AS (SELECT event_type,
             |    CAST(floor(1000000.0 * value) AS BIGINT) AS vm,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |cc AS (SELECT event_type, vm, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY vm)
             |      AS cum
             |  FROM h),
             |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
             |  FROM h GROUP BY 1),
             |f AS (SELECT event_type,
             |    min(CASE WHEN cum >= (5*n + 99) // 100 THEN vm END)
             |      AS p05m,
             |    min(CASE WHEN cum >= (95*n + 99) // 100 THEN vm END)
             |      AS p95m
             |  FROM cc JOIN n USING (event_type) GROUP BY event_type)
             |SELECT h.event_type, CAST(sum(c) AS BIGINT) AS n,
             |  CAST(max(p05m) AS BIGINT) AS p05_micro,
             |  CAST(max(p95m) AS BIGINT) AS p95_micro,
             |  CAST(CAST(sum(c * least(greatest(vm, p05m), p95m))
             |      AS BIGINT) // CAST(sum(c) AS BIGINT) AS BIGINT)
             |    AS winsor_mean_micro
             |FROM h JOIN f USING (event_type)
             |GROUP BY h.event_type""".stripMargin))
  )
}
