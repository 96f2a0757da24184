package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.VectorSearch._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-first pipeline group — the statistics layer a corpus
  * dashboard runs continuously: mergeable quantile sketches, robust
  * outlier screens, trend fits, cluster-quality and diversity audits,
  * and the native grouping-set rollup.
  *
  *  - q264: log-bucket quantile sketch (the HdrHistogram/DDSketch
  *    shape): base-2 exponent buckets with 4-bit linear sub-buckets
  *    give a CONSTANT relative-error guarantee (≤ ~1/32) over the
  *    full value range in ≤ 16·64 longs of state per group —
  *    mergeable by addition, so the 100 TB path is one map-side
  *    combined aggregation regardless of value distribution. q114's
  *    linear fixed-bin histogram cannot do this: its absolute bin
  *    width makes relative error unbounded near zero and state
  *    useless for heavy upper tails. The query carries the exact
  *    histogram-first percentile (the q149/q256 contract) alongside
  *    and reports the measured relative error — the sketch's
  *    guarantee is asserted, not assumed.
  *  - q265: per-type OLS trend of event value over days — drift
  *    detection for a metric feed. Closed-form least squares from
  *    five distributive sums (n, Σx, Σx², Σy, Σxy), all exact
  *    integers; slope/intercept come out of sign-split integer
  *    division trees mirrored token-for-token in the oracle (Spark's
  *    `div` truncates toward zero while DuckDB's `//` floors — they
  *    agree only on nonnegative operands, so every potentially
  *    negative numerator is sign-split explicitly).
  *  - q266: median/MAD robust outlier screen (the modified z-score
  *    rule, |0.6745·(x−med)/MAD| > 3.5, kept integer as
  *    6745·dev > 35000·MAD): both order statistics are exact and
  *    histogram-first — the corpus collapses to (type, value) counts
  *    once, the deviation histogram derives from the SAME counts, and
  *    every window runs over distinct values per type, never rows.
  *    Complements q256 (winsorized moments): MAD survives the >25%
  *    contamination that moves a winsorized mean.
  *  - q267: simplified (centroid-based) silhouette per k-means
  *    cluster — the cluster-quality audit for the q106 trainer.
  *    Full silhouette is O(n²); the centroid form (a = distance to
  *    own centroid, b = distance to best other) is one scan against
  *    plan-time literals and is the standard scale substitute. With
  *    argmax assignment a ≤ b always, so s = 1 − a/b ∈ [0, 1] —
  *    reported in exact milli via integer division of micro-rounded
  *    cosine distances.
  *  - q268: distinct-n-gram diversity per source (distinct-1/2/3
  *    ratios) — the repetitiveness / templated-content signal used to
  *    audit synthetic or scraped sources. One explode of tagged gram
  *    hashes; the shuffle carries only (source, n, hash64) — never
  *    gram text (house rule).
  *  - q269: leave-one-source-out ablation — for each source, the
  *    corpus-level stats with that source removed (global minus
  *    per-source aggregates: one scan, O(#sources) arithmetic; no
  *    per-source rescan, which is the naive O(S·n) trap).
  *  - q270: native ROLLUP margins (lang × source token mass with
  *    grouping_id) — Catalyst's Expand-based grouping sets, not a
  *    hand-built union of aggregations; the oracle replays with
  *    DuckDB's ROLLUP + GROUPING (same bitmask convention, verified).
  *  - q271: character-class mix per language (alpha/digit/space/other
  *    mass) — the script-consistency audit against the declared lang
  *    tag; four codegen'd regexp strips in one scan, O(#langs) rows
  *    out.
  *
  * Integer rules as established: micro/milli quantization BEFORE any
  * cross-engine aggregate; `div`/`//` trees mirrored token-for-token
  * with nonnegative operands (or explicitly sign-split); every
  * ranking totally ordered.
  */
object PipelineQueries31 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** DuckDB fragment: positional k-gram hashes over a `toks` column
    * (lockstep with TextAnalysis.gramHashesPositional — q108's copy).
    */
  private def gramHashSql(k: Int): String = {
    val cat = (0 until k).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len(toks) >= $k THEN
       |  list_transform(generate_series(1, len(toks) - ${k - 1}),
       |    i -> ${hashSql(s"($cat)")})
       |ELSE [] END""".stripMargin
  }

  // ---- vector fragments (lockstep with PipelineQueries6's copies) ----
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)
  private def cellsSql(centroids: Array[Array[Double]]): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
  }

  /** q267's late-bound oracle: final-round centroid literals. */
  private object SilOracle { @volatile var sql: Option[String] = None }

  /** The log-bucket key of a micro-value vm ≥ 1: exponent
    * e = floor(log2(vm)) (via the bit length of the integer — no
    * libm, exactly replayable as length(bin(vm))-1 in both engines)
    * and the top-4-bits-after-the-leading-bit sub-bucket. vm ≤ 0
    * collapses to the (-1, 0) underflow bucket. Shared by q264 and
    * the StreamLogQuantile twin (whose Scala kernel mirrors this
    * arithmetic bit-for-bit).
    */
  private val bucketESql =
    "CASE WHEN vm >= 1 THEN length(bin(vm)) - 1 ELSE -1 END"
  private val bucketSbSql =
    "CASE WHEN vm >= 1 THEN (vm >> greatest(e - 4, 0)) & 15 ELSE 0 END"
  // bucket representative: exact value below 2^4 (each sub-bucket is a
  // single integer there); midpoint of [lo, lo + 2^(e-4)) above
  private val bucketRepSql =
    """CASE WHEN e < 0 THEN 0 WHEN e < 4 THEN sb
      |  ELSE ((16 + sb) << (e - 4)) + ((1 << (e - 4)) - 1) // 2
      |END""".stripMargin
  private val bucketRepSpark =
    """CASE WHEN e < 0 THEN 0L WHEN e < 4 THEN sb
      |  ELSE shiftleft(16 + sb, cast(e - 4 as int))
      |    + (shiftleft(1L, cast(e - 4 as int)) - 1) div 2
      |END""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Mergeable log-bucket quantile sketch vs exact, per event type.
    // ONE (type, vm) histogram is the base for both sides: the exact
    // fence pass (q256's shape — cumulative window over distinct
    // values) and the sketch, which further collapses vm to (e, sb)
    // — at most 16 sub-buckets × 64 exponents of state however many
    // values exist. At 100 TB only the sketch side survives (the
    // exact side is this query's audit); its state is a map-side
    // combined long-sum, mergeable across shards/streams by plain
    // addition. Estimates use the bucket midpoint; measured relative
    // error is reported in micro and bounded by the 4-bit geometry
    // (≤ ~2^-5 + quantization), which Pipeline31Spec pins.
    QDef("q264_logbucket_quantiles",
      (s, dir) => {
        val hist = Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("event_type", "vm").agg(count(lit(1)).as("c"))
          .localCheckpoint() // exact pass + sketch derive share it
        val n = hist.groupBy("event_type").agg(sum("c").as("n"))
        val we = Window.partitionBy("event_type").orderBy("vm")
          .rowsBetween(Window.unboundedPreceding, 0)
        def exact(p: Int, out: String) =
          min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
            col("vm"))).as(out)
        val ex = hist.withColumn("cum", sum("c").over(we))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(exact(50, "p50_exact_micro"), exact(95, "p95_exact_micro"),
            exact(99, "p99_exact_micro"))
        val sk = hist
          .withColumn("e",
            expr("CASE WHEN vm >= 1 THEN length(bin(vm)) - 1 ELSE -1 END")
              .cast("long"))
          .withColumn("sb", expr("CASE WHEN vm >= 1 THEN " +
            "shiftright(vm, cast(greatest(e - 4, 0L) as int)) & 15 " +
            "ELSE 0L END"))
          .groupBy("event_type", "e", "sb").agg(sum("c").as("c"))
          .withColumn("rep", expr(bucketRepSpark))
        val ws = Window.partitionBy("event_type").orderBy("e", "sb")
          .rowsBetween(Window.unboundedPreceding, 0)
        def est(p: Int, out: String) =
          min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
            col("rep"))).as(out)
        val es = sk.withColumn("cum", sum("c").over(ws))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(max("n").as("n"), count(lit(1)).as("n_buckets"),
            est(50, "p50_est_micro"), est(95, "p95_est_micro"),
            est(99, "p99_est_micro"))
        def rel(p: Int) = expr(
          s"(1000000 * abs(p${p}_est_micro - p${p}_exact_micro)) " +
            s"div greatest(p${p}_exact_micro, 1L)")
          .as(s"p${p}_relerr_micro")
        es.join(ex, "event_type")
          .select(col("event_type"), col("n"), col("n_buckets"),
            col("p50_est_micro"), col("p50_exact_micro"), rel(50),
            col("p95_est_micro"), col("p95_exact_micro"), rel(95),
            col("p99_est_micro"), col("p99_exact_micro"), rel(99))
      },
      Some(s"""WITH h AS (SELECT event_type,
              |    CAST(floor(1000000.0 * value) AS BIGINT) AS vm,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM events GROUP BY 1, 2),
              |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
              |  FROM h GROUP BY 1),
              |ec AS (SELECT event_type, vm, c,
              |    sum(c) OVER (PARTITION BY event_type ORDER BY vm) AS cum
              |  FROM h),
              |ex AS (SELECT event_type,
              |    min(CASE WHEN cum >= (50*n + 99) // 100 THEN vm END)
              |      AS p50_exact_micro,
              |    min(CASE WHEN cum >= (95*n + 99) // 100 THEN vm END)
              |      AS p95_exact_micro,
              |    min(CASE WHEN cum >= (99*n + 99) // 100 THEN vm END)
              |      AS p99_exact_micro
              |  FROM ec JOIN n USING (event_type) GROUP BY event_type),
              |b0 AS (SELECT event_type, c, vm, $bucketESql AS e FROM h),
              |b1 AS (SELECT event_type, e, $bucketSbSql AS sb, c FROM b0),
              |sk AS (SELECT event_type, e, sb,
              |    CAST(sum(c) AS BIGINT) AS c FROM b1 GROUP BY 1, 2, 3),
              |r AS (SELECT event_type, e, sb, c, $bucketRepSql AS rep,
              |    sum(c) OVER (PARTITION BY event_type ORDER BY e, sb)
              |      AS cum
              |  FROM sk),
              |es AS (SELECT event_type, CAST(max(n) AS BIGINT) AS n,
              |    CAST(count(*) AS BIGINT) AS n_buckets,
              |    min(CASE WHEN cum >= (50*n + 99) // 100 THEN rep END)
              |      AS p50_est_micro,
              |    min(CASE WHEN cum >= (95*n + 99) // 100 THEN rep END)
              |      AS p95_est_micro,
              |    min(CASE WHEN cum >= (99*n + 99) // 100 THEN rep END)
              |      AS p99_est_micro
              |  FROM r JOIN n USING (event_type) GROUP BY event_type)
              |SELECT es.event_type, n, n_buckets,
              |  CAST(p50_est_micro AS BIGINT) AS p50_est_micro,
              |  CAST(p50_exact_micro AS BIGINT) AS p50_exact_micro,
              |  CAST((1000000 * abs(p50_est_micro - p50_exact_micro))
              |    // greatest(p50_exact_micro, 1) AS BIGINT)
              |    AS p50_relerr_micro,
              |  CAST(p95_est_micro AS BIGINT) AS p95_est_micro,
              |  CAST(p95_exact_micro AS BIGINT) AS p95_exact_micro,
              |  CAST((1000000 * abs(p95_est_micro - p95_exact_micro))
              |    // greatest(p95_exact_micro, 1) AS BIGINT)
              |    AS p95_relerr_micro,
              |  CAST(p99_est_micro AS BIGINT) AS p99_est_micro,
              |  CAST(p99_exact_micro AS BIGINT) AS p99_exact_micro,
              |  CAST((1000000 * abs(p99_est_micro - p99_exact_micro))
              |    // greatest(p99_exact_micro, 1) AS BIGINT)
              |    AS p99_relerr_micro
              |FROM es JOIN ex USING (event_type)""".stripMargin)),

    // Per-type OLS trend of value over days. x is the day offset from
    // the type's own first day (data-independent of the calendar
    // window), y is milli-value; the five sums are one map-side
    // combined aggregation. Magnitude audit at this tier: |num| =
    // |n·Σxy − Σx·Σy| ≤ ~1e14, num·Σx ≤ ~7e18 — inside Long; at a
    // materially larger tier these two products move to DECIMAL(38,0)
    // partials, same tree (the q260 rule). Slope/intercept divisions
    // are sign-split because slopes can be negative and Spark `div`
    // (truncate) and DuckDB `//` (floor) disagree below zero.
    QDef("q265_value_trend_ols",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"),
            expr("unix_micros(ts) div 86400000000").as("xd"),
            floor(col("value") * lit(1000.0)).cast("long").as("ym"))
        val mn = ev.groupBy("event_type").agg(min("xd").as("x0"))
        val agg = ev.join(broadcast(mn), "event_type")
          .select(col("event_type"), (col("xd") - col("x0")).as("x"),
            col("ym"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"),
            sum(expr("x * x")).as("sxx"), sum("ym").as("sy"),
            sum(expr("x * ym")).as("sxy"))
        agg
          .selectExpr("event_type", "n", "sx", "sy",
            "n * sxy - sx * sy AS num",
            "greatest(n * sxx - sx * sx, 1L) AS den")
          .selectExpr("event_type", "n", "sy",
            """CASE WHEN num < 0 THEN -((1000 * -num) div den)
              |  ELSE (1000 * num) div den END AS slope_milli_per_day"""
              .stripMargin,
            """sy - (CASE WHEN num < 0 THEN -((num * -sx) div den)
              |  ELSE (num * sx) div den END) AS icnum""".stripMargin)
          .selectExpr("event_type", "n", "slope_milli_per_day",
            """CASE WHEN icnum < 0 THEN -((-icnum) div n)
              |  ELSE icnum div n END AS intercept_milli""".stripMargin,
            "(1000 * sy) div n AS mean_micro")
      },
      Some("""WITH e AS (SELECT event_type,
             |    epoch_us(ts) // 86400000000 AS xd,
             |    CAST(floor(1000.0 * value) AS BIGINT) AS ym
             |  FROM events),
             |m AS (SELECT event_type, min(xd) AS x0 FROM e GROUP BY 1),
             |a AS (SELECT event_type,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(xd - x0) AS BIGINT) AS sx,
             |    CAST(sum((xd - x0) * (xd - x0)) AS BIGINT) AS sxx,
             |    CAST(sum(ym) AS BIGINT) AS sy,
             |    CAST(sum((xd - x0) * ym) AS BIGINT) AS sxy
             |  FROM e JOIN m USING (event_type) GROUP BY event_type),
             |d AS (SELECT event_type, n, sx, sy,
             |    n * sxy - sx * sy AS num,
             |    greatest(n * sxx - sx * sx, 1) AS den FROM a),
             |i AS (SELECT event_type, n, sy,
             |    CASE WHEN num < 0 THEN -((1000 * -num) // den)
             |      ELSE (1000 * num) // den END AS slope_milli_per_day,
             |    sy - (CASE WHEN num < 0 THEN -((num * -sx) // den)
             |      ELSE (num * sx) // den END) AS icnum FROM d)
             |SELECT event_type, n,
             |  CAST(slope_milli_per_day AS BIGINT) AS slope_milli_per_day,
             |  CAST(CASE WHEN icnum < 0 THEN -((-icnum) // n)
             |    ELSE icnum // n END AS BIGINT) AS intercept_milli,
             |  CAST((1000 * sy) // n AS BIGINT) AS mean_micro
             |FROM i""".stripMargin)),

    // Median/MAD outlier screen, fully histogram-first: the (type, vm)
    // counts collapse once; the deviation histogram REUSES those
    // counts (groupBy dev sums c — never a second corpus scan); both
    // medians are the exact lower order statistic via cumulative
    // windows over distinct values. MAD == 0 (>50% of a type at one
    // value) degenerates the z-rule; the standard fallback — any
    // nonzero deviation flags — is applied identically in both
    // engines.
    QDef("q266_mad_outliers",
      (s, dir) => {
        val hist = Tables.events(s, dir)
          .select(col("event_type"),
            floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
          .groupBy("event_type", "vm").agg(count(lit(1)).as("c"))
          .localCheckpoint() // median pass + dev pass + flag pass
        val n = hist.groupBy("event_type").agg(sum("c").as("n"))
        val wv = Window.partitionBy("event_type").orderBy("vm")
          .rowsBetween(Window.unboundedPreceding, 0)
        val med = hist.withColumn("cum", sum("c").over(wv))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(min(when(col("cum") >= expr("(50 * n + 99) div 100"),
            col("vm"))).as("med"))
        val dev = hist.join(broadcast(med), "event_type")
          .select(col("event_type"), abs(col("vm") - col("med")).as("dev"),
            col("c"))
          .groupBy("event_type", "dev").agg(sum("c").as("c"))
        val wd = Window.partitionBy("event_type").orderBy("dev")
          .rowsBetween(Window.unboundedPreceding, 0)
        val mad = dev.withColumn("cum", sum("c").over(wd))
          .join(broadcast(n), "event_type")
          .groupBy("event_type")
          .agg(min(when(col("cum") >= expr("(50 * n + 99) div 100"),
            col("dev"))).as("mad"))
        hist.join(broadcast(med.join(mad, "event_type")), "event_type")
          .select(col("event_type"), col("med"), col("mad"), col("c"),
            abs(col("vm") - col("med")).as("dev"))
          .withColumn("out", when(col("mad") === 0, col("dev") > 0)
            .otherwise(expr("6745 * dev > 35000 * mad")))
          .groupBy("event_type")
          .agg(sum("c").as("n"), max("med").as("med_micro"),
            max("mad").as("mad_micro"),
            sum(when(col("out"), col("c")).otherwise(lit(0L)))
              .as("n_outliers"),
            max("dev").as("max_dev_micro"))
      },
      Some("""WITH h AS (SELECT event_type,
             |    CAST(floor(1000000.0 * value) AS BIGINT) AS vm,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |n AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n
             |  FROM h GROUP BY 1),
             |cc AS (SELECT event_type, vm, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY vm) AS cum
             |  FROM h),
             |md AS (SELECT event_type,
             |    min(CASE WHEN cum >= (50*n + 99) // 100 THEN vm END)
             |      AS med
             |  FROM cc JOIN n USING (event_type) GROUP BY event_type),
             |dv AS (SELECT h.event_type, abs(vm - med) AS dev,
             |    CAST(sum(c) AS BIGINT) AS c
             |  FROM h JOIN md ON h.event_type = md.event_type
             |  GROUP BY 1, 2),
             |dc AS (SELECT event_type, dev, c,
             |    sum(c) OVER (PARTITION BY event_type ORDER BY dev) AS cum
             |  FROM dv),
             |ma AS (SELECT event_type,
             |    min(CASE WHEN cum >= (50*n + 99) // 100 THEN dev END)
             |      AS mad
             |  FROM dc JOIN n USING (event_type) GROUP BY event_type)
             |SELECT h.event_type, CAST(sum(c) AS BIGINT) AS n,
             |  CAST(max(med) AS BIGINT) AS med_micro,
             |  CAST(max(mad) AS BIGINT) AS mad_micro,
             |  CAST(sum(CASE WHEN (CASE WHEN mad = 0
             |      THEN abs(vm - med) > 0
             |      ELSE 6745 * abs(vm - med) > 35000 * mad END)
             |    THEN c ELSE 0 END) AS BIGINT) AS n_outliers,
             |  CAST(max(abs(vm - med)) AS BIGINT) AS max_dev_micro
             |FROM h JOIN md USING (event_type) JOIN ma USING (event_type)
             |GROUP BY h.event_type""".stripMargin)),

    // Simplified silhouette per cluster over the q106-style trained
    // centroids (same seeds/rounds — the audit grades THAT model).
    // One scan against plan-time centroid literals: own/best-other
    // cosine distances micro-rounded, s = 1 − a/b in exact milli
    // (a ≤ b under argmax assignment, so s ∈ [0, 1000]). Oracle is
    // late-bound on the final centroids, q106's KmOracle pattern.
    QDef("q267_cluster_silhouette",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val init = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 256, seed = 77),
          k = 8, iters = 0, seed = 77)
        val cents = lloydRoundsDistributed(emb, "vec_id", "embedding",
          init, rounds = 3)
        SilOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
             |a AS (SELECT vec_id,
             |        list_reverse_sort(${cellsSql(cents)}) AS cs
             |      FROM e),
             |b AS (SELECT cs[1].cell AS cell,
             |    1000000 - CAST(round(cs[1].sim * 1000000) AS BIGINT)
             |      AS ad,
             |    1000000 - CAST(round(cs[2].sim * 1000000) AS BIGINT)
             |      AS bd
             |  FROM a),
             |d AS (SELECT cell, CASE WHEN bd <= 0 THEN 0
             |    ELSE 1000 - (1000 * ad) // bd END AS sm FROM b)
             |SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(CAST(sum(sm) AS BIGINT) // count(*) AS BIGINT)
             |    AS mean_sil_milli,
             |  CAST(min(sm) AS BIGINT) AS min_sil_milli
             |FROM d GROUP BY cell""".stripMargin)
        val cells = cents.zipWithIndex.map { case (c, i) =>
          struct(cosine(col("v"), typedLit(c.toSeq)).as("sim"),
            lit(i).as("cell"))
        }
        emb.select(toDouble(col("embedding")).as("v"))
          .select(reverse(array_sort(array(cells: _*))).as("cs"))
          .select(element_at(col("cs"), 1).getField("cell").as("cell"),
            (lit(1000000L) - round(element_at(col("cs"), 1)
              .getField("sim") * lit(1000000.0), 0).cast("long")).as("ad"),
            (lit(1000000L) - round(element_at(col("cs"), 2)
              .getField("sim") * lit(1000000.0), 0).cast("long")).as("bd"))
          .selectExpr("cell",
            """CASE WHEN bd <= 0 THEN 0L
              |  ELSE 1000 - (1000 * ad) div bd END AS sm""".stripMargin)
          .groupBy("cell")
          .agg(count(lit(1)).as("n_vecs"), sum("sm").as("ssm"),
            min("sm").as("min_sil_milli"))
          .selectExpr("cell", "n_vecs",
            "ssm div n_vecs AS mean_sil_milli", "min_sil_milli")
          .select(col("cell"), col("n_vecs"), col("mean_sil_milli"),
            col("min_sil_milli"))
      },
      None,
      Some(() => SilOracle.sql)),

    // Distinct-n-gram diversity per source, flattened per the r12
    // verdict (#3 — the old single tagged explode fed 3n rows into a
    // mixed count/count-distinct agg, whose Expand rewrite doubled
    // them again; 7.0× at sf1). Two independent corpus passes, both
    // strictly cheaper:
    //  - TOTALS are pure arithmetic: an L-token doc has exactly
    //    max(L-k+1, 0) order-k grams — no hashing, no explode, one
    //    map-side agg on (source, L).
    //  - UNIQUES dedup per doc FIRST (array_distinct — within-doc
    //    1-gram repeats are the heavy mass), then one tagged explode
    //    of the deduped arrays into a single-distinct agg (plain
    //    two-stage rewrite, no Expand); the shuffle carries
    //    (source, n, hash) partials only.
    // Sources whose docs have no tokens drop out (tot1 > 0), matching
    // the explode semantics the oracle replays.
    QDef("q268_ngram_diversity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val tots = docs
          .select(col("source"),
            size(tokens(col("text"))).cast("long").as("len"))
          .groupBy("source")
          .agg(sum(col("len")).as("tot1"),
            sum(greatest(col("len") - 1, lit(0L))).as("tot2"),
            sum(greatest(col("len") - 2, lit(0L))).as("tot3"))
          .filter(col("tot1") > 0)
        def tagged(k: Int) = transform(
          array_distinct(gramHashesPositional(col("toks"), k)),
          h => struct(lit(k).as("n"), h.as("h")))
        val uq = docs
          .select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"), explode(concat(tagged(1), tagged(2),
            tagged(3))).as("g"))
          .select(col("source"), col("g.n").as("n"), col("g.h").as("h"))
          .groupBy("source", "n")
          .agg(count_distinct(col("h")).as("uq"))
          .groupBy("source")
          .agg(coalesce(max(when(col("n") === 1, col("uq"))), lit(0L))
              .as("u1"),
            coalesce(max(when(col("n") === 2, col("uq"))), lit(0L))
              .as("u2"),
            coalesce(max(when(col("n") === 3, col("uq"))), lit(0L))
              .as("u3"))
        tots.join(uq, Seq("source"), "left")
          .selectExpr("source", "tot1", "tot2", "tot3",
            "(1000000 * coalesce(u1, 0L)) div greatest(tot1, 1L)" +
              " AS uniq1_micro",
            "(1000000 * coalesce(u2, 0L)) div greatest(tot2, 1L)" +
              " AS uniq2_micro",
            "(1000000 * coalesce(u3, 0L)) div greatest(tot3, 1L)" +
              " AS uniq3_micro")
      },
      Some(s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
              |g AS (
              |  SELECT source, 1 AS n, unnest(${gramHashSql(1)}) AS h
              |  FROM t
              |  UNION ALL
              |  SELECT source, 2 AS n, unnest(${gramHashSql(2)}) AS h
              |  FROM t
              |  UNION ALL
              |  SELECT source, 3 AS n, unnest(${gramHashSql(3)}) AS h
              |  FROM t),
              |p AS (SELECT source, n, CAST(count(*) AS BIGINT) AS tot,
              |    CAST(count(DISTINCT h) AS BIGINT) AS uq
              |  FROM g GROUP BY 1, 2),
              |w AS (SELECT source,
              |    coalesce(max(CASE WHEN n = 1 THEN tot END), 0) AS tot1,
              |    coalesce(max(CASE WHEN n = 2 THEN tot END), 0) AS tot2,
              |    coalesce(max(CASE WHEN n = 3 THEN tot END), 0) AS tot3,
              |    coalesce(max(CASE WHEN n = 1 THEN uq END), 0) AS u1,
              |    coalesce(max(CASE WHEN n = 2 THEN uq END), 0) AS u2,
              |    coalesce(max(CASE WHEN n = 3 THEN uq END), 0) AS u3
              |  FROM p GROUP BY source)
              |SELECT source, CAST(tot1 AS BIGINT) AS tot1,
              |  CAST(tot2 AS BIGINT) AS tot2,
              |  CAST(tot3 AS BIGINT) AS tot3,
              |  CAST((1000000 * u1) // greatest(tot1, 1) AS BIGINT)
              |    AS uniq1_micro,
              |  CAST((1000000 * u2) // greatest(tot2, 1) AS BIGINT)
              |    AS uniq2_micro,
              |  CAST((1000000 * u3) // greatest(tot3, 1) AS BIGINT)
              |    AS uniq3_micro
              |FROM w""".stripMargin)),

    // Leave-one-source-out ablation: global aggregates minus per-source
    // aggregates — one corpus scan, O(#sources) arithmetic after it.
    // The naive form (re-aggregate the corpus once per source) is
    // O(S·n) and is exactly what this shape exists to avoid.
    QDef("q269_loso_ablation",
      (s, dir) => {
        val per = Tables.documents(s, dir)
          .select(col("source"),
            size(tokens(col("text"))).cast("long").as("tk"))
          .groupBy("source")
          .agg(count(lit(1)).as("sd"), sum("tk").as("st"))
        val tot = per.agg(sum("sd").as("gd"), sum("st").as("gt"))
        per.crossJoin(broadcast(tot))
          .selectExpr("source", "sd AS removed_docs",
            "st AS removed_toks",
            "(1000000 * st) div greatest(gt, 1L) AS removed_share_micro",
            "(1000 * (gt - st)) div greatest(gd - sd, 1L)" +
              " AS rem_mean_toks_milli",
            "(1000 * (gt - st)) div greatest(gd - sd, 1L)" +
              " - (1000 * gt) div greatest(gd, 1L)" +
              " AS delta_mean_toks_milli")
      },
      Some(s"""WITH p AS (SELECT source,
              |    CAST(count(*) AS BIGINT) AS sd,
              |    CAST(sum(len($toksSql)) AS BIGINT) AS st
              |  FROM documents GROUP BY source),
              |t AS (SELECT CAST(sum(sd) AS BIGINT) AS gd,
              |    CAST(sum(st) AS BIGINT) AS gt FROM p)
              |SELECT source, sd AS removed_docs, st AS removed_toks,
              |  CAST((1000000 * st) // greatest(gt, 1) AS BIGINT)
              |    AS removed_share_micro,
              |  CAST((1000 * (gt - st)) // greatest(gd - sd, 1)
              |    AS BIGINT) AS rem_mean_toks_milli,
              |  CAST((1000 * (gt - st)) // greatest(gd - sd, 1)
              |    - (1000 * gt) // greatest(gd, 1) AS BIGINT)
              |    AS delta_mean_toks_milli
              |FROM p CROSS JOIN t""".stripMargin)),

    // Native ROLLUP margins with grouping_id — Catalyst's Expand-based
    // grouping sets (ONE pass over the corpus produces all three
    // grouping levels), not a hand-built union of three aggregations.
    // DuckDB's GROUPING(lang, source) uses the same bitmask convention
    // as Spark's grouping_id (verified: both-aggregated = 3).
    QDef("q270_rollup_margins",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), col("source"),
          size(tokens(col("text"))).cast("long").as("tk"))
        .rollup("lang", "source")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n_docs"),
          sum("tk").as("tok_mass"))
        .select(coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("gid").cast("long").as("gid"), col("n_docs"),
          col("tok_mass")),
      Some(s"""SELECT coalesce(lang, 'ALL') AS lang,
              |  coalesce(source, 'ALL') AS source,
              |  CAST(grouping(lang, source) AS BIGINT) AS gid,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(len($toksSql)) AS BIGINT) AS tok_mass
              |FROM documents
              |GROUP BY ROLLUP(lang, source)""".stripMargin)),

    // Character-class mix per language: alpha/digit/space/other mass
    // shares in milli — the script-consistency audit against the
    // declared lang tag. Four codegen'd regexp strips in one scan;
    // output is O(#langs). (q160 measures char ENTROPY, q74 gates
    // per-doc ratios; this is the corpus-level class profile.)
    QDef("q271_script_mix",
      (s, dir) => Tables.documents(s, dir)
        .select(col("lang"), length(col("text")).cast("long").as("nc"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[A-Za-z]", "")))
            .cast("long").as("al"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[0-9]", "")))
            .cast("long").as("dg"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[ ]", "")))
            .cast("long").as("sp"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("nc").as("chars"),
          sum("al").as("alpha"), sum("dg").as("digit"),
          sum("sp").as("space"))
        .selectExpr("lang", "n_docs", "chars",
          "(1000 * alpha) div greatest(chars, 1L) AS alpha_milli",
          "(1000 * digit) div greatest(chars, 1L) AS digit_milli",
          "(1000 * space) div greatest(chars, 1L) AS space_milli",
          "(1000 * (chars - alpha - digit - space))" +
            " div greatest(chars, 1L) AS other_milli"),
      Some("""WITH c AS (SELECT lang,
             |    CAST(length(text) AS BIGINT) AS nc,
             |    CAST(length(text) - length(
             |      regexp_replace(text, '[A-Za-z]', '', 'g'))
             |      AS BIGINT) AS al,
             |    CAST(length(text) - length(
             |      regexp_replace(text, '[0-9]', '', 'g'))
             |      AS BIGINT) AS dg,
             |    CAST(length(text) - length(
             |      regexp_replace(text, '[ ]', '', 'g'))
             |      AS BIGINT) AS sp
             |  FROM documents),
             |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(nc) AS BIGINT) AS chars,
             |    CAST(sum(al) AS BIGINT) AS alpha,
             |    CAST(sum(dg) AS BIGINT) AS digit,
             |    CAST(sum(sp) AS BIGINT) AS space
             |  FROM c GROUP BY lang)
             |SELECT lang, n_docs, chars,
             |  CAST((1000 * alpha) // greatest(chars, 1) AS BIGINT)
             |    AS alpha_milli,
             |  CAST((1000 * digit) // greatest(chars, 1) AS BIGINT)
             |    AS digit_milli,
             |  CAST((1000 * space) // greatest(chars, 1) AS BIGINT)
             |    AS space_milli,
             |  CAST((1000 * (chars - alpha - digit - space))
             |    // greatest(chars, 1) AS BIGINT) AS other_milli
             |FROM a""".stripMargin))
  )
}
