package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-second pipeline group — two-sample distribution tests and the
  * rank-frequency law, per source:
  *
  *  - q336: Kolmogorov–Smirnov test of each source's length
  *    distribution against the REST of the corpus. D is computed in
  *    exact integers (max |cumS·nR − cumR·nS| over the merged value
  *    domain — no floats until the final micro report), and the α=.05
  *    rejection rule is an integer inequality with the c² constant
  *    embedded as the same micro literal in both engines (the q327
  *    rule), rearranged so nothing exceeds int64 at any corpus size:
  *    (d_micro² div 10⁶) · (nS·nR div (nS+nR)) > c²_micro.
  *  - q337: Mann–Whitney U / common-language effect size (the AUC
  *    between each source and the rest): 2U = 2·Σ_v cntS(v)·cumR(<v)
  *    + Σ_v cntS(v)·cntR(v), exact integers off the same histogram
  *    grid; auc_micro = 2U·10⁶ div (2·nS·nR). No variance/sqrt needed
  *    — the effect size IS the deliverable.
  *  - q338: Zipf rank-frequency fit over the token vocabulary: OLS of
  *    ln(count) on ln(rank) for the top-200 tokens, ln terms quantized
  *    to milli-nats BEFORE the sums (the q108/q113 rule), sign-split
  *    div trees token-for-token with DuckDB (the q265 OLS discipline).
  *
  * Scale: everything reduces to per-source value histograms (O(S·V)
  * grid, S=sources, V=distinct lengths — never corpus-sorted) or a
  * vocabulary top-K; the only corpus passes are one groupBy each.
  */
object PipelineQueries62 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** KS α=.05 critical constant c(α)² = 1.358², in micro — computed
    * once, embedded identically in both engines. */
  private val KsC2Micro = 1844164L

  private val ZipfTop = 200

  val defs: Seq[QDef] = Seq(

    QDef("q336_ks_source_drift",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("source"), col("n_chars"))
          .localCheckpoint() // hist + totals share the scan
        val hist = docs.groupBy("source", "n_chars")
          .agg(count(lit(1)).as("c"))
        val vals = docs.select(col("n_chars")).distinct()
        val srcN = docs.groupBy("source").agg(count(lit(1)).as("ns"))
        val n = docs.agg(count(lit(1)).as("n"))
        val ghist = docs.groupBy("n_chars").agg(count(lit(1)).as("gc"))
        val gcum = vals.join(ghist, Seq("n_chars"), "left")
          .select(col("n_chars"), coalesce(col("gc"), lit(0L)).as("gc"))
          .withColumn("gcum", sum("gc").over(Window.orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        // grid: sources × merged value domain (O(S·V), bounded)
        val grid = srcN.crossJoin(vals)
          .join(hist, Seq("source", "n_chars"), "left")
          .select(col("source"), col("ns"), col("n_chars"),
            coalesce(col("c"), lit(0L)).as("c"))
          .withColumn("cums", sum("c").over(
            Window.partitionBy("source").orderBy("n_chars")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        grid.join(gcum.select(col("n_chars"), col("gcum")), "n_chars")
          .crossJoin(broadcast(n))
          .select(col("source"), col("ns"), (col("n") - col("ns")).as("nr"),
            abs(col("cums") * (col("n") - col("ns")) -
              (col("gcum") - col("cums")) * col("ns")).as("ds"))
          .groupBy("source", "ns", "nr")
          .agg(max("ds").as("d_scaled"))
          .select(col("source"), col("ns").as("n_src"),
            col("nr").as("n_rest"),
            expr("d_scaled * 1000000L div (ns * nr)").as("d_micro"))
          .withColumn("reject",
            expr(s"(d_micro * d_micro div 1000000L) * " +
              s"(n_src * n_rest div (n_src + n_rest)) > $KsC2Micro"))
      },
      Some(s"""WITH d AS (SELECT source, n_chars FROM documents),
              |h AS (SELECT source, n_chars, CAST(count(*) AS BIGINT)
              |    AS c FROM d GROUP BY 1, 2),
              |v AS (SELECT DISTINCT n_chars FROM d),
              |sn AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
              |  FROM d GROUP BY 1),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
              |gh AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS gc
              |  FROM d GROUP BY 1),
              |gc AS (SELECT v.n_chars,
              |    sum(coalesce(gh.gc, 0)) OVER (ORDER BY v.n_chars)
              |      AS gcum
              |  FROM v LEFT JOIN gh USING (n_chars)),
              |g AS (SELECT sn.source, sn.ns, v.n_chars,
              |    coalesce(h.c, 0) AS c
              |  FROM sn CROSS JOIN v
              |  LEFT JOIN h ON h.source = sn.source
              |    AND h.n_chars = v.n_chars),
              |cs AS (SELECT source, ns, n_chars,
              |    sum(c) OVER (PARTITION BY source ORDER BY n_chars)
              |      AS cums
              |  FROM g),
              |ds AS (SELECT cs.source, cs.ns, n.n - cs.ns AS nr,
              |    max(abs(cs.cums * (n.n - cs.ns) -
              |      (gc.gcum - cs.cums) * cs.ns)) AS d_scaled
              |  FROM cs JOIN gc USING (n_chars), n
              |  GROUP BY 1, 2, 3)
              |SELECT source, ns AS n_src, nr AS n_rest,
              |  CAST(d_scaled * 1000000 // (ns * nr) AS BIGINT)
              |    AS d_micro,
              |  CAST(d_scaled * 1000000 // (ns * nr) AS BIGINT) *
              |    CAST(d_scaled * 1000000 // (ns * nr) AS BIGINT)
              |    // 1000000 *
              |    (ns * nr // (ns + nr)) > $KsC2Micro AS reject
              |FROM ds""".stripMargin)),

    QDef("q337_auc_mann_whitney",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("source"), col("n_chars"))
          .localCheckpoint()
        val hist = docs.groupBy("source", "n_chars")
          .agg(count(lit(1)).as("c"))
        val vals = docs.select(col("n_chars")).distinct()
        val srcN = docs.groupBy("source").agg(count(lit(1)).as("ns"))
        val n = docs.agg(count(lit(1)).as("n"))
        val ghist = docs.groupBy("n_chars").agg(count(lit(1)).as("gc"))
        val gcum = vals.join(ghist, Seq("n_chars"), "left")
          .select(col("n_chars"), coalesce(col("gc"), lit(0L)).as("gc"))
          .withColumn("gcum", sum("gc").over(Window.orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val grid = srcN.crossJoin(vals)
          .join(hist, Seq("source", "n_chars"), "left")
          .select(col("source"), col("ns"), col("n_chars"),
            coalesce(col("c"), lit(0L)).as("c"))
          .withColumn("cums", sum("c").over(
            Window.partitionBy("source").orderBy("n_chars")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        grid.join(gcum, "n_chars")
          .crossJoin(broadcast(n))
          .select(col("source"), col("ns"), (col("n") - col("ns")).as("nr"),
            // rest counts at v and strictly-below-v, exact integers
            (col("gc") - col("c")).as("cr"),
            ((col("gcum") - col("cums")) - (col("gc") - col("c")))
              .as("crumBelow"),
            col("c"))
          .groupBy("source", "ns", "nr")
          .agg(sum(col("c") * col("crumBelow") * 2 + col("c") * col("cr"))
            .as("u2"))
          .select(col("source"), col("ns").as("n_src"),
            col("nr").as("n_rest"), col("u2"),
            expr("u2 * 1000000L div (2 * ns * nr)").as("auc_micro"))
      },
      Some("""WITH d AS (SELECT source, n_chars FROM documents),
             |h AS (SELECT source, n_chars, CAST(count(*) AS BIGINT)
             |    AS c FROM d GROUP BY 1, 2),
             |v AS (SELECT DISTINCT n_chars FROM d),
             |sn AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
             |  FROM d GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
             |gh AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS gc
             |  FROM d GROUP BY 1),
             |gc AS (SELECT v.n_chars, gh.gc,
             |    sum(coalesce(gh.gc, 0)) OVER (ORDER BY v.n_chars)
             |      AS gcum
             |  FROM v LEFT JOIN gh USING (n_chars)),
             |g AS (SELECT sn.source, sn.ns, v.n_chars,
             |    coalesce(h.c, 0) AS c
             |  FROM sn CROSS JOIN v
             |  LEFT JOIN h ON h.source = sn.source
             |    AND h.n_chars = v.n_chars),
             |cs AS (SELECT source, ns, n_chars, c,
             |    sum(c) OVER (PARTITION BY source ORDER BY n_chars)
             |      AS cums
             |  FROM g),
             |u AS (SELECT cs.source, cs.ns, n.n - cs.ns AS nr,
             |    sum(cs.c * ((gc.gcum - cs.cums) - (gc.gc - cs.c)) * 2
             |      + cs.c * (gc.gc - cs.c)) AS u2
             |  FROM cs JOIN gc USING (n_chars), n
             |  GROUP BY 1, 2, 3)
             |SELECT source, ns AS n_src, nr AS n_rest,
             |  CAST(u2 AS BIGINT) AS u2,
             |  CAST(u2 * 1000000 // (2 * ns * nr) AS BIGINT)
             |    AS auc_micro
             |FROM u""".stripMargin)),

    QDef("q338_zipf_fit",
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
        // vocabulary top-R by (count desc, token asc) — a bounded
        // TakeOrdered, then the 200-row rank window
        val top = toks
          .orderBy(col("cnt").desc, col("tok").asc)
          .limit(ZipfTop)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cnt").desc, col("tok").asc)))
          // milli-nat quantization BEFORE the sums (q108 rule); milli
          // keeps every OLS product far under int64 at any corpus size
          .select(
            floor(lit(1000.0) * log(col("rank").cast("double")))
              .cast("long").as("x"),
            floor(lit(1000.0) * log(col("cnt").cast("double")))
              .cast("long").as("y"))
        top.agg(count(lit(1)).as("r"), sum("x").as("sx"),
            sum("y").as("sy"), sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .selectExpr("r", "r * sxy - sx * sy AS num",
            "r * sxx - sx * sx AS den", "sx", "sy")
          .selectExpr("r AS n_tokens",
            """CASE WHEN num < 0 THEN -((1000 * -num) div den)
              |  ELSE (1000 * num) div den END AS slope_milli""".stripMargin,
            """sy - (CASE WHEN num < 0 THEN -((num * -sx) div den)
              |  ELSE (num * sx) div den END) AS icnum""".stripMargin)
          .selectExpr("n_tokens", "slope_milli",
            """CASE WHEN icnum < 0 THEN -((-icnum) div n_tokens)
              |  ELSE icnum div n_tokens END AS intercept_milli"""
              .stripMargin)
      },
      Some(s"""WITH t AS (SELECT unnest($toksSql) AS tok
              |  FROM documents),
              |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
              |  FROM t GROUP BY 1),
              |top AS (SELECT cnt, row_number() OVER (
              |    ORDER BY cnt DESC, tok ASC) AS rank
              |  FROM c ORDER BY cnt DESC, tok ASC LIMIT $ZipfTop),
              |q AS (SELECT
              |    CAST(floor(1000.0 * ln(rank::DOUBLE)) AS BIGINT) AS x,
              |    CAST(floor(1000.0 * ln(cnt::DOUBLE)) AS BIGINT) AS y
              |  FROM top),
              |a AS (SELECT CAST(count(*) AS BIGINT) AS r,
              |    CAST(sum(x) AS BIGINT) AS sx,
              |    CAST(sum(y) AS BIGINT) AS sy,
              |    CAST(sum(x * x) AS BIGINT) AS sxx,
              |    CAST(sum(x * y) AS BIGINT) AS sxy
              |  FROM q),
              |f AS (SELECT r, r * sxy - sx * sy AS num,
              |    r * sxx - sx * sx AS den, sx, sy FROM a),
              |g AS (SELECT r AS n_tokens,
              |    CASE WHEN num < 0 THEN -((1000 * -num) // den)
              |      ELSE (1000 * num) // den END AS slope_milli,
              |    sy - (CASE WHEN num < 0 THEN -((num * -sx) // den)
              |      ELSE (num * sx) // den END) AS icnum
              |  FROM f)
              |SELECT n_tokens, slope_milli,
              |  CASE WHEN icnum < 0 THEN -((-icnum) // n_tokens)
              |    ELSE icnum // n_tokens END AS intercept_milli
              |FROM g""".stripMargin))
  )
}
