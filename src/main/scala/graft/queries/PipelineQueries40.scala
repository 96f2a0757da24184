package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fortieth pipeline group — order statistics beyond the plain
  * percentile family:
  *
  *  - q294: token-mass-WEIGHTED length quantiles per lang (log-bucket
  *    sketch, bucket weights instead of counts) next to the
  *    unweighted ones. "Half the documents are shorter than X" and
  *    "half the TOKENS live in documents shorter than Y" are
  *    different planning numbers — mixing/packing budgets need the
  *    second. Same mergeable bucket state; the weighted cumulative
  *    pick is the identical ceil rule over weight sums.
  *  - q295: Spearman rank correlation (doc length vs distinct-token
  *    count per lang) — the monotone-association screen, robust where
  *    Pearson on raw values is leverage-dominated. Average ranks with
  *    exact tie handling via DOUBLED ranks (2·cum − c + 1 — integer
  *    exact, no halves), computed from per-value histograms (windows
  *    over O(distinct values) per lang, never the corpus) and joined
  *    back on (lang, value); the final correlation is five integer
  *    sums + one mirrored sqrt (q146). Complements q189's
  *    Mann-Whitney (two-sample) with paired rank association.
  *  - q296: Pareto skyline per lang on (length, distinct tokens) —
  *    the multi-criteria "best documents" operator. The naive
  *    formulation is an O(n²) dominance join; the scale shape
  *    collapses to per-x maxima (O(distinct lengths) rows per lang),
  *    takes a strictly-after running max over x DESC, and joins the
  *    surviving (x, y) frontier back to the corpus — one corpus
  *    scan, one tiny-frame window, one semi-join-shaped filter.
  */
object PipelineQueries40 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  // log-bucket fragments (lockstep with PipelineQueries31/33's copies)
  private val bucketESql =
    "CASE WHEN vm >= 1 THEN length(bin(vm)) - 1 ELSE -1 END"
  private val bucketSbSql =
    "CASE WHEN vm >= 1 THEN (vm >> greatest(e - 4, 0)) & 15 ELSE 0 END"
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

    QDef("q294_weighted_length_sketch",
      (s, dir) => {
        val buck = Tables.documents(s, dir)
          .select(col("lang"),
            size(tokens(col("text"))).cast("long").as("vm"))
          .withColumn("e",
            expr("CASE WHEN vm >= 1 THEN length(bin(vm)) - 1 ELSE -1 END")
              .cast("long"))
          .withColumn("sb", expr("CASE WHEN vm >= 1 THEN " +
            "shiftright(vm, cast(greatest(e - 4, 0L) as int)) & 15 " +
            "ELSE 0L END"))
          .groupBy("lang", "e", "sb")
          .agg(count(lit(1)).as("c"), sum("vm").as("wc"))
          .withColumn("rep", expr(bucketRepSpark))
          .localCheckpoint() // totals + both cumulative picks
        val tot = buck.groupBy("lang")
          .agg(sum("c").as("n"), sum("wc").as("w"))
        val wd = Window.partitionBy("lang").orderBy("e", "sb")
          .rowsBetween(Window.unboundedPreceding, 0)
        def pick(cumCol: String, p: Int, totCol: String, out: String) =
          min(when(col(cumCol) >=
            expr(s"($p * $totCol + 99) div 100"), col("rep"))).as(out)
        buck
          .withColumn("cumc", sum("c").over(wd))
          .withColumn("cumw", sum("wc").over(wd))
          .join(broadcast(tot), "lang")
          .groupBy("lang")
          .agg(max("n").as("n_docs"), max("w").as("tok_mass"),
            pick("cumc", 50, "n", "p50_est_toks"),
            pick("cumc", 90, "n", "p90_est_toks"),
            pick("cumw", 50, "w", "wp50_est_toks"),
            pick("cumw", 90, "w", "wp90_est_toks"))
      },
      Some(s"""WITH h AS (SELECT lang,
              |    CAST(len($toksSql) AS BIGINT) AS vm FROM documents),
              |b0 AS (SELECT lang, vm, $bucketESql AS e FROM h),
              |b1 AS (SELECT lang, vm, e, $bucketSbSql AS sb FROM b0),
              |bk AS (SELECT lang, e, sb, CAST(count(*) AS BIGINT) AS c,
              |    CAST(sum(vm) AS BIGINT) AS wc
              |  FROM b1 GROUP BY 1, 2, 3),
              |t AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n,
              |    CAST(sum(wc) AS BIGINT) AS w FROM bk GROUP BY 1),
              |r AS (SELECT lang, e, sb, c, wc, $bucketRepSql AS rep,
              |    sum(c) OVER pw AS cumc, sum(wc) OVER pw AS cumw
              |  FROM bk WINDOW pw AS (PARTITION BY lang
              |    ORDER BY e, sb))
              |SELECT r.lang, CAST(max(n) AS BIGINT) AS n_docs,
              |  CAST(max(w) AS BIGINT) AS tok_mass,
              |  CAST(min(CASE WHEN cumc >= (50 * n + 99) // 100
              |    THEN rep END) AS BIGINT) AS p50_est_toks,
              |  CAST(min(CASE WHEN cumc >= (90 * n + 99) // 100
              |    THEN rep END) AS BIGINT) AS p90_est_toks,
              |  CAST(min(CASE WHEN cumw >= (50 * w + 99) // 100
              |    THEN rep END) AS BIGINT) AS wp50_est_toks,
              |  CAST(min(CASE WHEN cumw >= (90 * w + 99) // 100
              |    THEN rep END) AS BIGINT) AS wp90_est_toks
              |FROM r JOIN t USING (lang) GROUP BY r.lang"""
        .stripMargin)),

    QDef("q295_spearman_length_diversity",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("lang"), tokens(col("text")).as("toks"))
          .select(col("lang"), size(col("toks")).cast("long").as("x"),
            size(array_distinct(col("toks"))).cast("long").as("y"))
          .localCheckpoint() // two rank joins + the sum pass
        def ranks(c0: String) = {
          val w = Window.partitionBy("lang").orderBy(c0)
            .rowsBetween(Window.unboundedPreceding, 0)
          base.groupBy("lang", c0).agg(count(lit(1)).as("c"))
            .withColumn("cum", sum("c").over(w))
            // doubled average rank: 2·avg = 2·cum − c + 1 (integer)
            .selectExpr("lang", c0,
              s"2 * cum - c + 1 AS r_$c0")
        }
        val agg = base
          .join(ranks("x"), Seq("lang", "x"))
          .join(ranks("y"), Seq("lang", "y"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("r_x").as("sx"),
            sum("r_y").as("sy"), sum(expr("r_x * r_x")).as("sxx"),
            sum(expr("r_y * r_y")).as("syy"),
            sum(expr("r_x * r_y")).as("sxy"))
        agg.selectExpr("lang", "n",
            "n * sxy - sx * sy AS num",
            "n * sxx - sx * sx AS dx", "n * syy - sy * sy AS dy")
          .selectExpr("lang", "n",
            """CASE WHEN dx <= 0 OR dy <= 0 THEN 0L
              |ELSE CAST(floor((1000.0 * num)
              |  / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
              |  AS BIGINT) END AS spearman_milli""".stripMargin)
      },
      Some(s"""WITH b AS MATERIALIZED (SELECT lang,
              |    CAST(len(toks) AS BIGINT) AS x,
              |    CAST(len(list_distinct(toks)) AS BIGINT) AS y
              |  FROM (SELECT lang, $toksSql AS toks FROM documents)),
              |rx AS (SELECT lang, x, 2 * sum(count(*)) OVER
              |      (PARTITION BY lang ORDER BY x)
              |      - count(*) + 1 AS r_x
              |  FROM b GROUP BY lang, x),
              |ry AS (SELECT lang, y, 2 * sum(count(*)) OVER
              |      (PARTITION BY lang ORDER BY y)
              |      - count(*) + 1 AS r_y
              |  FROM b GROUP BY lang, y),
              |a AS (SELECT b.lang, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(r_x) AS BIGINT) AS sx,
              |    CAST(sum(r_y) AS BIGINT) AS sy,
              |    CAST(sum(r_x * r_x) AS BIGINT) AS sxx,
              |    CAST(sum(r_y * r_y) AS BIGINT) AS syy,
              |    CAST(sum(r_x * r_y) AS BIGINT) AS sxy
              |  FROM b JOIN rx USING (lang, x) JOIN ry USING (lang, y)
              |  GROUP BY b.lang),
              |v AS (SELECT lang, n, n * sxy - sx * sy AS num,
              |    n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy
              |  FROM a)
              |SELECT lang, n,
              |  CASE WHEN dx <= 0 OR dy <= 0 THEN 0
              |    ELSE CAST(floor((1000.0 * num)
              |      / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)))
              |      AS BIGINT) END AS spearman_milli
              |FROM v""".stripMargin)),

    QDef("q296_pareto_skyline",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("lang"), col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("lang"), col("doc_id"),
            size(col("toks")).cast("long").as("x"),
            size(array_distinct(col("toks"))).cast("long").as("y"))
          .localCheckpoint() // frontier derivation + the final join
        val perX = base.groupBy("lang", "x").agg(max("y").as("ymax"))
        val wAfter = Window.partitionBy("lang").orderBy(col("x").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = perX
          .withColumn("after", max("ymax").over(wAfter))
          .filter(col("after").isNull || col("ymax") > col("after"))
          .select(col("lang"), col("x"), col("ymax").as("y"))
        base.join(frontier, Seq("lang", "x", "y"))
          .select(col("lang"), col("doc_id"), col("x").as("n_toks"),
            col("y").as("n_distinct"))
      },
      Some(s"""WITH b AS MATERIALIZED (SELECT lang, doc_id,
              |    CAST(len(toks) AS BIGINT) AS x,
              |    CAST(len(list_distinct(toks)) AS BIGINT) AS y
              |  FROM (SELECT lang, doc_id, $toksSql AS toks
              |        FROM documents)),
              |px AS (SELECT lang, x, max(y) AS ymax FROM b
              |  GROUP BY 1, 2),
              |f AS (SELECT lang, x, ymax AS y FROM (
              |    SELECT lang, x, ymax,
              |      max(ymax) OVER (PARTITION BY lang ORDER BY x DESC
              |        ROWS BETWEEN UNBOUNDED PRECEDING
              |        AND 1 PRECEDING) AS aft
              |    FROM px)
              |  WHERE aft IS NULL OR ymax > aft)
              |SELECT b.lang, doc_id, x AS n_toks, y AS n_distinct
              |FROM b JOIN f USING (lang, x, y)""".stripMargin))
  )
}
