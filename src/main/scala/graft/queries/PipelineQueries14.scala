package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

/** Fourteenth pipeline group — classifier-evaluation operators:
  *
  *  - q172: language-ID confusion matrix — q23's n-gram-marker
  *    predictions against the corpus's labeled `lang` column, with
  *    per-true-label recall. The eval table for ANY cheap classifier
  *    used as a corpus filter; a label whose recall collapses is a
  *    language the filter would silently delete.
  *  - q173: inter-filter agreement (Cohen's kappa) between two
  *    independent quality screens — q74's heuristic gate and q148's
  *    Gopher repetition gate. Raw agreement flatters filters that
  *    both say "keep" to everything; kappa subtracts chance, and the
  *    whole statistic reduces to one exact integer expression over
  *    the 2×2 contingency counts.
  *
  * Both collapse the corpus in one aggregation; everything after runs
  * on O(|labels|²) or O(1) rows.
  */
object PipelineQueries14 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private val enMarkersSql =
    "('the','a','of','and','to','in','is','it','that','for')"

  /** Exact FLOOR division for possibly-negative numerators (the shared
    * canonical-remainder idiom) — kappa can be negative, and Spark's
    * `div` truncates while the floor form is engine-identical.
    */
  private def fdivSql(s: String, n: String): String =
    s"(($s) - ((($s) % ($n)) + ($n)) % ($n)) // ($n)"

  val defs: Seq[QDef] = Seq(

    // Lang-ID confusion: (true lang, predicted) counts with each
    // cell's share of its true-label row in milli — the confusion-ROW
    // distribution (per-label recall reads off the matching cell).
    // One corpus aggregation; the row totals broadcast back to
    // |L|·|P| cells. The predictor is exactly q23's marker-ratio rule
    // (same 6-decimal rounding before the threshold).
    QDef("q172_lang_confusion",
      (s, dir) => {
        val m = Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
          .select(col("lang"),
            when(round(wordSetRatio(col("toks"), EnglishMarkers), 6)
              > 0.05, lit("en")).otherwise(lit("und")).as("predicted"))
          .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
        val tot = m.groupBy("lang").agg(sum("n").as("n_lang"))
        m.join(broadcast(tot), "lang")
          .select(col("lang"), col("predicted"), col("n"),
            expr("(1000 * n) div n_lang").as("row_milli"))
      },
      Some(s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
              |p AS (SELECT lang,
              |    CASE WHEN round(len(list_filter(toks, x -> x IN
              |      $enMarkersSql))::DOUBLE / len(toks), 6) > 0.05
              |      THEN 'en' ELSE 'und' END AS predicted
              |  FROM t),
              |c AS (SELECT lang, predicted, count(*) AS n
              |  FROM p GROUP BY 1, 2),
              |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
              |  FROM c GROUP BY 1)
              |SELECT lang, predicted, CAST(n AS BIGINT) AS n,
              |  CAST((1000 * n) // n_lang AS BIGINT) AS row_milli
              |FROM c JOIN r USING (lang)""".stripMargin)),

    // Inter-filter kappa: A = q74's heuristic pass, B = q148's Gopher
    // repetition keep, evaluated per doc in the SAME scan, reduced to
    // the 2×2 table, and kappa in EXACT integer milli:
    //   kappa = (n·agree − pe_num) / (n² − pe_num),
    //   pe_num = na1·nb1 + na0·nb0
    // — no float ever enters. Overflow bound: the numerator carries
    // 1000·n², so n must stay under ~9.6·10⁷ docs; past that, compute
    // kappa on a uniform doc sample (the statistic converges at far
    // smaller n anyway).
    QDef("q173_filter_kappa",
      (s, dir) => {
        // BOTH screens come from graft.ops.QualityGates — the single
        // definition q74/q148/q156 share, so this kappa can never
        // compare against a stale clone of either rule
        val docs = Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
          .localCheckpoint() // the A-scan and B-aggregations share it
        val a = docs.select(col("doc_id"),
          graft.ops.QualityGates.heuristicPass(col("text"), col("n_chars"),
            col("toks")).cast("long").as("a"))
        val b = graft.ops.QualityGates.gopherRepetition(docs)
          .select(col("doc_id"), col("keep").as("b"))
        a.join(b, "doc_id")
          .agg(count(lit(1)).as("n"),
            sum(col("a") * col("b")).as("n11"),
            sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"),
            sum(col("a") * (lit(1L) - col("b"))).as("n10"),
            sum((lit(1L) - col("a")) * col("b")).as("n01"))
          .select(col("n"), col("n11"), col("n00"), col("n10"), col("n01"), {
            val pe = (col("n11") + col("n10")) * (col("n11") + col("n01")) +
              (col("n00") + col("n01")) * (col("n00") + col("n10"))
            val num = lit(1000L) * (col("n") * (col("n11") + col("n00")) - pe)
            // degenerate pe == n² (both filters constant) → 0/0 → 0
            val den = greatest(col("n") * col("n") - pe, lit(1L))
            ((num - ((num % den) + den) % den) / den).cast("long")
              .as("kappa_milli")
          })
      },
      Some(s"""WITH t AS (SELECT doc_id, n_chars, text, $toksSql AS toks
              |  FROM documents),
              |a AS (SELECT doc_id, CASE WHEN
              |    len(toks) >= 5 AND len(toks) <= 100000
              |    AND length(array_to_string(toks, ''))::DOUBLE
              |      / len(toks) >= 2.0
              |    AND length(array_to_string(toks, ''))::DOUBLE
              |      / len(toks) <= 12.0
              |    AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))
              |      ::DOUBLE / n_chars < 0.3
              |    AND length(regexp_replace(text, '[^0-9]', '', 'g'))
              |      ::DOUBLE / n_chars < 0.3
              |    AND len(list_distinct(toks))::DOUBLE / len(toks) > 0.2
              |    THEN 1 ELSE 0 END AS a FROM t),
              |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
              |ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
              |        CAST(max(c) AS BIGINT) AS top1 FROM uc GROUP BY 1),
              |bgr AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
              |        list_transform(generate_series(1, len(toks) - 1),
              |          i -> toks[i] || ' ' || toks[i+1])
              |        ELSE [] END) AS g FROM t),
              |bc AS (SELECT doc_id, g, count(*) AS c FROM bgr GROUP BY 1, 2),
              |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
              |        CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
              |          AS dup2 FROM bc GROUP BY 1),
              |b AS (SELECT ua.doc_id, CASE WHEN
              |    coalesce((1000 * ba.dup2) // ba.n2, 0) <= 200
              |    AND (1000 * ua.top1) // ua.n_tok <= 300
              |    THEN 1 ELSE 0 END AS b
              |  FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id),
              |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(a.a * b.b) AS BIGINT) AS n11,
              |    CAST(sum((1 - a.a) * (1 - b.b)) AS BIGINT) AS n00,
              |    CAST(sum(a.a * (1 - b.b)) AS BIGINT) AS n10,
              |    CAST(sum((1 - a.a) * b.b) AS BIGINT) AS n01
              |  FROM a JOIN b ON a.doc_id = b.doc_id),
              |m2 AS (SELECT *,
              |    (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
              |      AS pe FROM m)
              |SELECT n, n11, n00, n10, n01,
              |  CAST(${fdivSql("1000 * (n * (n11 + n00) - pe)",
                   "greatest(n * n - pe, 1)")} AS BIGINT) AS kappa_milli
              |FROM m2""".stripMargin))
  )
}
