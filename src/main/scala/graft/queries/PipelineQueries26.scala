package graft.queries

import graft.Tables
import graft.functions.TextAnalysis.tokens
import org.apache.spark.sql.functions._

/** Twenty-sixth pipeline group — dataset governance audits:
  *
  *  - q224: readability grade per source via the FORCAST formula
  *    (grade = 20 − monosyllables-per-150-words / 10), the classic
  *    readability measure that needs NO sentence boundaries — the
  *    right variant for boilerplate-stripped / punctuation-free
  *    training text. Syllables are vowel groups (`[aeiou]+`), a
  *    heuristic both regex engines evaluate identically; all
  *    arithmetic is integer milli-grades so the cross-engine hash is
  *    exact. Plan: one token explode with map-side partial
  *    aggregation to per-doc rows, then a per-source rollup — the
  *    q104 two-level shape.
  *  - q225: column completeness/cardinality profile of `documents` —
  *    per column: null count, EXACT distinct count, min/max (as
  *    strings, binary collation in both engines). One corpus pass;
  *    the multi-distinct aggregation plans as one Expand (×5 rows
  *    map-side, combined before the single exchange). At 100 TB the
  *    same query swaps `count_distinct` for HLL (q111) — the exact
  *    form is the oracle-checkable contract.
  *  - q226: k-anonymity risk audit over the quasi-identifier
  *    (lang, source, n_chars div 100): for k ∈ {2, 5, 10}, how many
  *    QI groups have fewer than k members and how much document mass
  *    sits in them — the re-identification exposure measure privacy
  *    reviews ask of published training corpora. The corpus collapses
  *    to one bounded group-size frame in a single shuffle; the k
  *    sweep fans out over that tiny frame, never the corpus.
  */
object PipelineQueries26 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** Profiled columns of `documents`, in output order. */
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  val defs: Seq[QDef] = Seq(

    QDef("q224_readability",
      (s, dir) => {
        val perDoc = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            explode(tokens(col("text"))).as("tok"))
          .select(col("source"), col("doc_id"),
            (regexp_count(col("tok"), lit("[aeiou]+")) === 1)
              .cast("long").as("mono"))
          .groupBy("source", "doc_id")
          .agg(sum("mono").as("mono"), count(lit(1)).as("n"))
          .filter(col("n") > 0)
          // FORCAST in milli-grades: 20000 − ((150·mono/n)/10)·1000
          .select(col("source"),
            expr("20000L - (15000L * mono) div n").as("grade_milli"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("grade_milli").as("sg"))
          .select(col("source"), col("n_docs"),
            expr("sg div n_docs").as("mean_grade_milli"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id, unnest($toksSql) AS tok
              |           FROM documents),
              |p AS (SELECT source, doc_id,
              |    CAST(sum(CASE WHEN len(regexp_extract_all(tok, '[aeiou]+')) = 1
              |             THEN 1 ELSE 0 END) AS BIGINT) AS mono,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM t GROUP BY 1, 2),
              |g AS (SELECT source, 20000 - (15000 * mono) // n AS grade
              |      FROM p WHERE n > 0)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(CAST(sum(grade) AS BIGINT) // count(*) AS BIGINT)
              |    AS mean_grade_milli
              |FROM g GROUP BY source""".stripMargin)),

    QDef("q225_column_profile",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val aggs = ProfileCols.flatMap(c => Seq(
          sum(col(c).isNull.cast("long")).as(s"nn_$c"),
          count_distinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mi_$c"),
          max(col(c)).cast("string").as(s"ma_$c")))
        d.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(ProfileCols.map(c =>
            struct(lit(c).as("col_name"),
              col(s"nn_$c").as("n_null"),
              col(s"nd_$c").as("n_distinct"),
              col(s"mi_$c").as("min_value"),
              col(s"ma_$c").as("max_value"))): _*)).as("p"))
          .select(col("p.col_name"), col("p.n_null"), col("p.n_distinct"),
            col("p.min_value"), col("p.max_value"))
      },
      Some(ProfileCols.map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  min($c)::VARCHAR AS min_value,
           |  max($c)::VARCHAR AS max_value
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n"))),

    QDef("q226_k_anonymity",
      (s, dir) => {
        val sizes = Tables.documents(s, dir)
          .groupBy(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket"))
          .agg(count(lit(1)).as("sz"))
        sizes
          .select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"),
            col("sz"))
          .groupBy("k")
          .agg(
            sum(when(col("sz") < col("k"), 1L).otherwise(0L))
              .as("n_risky_groups"),
            sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
              .as("n_risky_docs"),
            sum(col("sz")).as("nd"))
          .select(col("k"), col("n_risky_groups"), col("n_risky_docs"),
            expr("(1000 * n_risky_docs) div nd").as("risky_milli"))
      },
      Some("""WITH g AS (SELECT lang, source, n_chars // 100 AS len_bucket,
             |             CAST(count(*) AS BIGINT) AS sz
             |           FROM documents GROUP BY 1, 2, 3),
             |x AS (SELECT k, sz FROM g CROSS JOIN
             |        (SELECT unnest([2, 5, 10]) AS k))
             |SELECT CAST(k AS BIGINT) AS k,
             |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_risky_groups,
             |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
             |    AS n_risky_docs,
             |  CAST((1000 * CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END)
             |    AS BIGINT)) // CAST(sum(sz) AS BIGINT) AS BIGINT)
             |    AS risky_milli
             |FROM x GROUP BY k""".stripMargin))
  )
}
