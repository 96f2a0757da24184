package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forty-second pipeline group — privacy depth and the corpus
  * scorecard capstone:
  *
  *  - q299: l-diversity — the audit k-anonymity (q263) cannot do: a
  *    class can be large (k-anonymous) yet carry ONE sensitive value,
  *    re-identifying the attribute anyway. Same quasi-identifier
  *    classes as q263 ((source, char-length bucket), with `lang` as
  *    the sensitive attribute); per source: worst-class diversity and
  *    the doc mass in 1-diverse classes. O(distinct classes) after
  *    one aggregation.
  *  - q300: corpus health scorecard — the one-row dashboard a data
  *    lead reads before a run: volume, vocabulary census, exact-dup
  *    rate (32-bit content hashes — the cost of which q297 itself
  *    measures), mean length, lang entropy, and source concentration
  *    (q260's Gini tree verbatim). One corpus scan feeds every
  *    signal; the margins/windows run on O(#langs)/O(#sources)
  *    frames.
  */
object PipelineQueries42 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  val defs: Seq[QDef] = Seq(

    QDef("q299_l_diversity",
      (s, dir) => {
        val cls = Tables.documents(s, dir)
          .select(col("source"), expr("n_chars div 100").as("len_bucket"),
            col("lang"))
          .groupBy("source", "len_bucket")
          .agg(count(lit(1)).as("cn"),
            count_distinct(col("lang")).as("l"))
        cls.groupBy("source")
          .agg(sum("cn").as("n_docs"), count(lit(1)).as("n_classes"),
            min("l").as("min_l"),
            sum(when(col("l") === 1, col("cn")).otherwise(0L))
              .as("n_mono_docs"))
          .selectExpr("source", "n_docs", "n_classes", "min_l",
            "n_mono_docs",
            "(1000 * (n_docs - n_mono_docs)) div n_docs" +
              " AS diverse_milli")
      },
      Some("""WITH c AS (SELECT source, n_chars // 100 AS len_bucket,
             |    CAST(count(*) AS BIGINT) AS cn,
             |    CAST(count(DISTINCT lang) AS BIGINT) AS l
             |  FROM documents GROUP BY source, len_bucket)
             |SELECT source, CAST(sum(cn) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_classes,
             |  CAST(min(l) AS BIGINT) AS min_l,
             |  CAST(sum(CASE WHEN l = 1 THEN cn ELSE 0 END) AS BIGINT)
             |    AS n_mono_docs,
             |  CAST((1000 * (CAST(sum(cn) AS BIGINT)
             |      - CAST(sum(CASE WHEN l = 1 THEN cn ELSE 0 END)
             |        AS BIGINT)))
             |    // CAST(sum(cn) AS BIGINT) AS BIGINT)
             |    AS diverse_milli
             |FROM c GROUP BY source""".stripMargin)),

    QDef("q300_corpus_scorecard",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"),
            tokenHash(concat(lit("dup:"), col("text"))).as("ch"),
            size(tokens(col("text"))).cast("long").as("tk"))
          .localCheckpoint() // volume agg + lang frame + source frame
        val vol = base.agg(count(lit(1)).as("n_docs"),
          count_distinct(col("lang")).as("n_langs"),
          count_distinct(col("source")).as("n_sources"),
          count_distinct(col("ch")).as("n_unique_contents"),
          sum("tk").as("tok_mass"))
        val langEnt = base.groupBy("lang").agg(count(lit(1)).as("c"))
          .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
          .select(floor((col("c") / col("n")) *
            log(col("n").cast("double") / col("c").cast("double")) *
            lit(1000000.0)).cast("long").as("term"))
          .agg(sum("term").as("lang_entropy_micro_nat"))
        val mass = base.groupBy("source").agg(sum("tk").as("m"))
        val w = Window.orderBy(col("m").asc, col("source").asc)
        val gini = mass
          .withColumn("rank", row_number().over(w).cast("long"))
          .agg(sum("m").as("t"), count(lit(1)).as("ns"),
            sum(expr("rank * m")).as("s2"))
          .selectExpr(
            "(2000000 * s2) div (ns * t) - (1000000 * (ns + 1)) div ns" +
              " AS source_gini_micro")
        vol.crossJoin(broadcast(langEnt)).crossJoin(broadcast(gini))
          .selectExpr("n_docs", "n_langs", "n_sources", "tok_mass",
            "(1000 * tok_mass) div n_docs AS mean_toks_milli",
            "(1000 * (n_docs - n_unique_contents)) div n_docs" +
              " AS exact_dup_milli",
            "lang_entropy_micro_nat", "source_gini_micro")
      },
      Some(s"""WITH b AS MATERIALIZED (SELECT doc_id, lang, source,
              |    ${hashSql("'dup:' || text")} AS ch,
              |    CAST(len($toksSql) AS BIGINT) AS tk
              |  FROM documents),
              |v AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              |    CAST(count(DISTINCT ch) AS BIGINT)
              |      AS n_unique_contents,
              |    CAST(sum(tk) AS BIGINT) AS tok_mass
              |  FROM b),
              |le AS (SELECT CAST(sum(term) AS BIGINT)
              |      AS lang_entropy_micro_nat
              |  FROM (SELECT CAST(floor((c / n)
              |      * ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
              |      * 1000000.0) AS BIGINT) AS term
              |    FROM (SELECT lang, CAST(count(*) AS BIGINT) AS c
              |          FROM b GROUP BY lang)
              |    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n
              |                FROM b))),
              |m AS (SELECT source, CAST(sum(tk) AS BIGINT) AS m
              |  FROM b GROUP BY source),
              |r AS (SELECT m, CAST(row_number() OVER
              |      (ORDER BY m ASC, source ASC) AS BIGINT) AS rank
              |  FROM m),
              |g AS (SELECT (2000000 * CAST(sum(rank * m) AS BIGINT))
              |      // (CAST(count(*) AS BIGINT)
              |        * CAST(sum(m) AS BIGINT))
              |    - (1000000 * (CAST(count(*) AS BIGINT) + 1))
              |      // CAST(count(*) AS BIGINT) AS source_gini_micro
              |  FROM r)
              |SELECT n_docs, n_langs, n_sources, tok_mass,
              |  CAST((1000 * tok_mass) // n_docs AS BIGINT)
              |    AS mean_toks_milli,
              |  CAST((1000 * (n_docs - n_unique_contents)) // n_docs
              |    AS BIGINT) AS exact_dup_milli,
              |  lang_entropy_micro_nat,
              |  CAST(source_gini_micro AS BIGINT) AS source_gini_micro
              |FROM v CROSS JOIN le CROSS JOIN g""".stripMargin))
  )
}
