package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.VectorSearch.{dot, planeVector, toDouble}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Third pipeline group: model-scored quality filtering, corpus
  * reporting, and tokenizer-training prep — the steps around the
  * cleaning/mixing core (PipelineQueries, PipelineQueries2).
  */
object PipelineQueries3 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** Shortest-safe double literal (see VectorQueries.dbl). */
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  val defs: Seq[QDef] = Seq(

    // Model-based quality scoring — the modern pipeline's
    // classifier-filter step (fastText/linear-probe style: FineWeb-Edu,
    // DCLM score their corpora this way): a linear model over the
    // document embedding, applied as one broadcast-literal dot product
    // per row. Deliberately emits the LOGIT, not a sigmoid: the
    // monotone exp() would drag libm differences into the gate, while
    // the logit is a pure multiply-add fold — bit-identical
    // cross-engine (same ascending order as the codegen'd kernel).
    // Weights are a deterministic stand-in (md5-derived hyperplane,
    // the LSH plane generator); a trained model drops in as the same
    // literal vector. Scan-only, no shuffle.
    QDef("q86_quality_classifier",
      (s, dir) => {
        val w = planeVector(9999, 64)
        val bias = -0.05
        val logit = dot(toDouble(col("embedding")), typedLit(w)) + lit(bias)
        Tables.embeddings(s, dir)
          .select(col("vec_id"), round(logit, 6).as("logit"),
            (logit > 0).as("accept"))
      },
      Some {
        val wLit = planeVector(9999, 64).map(dbl).mkString("[", ", ", "]")
        val vSql = "list_transform(embedding, x -> x::DOUBLE)"
        val dotSql = VectorOracleSql.dot(vSql, wLit)
        s"""SELECT vec_id,
           |  round($dotSql + ${dbl(-0.05)}, 6) AS logit,
           |  ($dotSql + ${dbl(-0.05)}) > 0 AS accept
           |FROM embeddings""".stripMargin
      }),

    // Corpus reporting cube — the (lang × source) token/document
    // matrix WITH margins that every mixing decision reads: one
    // `cube` pass computes all four grouping sets (cell, per-lang,
    // per-source, grand total) in a single shuffle instead of four
    // jobs. NULL marks an aggregated-out dimension in both engines.
    QDef("q87_corpus_cube",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("lang"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_tokens"))
          .cube(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      },
      Some(s"""SELECT lang, source, count(*) AS n_docs,
              |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
              |FROM documents
              |GROUP BY CUBE (lang, source)""".stripMargin)),

    // Tokenizer-training prep — the first BPE merge decision: count
    // every ADJACENT token pair across the corpus (multiset, not
    // distinct — merge frequency is occurrence count) and rank the
    // top candidates deterministically. Plan: project tokens once
    // (attribute, so the pair lambda doesn't re-tokenize per element —
    // the PLANS.md re-evaluation lesson), explode pairs, one
    // partial+final count aggregation, TakeOrdered for the bounded
    // head — no global sort.
    QDef("q88_bpe_pair_counts",
      (s, dir) => {
        val pairs = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
          .select(explode(when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1),
              i => concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        pairs.groupBy("pair").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("pair").asc)
          .limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cnt").desc, col("pair").asc)))
      },
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |p AS (
              |  SELECT unnest(CASE WHEN len(toks) >= 2 THEN
              |    list_transform(generate_series(1, len(toks) - 1),
              |      i -> toks[i] || ' ' || toks[i + 1])
              |    ELSE [] END) AS pair
              |  FROM t),
              |c AS (SELECT pair, count(*) AS cnt FROM p GROUP BY pair)
              |SELECT pair, cnt,
              |  row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rank
              |FROM c ORDER BY cnt DESC, pair ASC LIMIT 20""".stripMargin))
  )
}
