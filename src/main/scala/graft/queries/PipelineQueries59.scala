package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-ninth pipeline group — conjunctive-query planning for the
  * inverted index family (q90 BM25, q135 positional, q307 postings):
  *
  *  - q331: AND-query intersection planner audit. A conjunctive
  *    query intersects posting lists cheapest in ASCENDING document-
  *    frequency order (the rarest term prunes first — the same
  *    pigeonhole logic as q208's rarest-gram candidates), and cost
  *    models predict the intermediate sizes with the independence
  *    assumption est_{k+1} = est_k · df_{k+1} / N. The audit builds
  *    8 deterministic 3-term phrase queries from the shingle
  *    vocabulary (rank-striped over the df-top-24, so every query
  *    mixes a frequent, a medium and a rarer term), reports the
  *    ascending-df plan's estimated intermediate, the TRUE
  *    intersection size, and the estimation error — the retrieval
  *    twin of q320's join-cardinality audit. All planning frames are
  *    vocabulary-sized; the only corpus-sized pass is the posting
  *    scan, and the actual-intersection join touches only the 24
  *    chosen terms' postings.
  */
object PipelineQueries59 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"
  private val NQueries = 8
  private val MinDf = 5

  val defs: Seq[QDef] = Seq(

    QDef("q331_intersection_planner",
      (s, dir) => {
        val post = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(shingleHashes(col("toks"))).as("h"))
          .localCheckpoint() // df pass + the actual-intersection join
        val nDocs = Tables.documents(s, dir).count()
        val df = post.groupBy("h").agg(count(lit(1)).as("df"))
          .filter(col("df") >= MinDf)
        val wr = Window.orderBy(col("df").desc, col("h").asc)
        // vocabulary-sized rank window (bounded by the term set)
        val terms = df.withColumn("rk", row_number().over(wr))
          .filter(col("rk") <= NQueries * 3)
          .withColumn("q_id",
            pmod(col("rk") - 1, lit(NQueries)).cast("long"))
          .localCheckpoint()
        val plan = terms.groupBy("q_id")
          .agg(sort_array(collect_list("df")).as("dfs"))
          .select(col("q_id"),
            element_at(col("dfs"), 1).as("df1"),
            element_at(col("dfs"), 2).as("df2"),
            element_at(col("dfs"), 3).as("df3"))
          .withColumn("est_docs",
            expr(s"df1 * df2 div ${nDocs}L * df3 div ${nDocs}L"))
        val actual = post
          .join(terms.select("h", "q_id"), "h")
          .groupBy("q_id", "doc_id").agg(count(lit(1)).as("hits"))
          .filter(col("hits") === 3)
          .groupBy("q_id").agg(count(lit(1)).as("actual_docs"))
        plan.join(actual, Seq("q_id"), "left")
          .select(col("q_id"), col("df1"), col("df2"), col("df3"),
            col("est_docs"),
            coalesce(col("actual_docs"), lit(0L)).as("actual_docs"),
            expr("abs(est_docs - coalesce(actual_docs, 0L)) " +
              "* 1000000L div greatest(1L, coalesce(actual_docs, 0L))")
              .as("err_micro"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks
              |  FROM documents),
              |p AS MATERIALIZED (SELECT doc_id, unnest(
              |    list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")}))) AS h
              |  FROM t WHERE len(toks) >= 3),
              |nd AS (SELECT CAST(count(*) AS BIGINT) AS n
              |  FROM documents),
              |df AS (SELECT h, CAST(count(*) AS BIGINT) AS df
              |  FROM p GROUP BY 1 HAVING count(*) >= $MinDf),
              |tm AS MATERIALIZED (SELECT h, df,
              |    (row_number() OVER (ORDER BY df DESC, h) - 1)
              |      % $NQueries AS q_id,
              |    row_number() OVER (ORDER BY df DESC, h) AS rk
              |  FROM df QUALIFY rk <= ${NQueries * 3}),
              |pl AS (SELECT q_id, dfs[1] AS df1, dfs[2] AS df2,
              |    dfs[3] AS df3
              |  FROM (SELECT q_id, list_sort(list(df)) AS dfs
              |    FROM tm GROUP BY 1)),
              |es AS (SELECT q_id, df1, df2, df3,
              |    df1 * df2 // nd.n * df3 // nd.n AS est_docs
              |  FROM pl, nd),
              |ac AS (SELECT q_id, CAST(count(*) AS BIGINT)
              |    AS actual_docs
              |  FROM (SELECT tm.q_id, p.doc_id
              |    FROM p JOIN tm USING (h)
              |    GROUP BY 1, 2 HAVING count(*) = 3)
              |  GROUP BY 1),
              |j AS (SELECT es.q_id, df1, df2, df3, est_docs,
              |    coalesce(ac.actual_docs, 0) AS actual_docs
              |  FROM es LEFT JOIN ac USING (q_id))
              |SELECT CAST(q_id AS BIGINT) AS q_id, df1, df2, df3,
              |  est_docs, actual_docs,
              |  abs(est_docs - actual_docs) * 1000000
              |    // greatest(1, actual_docs) AS err_micro
              |FROM j""".stripMargin))
  )
}
