package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-fifth pipeline group — hybrid retrieval:
  *
  *  - q219: reciprocal-rank fusion (RRF, Cormack et al. 2009) of the
  *    lexical BM25 ranking (q90) and the embedding-cosine ranking
  *    (q28) — the standard hybrid-search stack. Each list contributes
  *    1e6 div (60 + rank) integer micro-units; the fused score is a
  *    full-outer join of two k-row rankings, so fusion costs O(k)
  *    regardless of corpus size — the expensive parts ARE q90/q28,
  *    whose scale shapes are already contract-pinned. Reuses both
  *    QDefs directly (Spark fns and oracle SQL alike), so the three
  *    rankings can never drift apart.
  */
object PipelineQueries25 {

  /** RRF's standard dampening constant. */
  private val RrfK = 60L

  val defs: Seq[QDef] = Seq(

    QDef("q219_hybrid_rrf",
      (s, dir) => {
        val lex = PipelineQueries4.defs
          .find(_.name == "q90_bm25_search").get.fn(s, dir)
          .select(col("doc_id").as("id"),
            col("rank").cast("long").as("lex_rank"))
        val sem = VectorQueries.defs
          .find(_.name == "q28_ann_bruteforce").get.fn(s, dir)
          .select(col("vec_id").as("id"),
            col("rank").cast("long").as("sem_rank"))
        lex.join(sem, Seq("id"), "full_outer") // two k-row frames
          .select(col("id").as("doc_id"),
            (coalesce(expr(s"1000000 div ($RrfK + lex_rank)"), lit(0L)) +
              coalesce(expr(s"1000000 div ($RrfK + sem_rank)"), lit(0L)))
              .as("rrf_micro"),
            col("lex_rank"), col("sem_rank"))
          .orderBy(col("rrf_micro").desc, col("doc_id"))
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("rrf_micro").desc, col("doc_id")))
            .cast("long"))
      },
      Some {
        val lexSql = PipelineQueries4.defs
          .find(_.name == "q90_bm25_search").get.oracle.get
        val semSql = VectorQueries.defs
          .find(_.name == "q28_ann_bruteforce").get.oracle.get
        s"""WITH lex AS (SELECT doc_id AS id,
           |    CAST(rank AS BIGINT) AS lex_rank FROM ($lexSql) zl),
           |sem AS (SELECT vec_id AS id,
           |    CAST(rank AS BIGINT) AS sem_rank FROM ($semSql) zs),
           |f AS (SELECT coalesce(lex.id, sem.id) AS doc_id,
           |    coalesce(1000000 // ($RrfK + lex_rank), 0) +
           |      coalesce(1000000 // ($RrfK + sem_rank), 0) AS rrf_micro,
           |    lex_rank, sem_rank
           |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
           |SELECT doc_id, rrf_micro, lex_rank, sem_rank,
           |  CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
           |    AS BIGINT) AS rank
           |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10"""
          .stripMargin
      })
  )
}
