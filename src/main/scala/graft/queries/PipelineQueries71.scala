package graft.queries

import graft.Tables
import graft.ops.TopK
import org.apache.spark.sql.functions._

/** Seventy-first pipeline group — exact global ranking at scale:
  *
  *  - q360: exact global top-k through [[graft.ops.TopK.global]] (r12
  *    verdict frontier (a)) — per-partition partial top-k, then ONE
  *    executor-side merge of the ≤ partitions·k partials. Spark's
  *    `orderBy().limit(k)` (TakeOrderedAndProject) funnels every
  *    partition's k candidates through the DRIVER, which is the wrong
  *    place for k in the 10⁵-10⁶ range a shard-manifest or eval-set
  *    selection needs; the two-phase aggregate form keeps the merge on
  *    an executor and only the k answer rows ever exist after it. The
  *    ranking key is TOTAL (chars desc, doc_id asc) so the answer is
  *    partitioning-independent — TopKSpec pins that law; the oracle
  *    pins this instance.
  */
object PipelineQueries71 {

  val defs: Seq[QDef] = Seq(

    QDef("q360_global_topk",
      (s, dir) => {
        TopK.global(Tables.documents(s, dir),
            struct((-col("n_chars")).as("nn"),
              col("doc_id").as("doc_id")), k = 100)
          .select(col("rank"), col("key.doc_id").as("doc_id"),
            (-col("key.nn")).as("n_chars"))
      },
      Some("""SELECT * FROM (
             |  SELECT CAST(row_number() OVER (
             |      ORDER BY n_chars DESC, doc_id ASC) - 1 AS BIGINT)
             |      AS rank,
             |    doc_id, n_chars
             |  FROM documents
             |  ORDER BY n_chars DESC, doc_id ASC LIMIT 100)
             |ORDER BY rank""".stripMargin))
  )
}
