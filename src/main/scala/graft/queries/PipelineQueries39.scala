package graft.queries

import graft.Tables
import graft.ops.{Dedup, TopK}
import graft.ops.VectorSearch._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-ninth pipeline group — cross-layer composition audits:
  *
  *  - q292: source affinity — vocabulary-level Jaccard (q291's frame,
  *    one definition) joined against DOCUMENT-level cross-source
  *    near-dup pair counts on the same source pairs. The two layers
  *    disagree in exactly the interesting cases: high vocab overlap
  *    with zero near-dups = same-domain independent writing; low
  *    vocab overlap with many near-dups = templated boilerplate
  *    mirrors. Both inputs are existing bounded constructions; the
  *    join is O(#source-pairs).
  *  - q293: ANN ranking quality — nDCG@10 and MRR of the IVF
  *    candidate ranking against the brute-force exact top-10, per
  *    probe vector. The recall specs (AnnRecallSpec) grade set
  *    overlap; nDCG grades ORDER, which is what a retrieval consumer
  *    actually feels. log2 discounts enter as plan-time INTEGER
  *    literals (floor(1e6/log2(i+1)) — no libm crossing, the q283
  *    rule); both rankings use the house total order
  *    (round(cos,6) desc, id asc); the probe set is the bounded
  *    eval sample (vec_id % 100), the standard eval-harness shape at
  *    any corpus size.
  */
object PipelineQueries39 {

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

  /** q293's late-bound oracle (centroid literals). */
  private object NdcgOracle { @volatile var sql: Option[String] = None }

  /** floor(1e6 / log2(i+1)) for ranks 1..10 — DCG gains as integer
    * literals, identical in both engines by construction. */
  private val gains: Seq[Long] =
    (1 to 10).map(i => math.floor(1e6 / (math.log(i + 1.0) /
      math.log(2.0))).toLong)
  private val idcg: Long = gains.sum

  val defs: Seq[QDef] = Seq(

    QDef("q292_source_affinity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val srcOf = docs.select(col("doc_id"), col("source"))
          .localCheckpoint() // both endpoint joins read it
        val nd = Dedup.nearDupMinhashArtifact(docs, "doc_id", "text",
            fpKey = s"$dir#documents#id_text")
          .join(srcOf.select(col("doc_id").as("doc_a"),
            col("source").as("sa")), "doc_a")
          .join(srcOf.select(col("doc_id").as("doc_b"),
            col("source").as("sb")), "doc_b")
          .filter(col("sa") =!= col("sb"))
          .select(least(col("sa"), col("sb")).as("source_a"),
            greatest(col("sa"), col("sb")).as("source_b"))
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("cross_neardup_pairs"))
        PipelineQueries38.vocabOverlapFrame(s, dir)
          .join(nd, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"),
            col("jaccard_milli").as("vocab_jaccard_milli"),
            coalesce(col("cross_neardup_pairs"), lit(0L))
              .as("cross_neardup_pairs"))
      },
      Some(s"""WITH ${PipelineQueries.pairCtes(0.8, materialized = true)},
              |${PipelineQueries38.vocabOverlapCtes},
              |so AS (SELECT doc_id, source FROM documents),
              |nd AS (SELECT least(x.source, y.source) AS source_a,
              |    greatest(x.source, y.source) AS source_b,
              |    CAST(count(*) AS BIGINT) AS cross_neardup_pairs
              |  FROM pr JOIN so x ON pr.da = x.doc_id
              |    JOIN so y ON pr.db = y.doc_id
              |  WHERE x.source <> y.source
              |  GROUP BY 1, 2)
              |SELECT vo.source_a, vo.source_b,
              |  jaccard_milli AS vocab_jaccard_milli,
              |  coalesce(cross_neardup_pairs, 0) AS cross_neardup_pairs
              |FROM vo LEFT JOIN nd USING (source_a, source_b)"""
        .stripMargin)),

    QDef("q293_ann_ndcg",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        NdcgOracle.sql = Some {
          val gainCaseSql = (1 to 10).map(i =>
            s"WHEN $i THEN ${gains(i - 1)}").mkString(" ")
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
             |q AS (SELECT vec_id AS qid, v AS qv FROM e
             |  WHERE vec_id % 100 = 0 AND vec_id < 100000),
             |c AS (SELECT vec_id, v FROM e
             |  WHERE NOT (vec_id % 100 = 0 AND vec_id < 100000)),
             |sc AS MATERIALIZED (SELECT qid, vec_id,
             |    round(${dotSql("v", "qv")}
             |      / (${normSql("v")} * ${normSql("qv")}), 6) AS sim
             |  FROM c CROSS JOIN q),
             |ex AS (SELECT qid, vec_id, row_number() OVER
             |      (PARTITION BY qid ORDER BY sim DESC, vec_id ASC)
             |      AS rnk
             |  FROM sc QUALIFY rnk <= 10),
             |cc AS (SELECT vec_id,
             |    list_reverse_sort(${cellsSql(cents)})[1].cell AS cell
             |  FROM e),
             |qc AS (SELECT vec_id AS qid,
             |    unnest(list_transform(list_slice(
             |      list_reverse_sort(${cellsSql(cents)}), 1, 2),
             |      z -> z.cell)) AS cell
             |  FROM e WHERE vec_id % 100 = 0 AND vec_id < 100000),
             |ap AS (SELECT sc.qid, sc.vec_id, row_number() OVER
             |      (PARTITION BY sc.qid ORDER BY sim DESC,
             |        sc.vec_id ASC) AS rnk
             |  FROM sc
             |  JOIN cc ON sc.vec_id = cc.vec_id
             |  JOIN qc ON sc.qid = qc.qid AND cc.cell = qc.cell
             |  QUALIFY rnk <= 10),
             |rel AS (SELECT ap.qid, ap.rnk,
             |    CASE WHEN ex.vec_id IS NOT NULL THEN 1 ELSE 0 END
             |      AS rel
             |  FROM ap LEFT JOIN ex
             |    ON ap.qid = ex.qid AND ap.vec_id = ex.vec_id)
             |SELECT qid, CAST(sum(rel) AS BIGINT) AS n_rel10,
             |  CAST((1000000 * sum(rel * (CASE rnk $gainCaseSql
             |    ELSE 0 END))) // $idcg AS BIGINT) AS ndcg_micro,
             |  CAST(coalesce(max(CASE WHEN rel = 1
             |    THEN 1000000 // rnk END), 0) AS BIGINT) AS mrr_micro
             |FROM rel GROUP BY qid""".stripMargin
        }
        val e = emb.select(col("vec_id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", norm(col("v")))
          .localCheckpoint() // probe side + corpus side + exact scan
        // the probe set is a FIXED-size eval sample (≤1000 probes):
        // without the cap the ground-truth scan is probes×corpus =
        // n²/100 — the q79 quadratic family; with it, linear in the
        // corpus at any scale. Unchanged at the test SFs (max id <<
        // the cap).
        val isQ = col("vec_id") % 100 === 0 && col("vec_id") < 100000
        val probes = e.filter(isQ)
          .select(col("vec_id").as("qid"), col("v").as("qv"),
            col("nrm").as("qn"))
        val corpus = e.filter(!isQ)
        val scored = corpus.crossJoin(broadcast(probes))
          .select(col("qid"), col("vec_id"),
            round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6)
              .as("sim"))
          .localCheckpoint() // exact top-k + the IVF-filtered top-k
        def top10(df: org.apache.spark.sql.DataFrame) =
          TopK.perGroup(df, "qid",
            struct((-col("sim")).as("ns"), col("vec_id").as("id")), 10)
            .select(col("qid"), (col("rank") + 1L).as("rnk"),
              col("key.id").as("vec_id"))
        val exact = top10(scored)
        val corpOwn = ivfAssign(emb, "vec_id", "embedding", cents,
            probes = 1)
          .join(broadcast(e.filter(isQ).select(col("vec_id").as("id"))),
            Seq("id"), "left_anti")
          .select(col("id").as("vec_id"), col("cell"))
        val qCells = ivfAssign(emb, "vec_id", "embedding", cents,
            probes = 2)
          .join(broadcast(e.filter(isQ).select(col("vec_id").as("id"))),
            "id")
          .select(col("id").as("qid"), col("cell"))
        val approx = top10(scored
          .join(corpOwn, "vec_id")
          .join(broadcast(qCells), Seq("qid", "cell")))
        val gainExpr = s"CASE rnk - 1 ${(1 to 10).map(i =>
          s"WHEN ${i - 1} THEN ${gains(i - 1)}L").mkString(" ")
        } ELSE 0L END"
        approx
          .join(exact.select(col("qid"), col("vec_id"),
            lit(1L).as("rel")), Seq("qid", "vec_id"), "left")
          .withColumn("rel", coalesce(col("rel"), lit(0L)))
          .groupBy("qid")
          .agg(sum("rel").as("n_rel10"),
            sum(expr(s"rel * ($gainExpr)")).as("dcg"),
            max(when(col("rel") === 1,
              expr("1000000 div rnk"))).as("mrr0"))
          .selectExpr("qid", "n_rel10",
            s"(1000000 * dcg) div ${idcg}L AS ndcg_micro",
            "coalesce(mrr0, 0L) AS mrr_micro")
      },
      None,
      Some(() => NdcgOracle.sql))
  )
}
