package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{ConnectedComponents, Dedup}
import graft.ops.VectorSearch.{dot, planeVector, toDouble}
import org.apache.spark.sql.functions._

/** Sixteenth pipeline group — pipeline-health analytics:
  *
  *  - q177: classifier calibration curve (reliability diagram) for the
  *    q86 linear quality classifier — fixed-width logit buckets vs the
  *    empirical positive rate (label parity as the deterministic
  *    stand-in truth, the q121 convention). A well-calibrated filter's
  *    rate rises monotonically with the bucket; a flat curve means
  *    the threshold is the only information in the score.
  *  - q178: dedup-graph health — the component-size histogram of the
  *    near-dup graph (q25 pairs → q69 components). A giant component
  *    is the classic over-aggressive-threshold signature (everything
  *    transitively glued); the histogram is what an operator checks
  *    before trusting canonical selection. Size-1 components
  *    (never-matched docs) are implicit and excluded.
  *
  * Both run their analytics on ALREADY-AGGREGATED frames (buckets,
  * component sizes) — corpus-scale work is exactly the underlying
  * operators' (one scan + the LSH/CC machinery).
  */
object PipelineQueries16 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  val defs: Seq[QDef] = Seq(

    // Calibration: q86's exact logit (same plane, same bias), bucketed
    // at width 0.1 via floor(logit·10) — floor on identically-derived
    // doubles is engine-identical — against truth = even label. The
    // curve is |buckets| rows from one scan + one aggregation.
    QDef("q177_score_calibration",
      (s, dir) => {
        val w = planeVector(9999, 64)
        val logit = dot(toDouble(col("embedding")), typedLit(w)) +
          lit(-0.05)
        Tables.embeddings(s, dir)
          .select(floor(logit * 10.0).cast("long").as("bucket"),
            (col("label") % 2 === 0).cast("long").as("pos"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"))
          .select(col("bucket"), col("n"), col("n_pos"),
            expr("(1000 * n_pos) div n").as("rate_milli"))
      },
      Some {
        val wLit = planeVector(9999, 64).map(dbl).mkString("[", ", ", "]")
        val vSql = "list_transform(embedding, x -> x::DOUBLE)"
        val dotSql = VectorOracleSql.dot(vSql, wLit)
        s"""WITH b AS (SELECT
           |    CAST(floor(($dotSql + ${dbl(-0.05)}) * 10.0) AS BIGINT)
           |      AS bucket,
           |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
           |  FROM embeddings),
           |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           |    CAST(sum(pos) AS BIGINT) AS n_pos
           |  FROM b GROUP BY 1)
           |SELECT bucket, n, n_pos,
           |  CAST((1000 * n_pos) // n AS BIGINT) AS rate_milli
           |FROM g""".stripMargin
      }),

    // Dedup-graph histogram: LSH pairs at 0.8 → connected components →
    // size histogram. Oracle: brute-force exact pairs + recursive
    // closure (the q120 pattern), then the same two aggregations.
    QDef("q178_dedup_graph_stats",
      (s, dir) => {
        val pairs = Dedup.nearDupMinhashArtifact(Tables.documents(s, dir),
          "doc_id", "text", fpKey = s"$dir#documents#id_text")
        ConnectedComponents.run(pairs, "doc_a", "doc_b")
          .groupBy("component").agg(count(lit(1)).as("cluster_size"))
          .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      },
      Some(s"""WITH RECURSIVE t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |e AS (SELECT da AS a, db AS b FROM p
              |      UNION SELECT db, da FROM p),
              |reach(a, b) AS (
              |  SELECT a, b FROM e
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
              |cl AS (SELECT a AS node, least(a, min(b)) AS cid
              |  FROM reach GROUP BY a),
              |cs AS (SELECT cid, CAST(count(*) AS BIGINT)
              |    AS cluster_size FROM cl GROUP BY 1)
              |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
              |FROM cs GROUP BY 1""".stripMargin))
  )
}
