package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Thirty-eighth pipeline group — corpus-graph structure and
  * source-level vocabulary geometry:
  *
  *  - q290: degree assortativity of the near-dup graph — do heavily-
  *    duplicated documents duplicate each other (r > 0, mirror-farm
  *    structure) or attach to singletons (r < 0, template-hub
  *    structure)? Pearson r over the directed edge list's endpoint
  *    degrees: five exact integer sums off the O(pairs) frame, one
  *    mirrored sqrt (the q146 rule). Completes the graph-metrics
  *    family (components / k-core / PageRank / HITS / triangles).
  *  - q291: source-vocabulary overlap matrix — pairwise Jaccard of
  *    distinct token sets per source. The corpus collapses to
  *    distinct (token-hash, source) rows ONCE; pairs form per token
  *    (fanout ≤ #sources² per token, #sources bounded), so the
  *    shuffle carries 8-byte hashes and never a vocabulary cross
  *    join. The doc-level dedup family can't see this: two sources
  *    can share 90% vocabulary with zero near-dup documents.
  */
object PipelineQueries38 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** The per-source-pair vocabulary Jaccard frame — q291's body,
    * shared with q292 (one definition, never copies). */
  private[queries] def vocabOverlapFrame(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val vocab = Tables.documents(s, dir)
      .select(col("source"), explode(tokens(col("text"))).as("tok"))
      .select(col("source"), tokenHash(col("tok")).as("h"))
      .distinct()
      .localCheckpoint() // sizes + the per-token pair join
    val sz = vocab.groupBy("source").agg(count(lit(1)).as("vs"))
    val inter = vocab.as("a").join(vocab.as("b"),
        col("a.h") === col("b.h") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sz.select(col("source").as("source_a"),
        col("vs").as("va"))), "source_a")
      .join(broadcast(sz.select(col("source").as("source_b"),
        col("vs").as("vb"))), "source_b")
      .selectExpr("source_a", "source_b", "inter",
        "va", "vb",
        "(1000 * inter) div (va + vb - inter) AS jaccard_milli")
  }

  /** q291's oracle CTEs ending in a `vo` relation with the same
    * columns as [[vocabOverlapFrame]]. */
  private[queries] val vocabOverlapCtes: String =
    s"""vv AS MATERIALIZED (SELECT DISTINCT source,
       |    ${hashSql("tok")} AS h
       |  FROM (SELECT source, unnest($toksSql) AS tok
       |        FROM documents)),
       |vsz AS (SELECT source, CAST(count(*) AS BIGINT) AS vs
       |  FROM vv GROUP BY 1),
       |vi AS (SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(count(*) AS BIGINT) AS inter
       |  FROM vv a JOIN vv b ON a.h = b.h AND a.source < b.source
       |  GROUP BY 1, 2),
       |vo AS (SELECT source_a, source_b, inter, x.vs AS va, y.vs AS vb,
       |    CAST((1000 * inter) // (x.vs + y.vs - inter) AS BIGINT)
       |      AS jaccard_milli
       |  FROM vi JOIN vsz x ON vi.source_a = x.source
       |    JOIN vsz y ON vi.source_b = y.source)""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q290_degree_assortativity",
      (s, dir) => {
        val pairs = Dedup.nearDupMinhashArtifact(Tables.documents(s, dir),
            "doc_id", "text", fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
        val ee = pairs.unionByName(pairs.select(
            col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
          .localCheckpoint() // degree agg + both endpoint joins
        val deg = ee.groupBy("doc_a").agg(count(lit(1)).as("d"))
        val j = ee
          .join(deg, "doc_a")
          .join(deg.select(col("doc_a").as("doc_b"), col("d").as("d2")),
            "doc_b")
        val agg = j.agg(count(lit(1)).as("m"), sum("d").as("su"),
          sum("d2").as("sv"), sum(expr("d * d")).as("suu"),
          sum(expr("d2 * d2")).as("svv"), sum(expr("d * d2")).as("suv"))
        val nodes = deg.agg(count(lit(1)).as("n_nodes"),
          sum("d").as("sd"))
        agg.crossJoin(broadcast(nodes))
          .selectExpr("m AS n_edges_directed", "n_nodes",
            "(1000 * sd) div n_nodes AS mean_deg_milli",
            "m * suv - su * sv AS num",
            "m * suu - su * su AS da", "m * svv - sv * sv AS db")
          .selectExpr("n_edges_directed", "n_nodes", "mean_deg_milli",
            """CASE WHEN da <= 0 OR db <= 0 THEN 0L
              |ELSE CAST(floor((1000.0 * num)
              |  / sqrt(CAST(da AS DOUBLE) * CAST(db AS DOUBLE)))
              |  AS BIGINT) END AS assortativity_milli""".stripMargin)
      },
      Some(s"""WITH ${PipelineQueries.pairCtes(0.8, materialized = true)},
              |ee AS MATERIALIZED (SELECT da AS a, db AS b FROM pr
              |  UNION ALL SELECT db, da FROM pr),
              |dg AS MATERIALIZED (SELECT a, CAST(count(*) AS BIGINT)
              |    AS d FROM ee GROUP BY a),
              |ag AS (SELECT CAST(count(*) AS BIGINT) AS m,
              |    CAST(sum(x.d) AS BIGINT) AS su,
              |    CAST(sum(y.d) AS BIGINT) AS sv,
              |    CAST(sum(x.d * x.d) AS BIGINT) AS suu,
              |    CAST(sum(y.d * y.d) AS BIGINT) AS svv,
              |    CAST(sum(x.d * y.d) AS BIGINT) AS suv
              |  FROM ee JOIN dg x ON ee.a = x.a JOIN dg y ON ee.b = y.a),
              |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
              |    CAST(sum(d) AS BIGINT) AS sd FROM dg),
              |v AS (SELECT m AS n_edges_directed, n_nodes,
              |    (1000 * sd) // n_nodes AS mean_deg_milli,
              |    m * suv - su * sv AS num,
              |    m * suu - su * su AS da2, m * svv - sv * sv AS db2
              |  FROM ag CROSS JOIN nd)
              |SELECT n_edges_directed, n_nodes,
              |  CAST(mean_deg_milli AS BIGINT) AS mean_deg_milli,
              |  CASE WHEN da2 <= 0 OR db2 <= 0 THEN 0
              |    ELSE CAST(floor((1000.0 * num)
              |      / sqrt(CAST(da2 AS DOUBLE) * CAST(db2 AS DOUBLE)))
              |      AS BIGINT) END AS assortativity_milli
              |FROM v""".stripMargin)),

    QDef("q291_source_vocab_overlap",
      (s, dir) => vocabOverlapFrame(s, dir),
      Some(s"""WITH $vocabOverlapCtes
              |SELECT source_a, source_b, inter, va, vb, jaccard_milli
              |FROM vo""".stripMargin))
  )
}
