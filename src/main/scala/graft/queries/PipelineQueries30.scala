package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{ConnectedComponents, Dedup}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirtieth pipeline group — corpus GOVERNANCE around dedup clusters
  * and source mass, the decisions a data lead signs off on before a
  * training run:
  *
  *  - q258: cluster-closed train/val/test split — q131's content-hash
  *    split keeps EXACT dups together but lets near-dup pairs
  *    straddle splits (the leak q228 audits); splitting by the
  *    near-dup CLUSTER representative (q69's components) closes it by
  *    construction. The query measures both rules on the same corpus:
  *    cluster_straddle_pairs == 0 vs the naive rule's leaked pairs.
  *  - q260: source concentration audit (Lorenz points + Gini) — how
  *    dominated the corpus is by its largest sources, the number that
  *    decides whether mixing weights (q95/q232) are even actionable.
  *    O(#sources) rows after one corpus aggregation.
  *  - q261: dedup-discounted token budget per source — raw token mass
  *    vs the mass surviving keep-one-per-cluster (cluster members
  *    attributed to the REPRESENTATIVE's source), the budget mixing
  *    actually has to plan against. A source whose mass is mostly
  *    mirrors of other sources' content contributes far less unique
  *    signal than its raw count suggests.
  *
  * Near-dup machinery is q69's verbatim (Dedup.nearDupMinhash at 0.8
  * + ConnectedComponents; oracle = PipelineQueries.pairCtes brute
  * force + recursive closure — one definition, never copies). Integer
  * rules as established: shares in micro/milli units with `div`
  * division trees mirrored token-for-token in the oracles; no float
  * crosses an engine boundary.
  */
object PipelineQueries30 {

  /** DuckDB twins of TextAnalysis.tokens / tokenHash (lockstep with
    * PipelineQueries' copies). */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** Shared oracle CTEs: brute-force pair closure → per-doc cluster id
    * (q69's oracle shape) + token counts. `cl.mn IS NOT NULL` ⇔ the
    * doc appears in some near-dup pair. */
  private val clusterCtes: String =
    s"""${PipelineQueries.pairCtes(0.8, materialized = true)},
       |ee AS (SELECT da AS a, db AS b FROM pr
       |       UNION SELECT db, da FROM pr),
       |reach(a, b) AS (
       |  SELECT a, b FROM ee
       |  UNION
       |  SELECT r.a, ee.b FROM reach r JOIN ee ON r.b = ee.a),
       |cl AS (SELECT a AS doc_id, min(b) AS mn FROM reach GROUP BY a),
       |bse AS MATERIALIZED (SELECT d.doc_id, d.source,
       |    CAST(len($toksSql) AS BIGINT) AS n_toks,
       |    least(d.doc_id, coalesce(cl.mn, d.doc_id)) AS cluster_id,
       |    cl.mn IS NOT NULL AS neardup
       |  FROM documents d LEFT JOIN cl USING (doc_id))""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Cluster-closed split: assign every doc the split of its near-dup
    // cluster REPRESENTATIVE (hash of the min-id member's id), so a
    // cluster can never straddle splits; measure the naive per-doc
    // content-hash rule (q131's) on the same pairs as the contrast.
    // Plan: the pair list (LSH-bounded, tiny next to the corpus) is
    // checkpointed and read by the component closure and both
    // straddle joins; per-doc split assignment is map-side; the
    // 3-row per-split summary crossJoins the broadcast 1-row straddle
    // counts. cluster_straddle_pairs is MEASURED (not assumed 0): the
    // query is the audit a release gate would run.
    QDef("q258_cluster_split",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.nearDupMinhash(docs, "doc_id", "text",
            threshold = 0.8)
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint() // component closure + both straddle joins
        val comp = ConnectedComponents.run(pairs, "doc_a", "doc_b")
          .withColumnRenamed("node", "doc_id")
        val base = docs
          .select(col("doc_id"),
            pmod(tokenHash(concat(lit("split:"), col("text"))),
              lit(100L)).as("nb"))
          .join(comp, Seq("doc_id"), "left")
          .withColumn("cluster_id",
            coalesce(col("component"), col("doc_id")))
          .withColumn("cb",
            pmod(tokenHash(concat(lit("csplit:"),
              col("cluster_id").cast("string"))), lit(100L)))
          .withColumn("nsplit",
            when(col("nb") < 90, lit("train"))
              .when(col("nb") < 95, lit("val")).otherwise(lit("test")))
          .withColumn("csplit",
            when(col("cb") < 90, lit("train"))
              .when(col("cb") < 95, lit("val")).otherwise(lit("test")))
          .withColumn("neardup", col("component").isNotNull)
          .localCheckpoint() // per-split agg + two straddle joins
        val perSplit = base
          .groupBy(col("csplit").as("split"))
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("cluster_id")).as("n_clusters"),
            sum(when(col("neardup"), 1L).otherwise(0L))
              .as("n_neardup_docs"))
        val sp = base.select(col("doc_id"), col("nsplit"), col("csplit"))
        val straddle = pairs
          .join(sp.select(col("doc_id").as("doc_a"),
            col("nsplit").as("na"), col("csplit").as("ca")), "doc_a")
          .join(sp.select(col("doc_id").as("doc_b"),
            col("nsplit").as("nb2"), col("csplit").as("cb2")), "doc_b")
          .agg(
            coalesce(sum(when(col("na") =!= col("nb2"), 1L)
              .otherwise(0L)), lit(0L)).as("naive_straddle_pairs"),
            coalesce(sum(when(col("ca") =!= col("cb2"), 1L)
              .otherwise(0L)), lit(0L)).as("cluster_straddle_pairs"))
        perSplit.crossJoin(broadcast(straddle))
          .select(col("split"), col("n_docs"), col("n_clusters"),
            col("n_neardup_docs"), col("naive_straddle_pairs"),
            col("cluster_straddle_pairs"))
      },
      Some(s"""WITH RECURSIVE $clusterCtes,
              |b2 AS MATERIALIZED (SELECT doc_id, cluster_id, neardup,
              |    CASE WHEN ${hashSql("'split:' || text")} % 100 < 90
              |      THEN 'train'
              |      WHEN ${hashSql("'split:' || text")} % 100 < 95
              |      THEN 'val' ELSE 'test' END AS nsplit,
              |    CASE WHEN ${hashSql(
        "'csplit:' || CAST(cluster_id AS VARCHAR)")} % 100 < 90
              |      THEN 'train'
              |      WHEN ${hashSql(
        "'csplit:' || CAST(cluster_id AS VARCHAR)")} % 100 < 95
              |      THEN 'val' ELSE 'test' END AS csplit
              |  FROM (SELECT b.*, d.text FROM bse b
              |        JOIN documents d USING (doc_id)) bx),
              |ps AS (SELECT csplit AS split,
              |    CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(count(DISTINCT cluster_id) AS BIGINT)
              |      AS n_clusters,
              |    CAST(sum(CASE WHEN neardup THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_neardup_docs
              |  FROM b2 GROUP BY csplit),
              |st AS (SELECT
              |    CAST(coalesce(sum(CASE WHEN x.nsplit <> y.nsplit
              |      THEN 1 ELSE 0 END), 0) AS BIGINT)
              |      AS naive_straddle_pairs,
              |    CAST(coalesce(sum(CASE WHEN x.csplit <> y.csplit
              |      THEN 1 ELSE 0 END), 0) AS BIGINT)
              |      AS cluster_straddle_pairs
              |  FROM pr JOIN b2 x ON pr.da = x.doc_id
              |    JOIN b2 y ON pr.db = y.doc_id)
              |SELECT split, n_docs, n_clusters, n_neardup_docs,
              |  naive_straddle_pairs, cluster_straddle_pairs
              |FROM ps CROSS JOIN st""".stripMargin)),

    // Source concentration: sources ranked by token mass ascending,
    // Lorenz cumulative share at each rank, corpus Gini. One corpus
    // scan aggregates to O(#sources) rows; every window after that is
    // over the tiny source frame (the unpartitioned-window warning is
    // the O(#sources) frame, not the corpus). Shares/Gini in exact
    // micro-units with `div` trees mirrored in the oracle; the
    // 2e6·Σ(rank·mass) product stays far under Long range while total
    // corpus tokens < ~4e12 per source count — at the 100 TB tier the
    // partial sums move to DECIMAL(38,0), same tree.
    QDef("q260_source_concentration",
      (s, dir) => {
        val mass = Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(size(tokens(col("text"))).cast("long"))
            .as("tok_mass"))
        val w = Window.orderBy(col("tok_mass").asc, col("source").asc)
        val ranked = mass
          .withColumn("rank", row_number().over(w).cast("long"))
          .withColumn("cum", sum(col("tok_mass")).over(
            w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
        val tot = ranked.agg(
          sum(col("tok_mass")).as("t"),
          count(lit(1)).as("n"),
          sum(col("rank") * col("tok_mass")).as("s2"))
        ranked.crossJoin(broadcast(tot))
          .select(col("source"), col("rank"), col("tok_mass"),
            expr("(1000000 * cum) div t").as("cum_share_micro"),
            (expr("(2000000 * s2) div (n * t)") -
              expr("(1000000 * (n + 1)) div n")).as("gini_micro"))
      },
      Some(s"""WITH m AS (SELECT source,
              |    CAST(sum(len($toksSql)) AS BIGINT) AS tok_mass
              |  FROM documents GROUP BY source),
              |r AS (SELECT source, tok_mass,
              |    CAST(row_number() OVER
              |      (ORDER BY tok_mass ASC, source ASC) AS BIGINT)
              |      AS rank,
              |    sum(tok_mass) OVER (ORDER BY tok_mass ASC, source ASC
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |      AS cum
              |  FROM m),
              |t AS (SELECT sum(tok_mass) AS t,
              |    CAST(count(*) AS BIGINT) AS n,
              |    sum(rank * tok_mass) AS s2 FROM r)
              |SELECT source, rank, tok_mass,
              |  CAST((1000000 * cum) // t AS BIGINT) AS cum_share_micro,
              |  CAST((2000000 * s2) // (n * t)
              |    - (1000000 * (n + 1)) // n AS BIGINT) AS gini_micro
              |FROM r CROSS JOIN t""".stripMargin)),

    // Dedup-discounted token budget: per source, raw token mass vs
    // the mass that survives keep-one-per-cluster (the representative
    // doc keeps its cluster's slot, attributed to ITS source — the
    // attribution real pipelines use, since the rep is the doc that
    // ships). discount_milli = kept/raw in exact milli-units: a
    // source of mostly mirrored content plans against a far smaller
    // unique budget than its raw count suggests. Same pair/component
    // machinery as q258; the per-source rollup is one aggregation
    // over the corpus scan joined to the tiny component map.
    QDef("q261_dedup_token_budget",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.nearDupMinhash(docs, "doc_id", "text",
          threshold = 0.8)
        val comp = ConnectedComponents.run(pairs, "doc_a", "doc_b")
          .withColumnRenamed("node", "doc_id")
        docs
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_toks"))
          .join(comp, Seq("doc_id"), "left")
          .withColumn("keep",
            coalesce(col("component"), col("doc_id")) === col("doc_id"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("n_toks")).as("raw_tokens"),
            sum(when(col("keep"), col("n_toks")).otherwise(0L))
              .as("kept_tokens"))
          .select(col("source"), col("n_docs"), col("n_kept"),
            col("raw_tokens"), col("kept_tokens"),
            expr("(1000 * kept_tokens) div greatest(raw_tokens, 1)")
              .as("discount_milli"))
      },
      Some(s"""WITH RECURSIVE $clusterCtes
              |SELECT source,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(CASE WHEN cluster_id = doc_id THEN 1 ELSE 0
              |    END) AS BIGINT) AS n_kept,
              |  CAST(sum(n_toks) AS BIGINT) AS raw_tokens,
              |  CAST(sum(CASE WHEN cluster_id = doc_id THEN n_toks
              |    ELSE 0 END) AS BIGINT) AS kept_tokens,
              |  CAST((1000 * sum(CASE WHEN cluster_id = doc_id
              |      THEN n_toks ELSE 0 END))
              |    // greatest(sum(n_toks), 1) AS BIGINT)
              |    AS discount_milli
              |FROM bse GROUP BY source""".stripMargin))
  )
}
