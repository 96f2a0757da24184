package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Forty-eighth pipeline group — corpus growth dynamics and
  * distance-based graph centrality:
  *
  *  - q311: token novelty curve. Split the corpus into ~20 arrival
  *    buckets (doc_id order is the ingest order in this data model)
  *    and ask, per bucket: how many token TYPES are seen for the first
  *    time, and what fraction of the bucket's token OCCURRENCES are
  *    those first-time types? The novelty rate is the operational
  *    "are we still learning new vocabulary?" signal that Heaps-law
  *    fitting (q139) summarizes but does not localize — a crawl whose
  *    novelty rate stops falling is ingesting churn, not content.
  *    One corpus pass builds (bucket, token) counts; first-occurrence
  *    buckets are a min-aggregation over that table; everything
  *    downstream is bucket-sized. The cumulative vocabulary window
  *    runs over the ~20 bucket rows — a bounded frame (house rule).
  *  - q312: landmark closeness centrality on the near-dup graph — the
  *    distance-based centrality the degree family (q129 PageRank,
  *    q211 HITS, q290 assortativity) cannot express: how FAR a
  *    document sits from the rest of its duplication neighborhood.
  *    Exact BFS from every node is O(V·E); the standard scale answer
  *    (Potamias et al., "Fast Shortest Path Distance Estimation in
  *    Large Networks", CIKM 2009) is a fixed set of landmark sources.
  *    Landmarks here are the 4 lowest doc-ids in the edge list
  *    (deterministic); BFS runs R=4 bounded rounds of frontier⋈edges
  *    joins (the q229 k-core round discipline — each round one
  *    hash join + min-aggregation, localCheckpointed so lineage stays
  *    flat). The oracle replays the identical bounded expansion with a
  *    depth-capped recursive CTE over the same exact-Jaccard pair
  *    list q25 pins.
  */
object PipelineQueries48 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"
  private val NBuckets = 20
  private val BfsRounds = 4
  private val NLandmarks = 4

  val defs: Seq[QDef] = Seq(

    QDef("q311_token_novelty",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val mx = docs.agg(max("doc_id").as("mx"))
        val tok = docs.crossJoin(broadcast(mx))
          .select(expr(s"doc_id div greatest(1L, (mx + $NBuckets) " +
            s"div $NBuckets)").as("bucket"),
            explode(tokens(col("text"))).as("tok"))
          .select(col("bucket"), tokenHash(col("tok")).as("h"))
        val bh = tok.groupBy("bucket", "h")
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds first-occurrence AND per-bucket
        val fb = bh.groupBy("h").agg(min("bucket").as("fb"))
        val perBucket = bh.join(fb, "h")
          .groupBy("bucket")
          .agg(sum("c").as("n_occ"),
            count(lit(1)).as("n_types"),
            sum(when(col("fb") === col("bucket"), 1L).otherwise(0L))
              .as("new_types"),
            sum(when(col("fb") === col("bucket"), col("c"))
              .otherwise(0L)).as("novel_occ"))
        // ~NBuckets rows: the cumulative window frame is bounded.
        val w = org.apache.spark.sql.expressions.Window
          .orderBy("bucket")
          .rowsBetween(org.apache.spark.sql.expressions
            .Window.unboundedPreceding, 0)
        perBucket
          .withColumn("cum_vocab", sum("new_types").over(w))
          .select(col("bucket"), col("n_occ"), col("n_types"),
            col("new_types"), col("cum_vocab"),
            expr("novel_occ * 1000000L div n_occ")
              .as("novelty_rate_micro"))
      },
      Some(s"""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
              |tok AS (SELECT doc_id // greatest(1,
              |      (mx.mx + $NBuckets) // $NBuckets) AS bucket,
              |    ${tokenHashSql.replace("__T__", "tok")} AS h
              |  FROM (SELECT doc_id, unnest($toksSql) AS tok
              |    FROM documents) d, mx),
              |bh AS MATERIALIZED (SELECT bucket, h,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM tok GROUP BY 1, 2),
              |fb AS (SELECT h, min(bucket) AS fb FROM bh GROUP BY 1),
              |pb AS (SELECT bucket,
              |    CAST(sum(c) AS BIGINT) AS n_occ,
              |    CAST(count(*) AS BIGINT) AS n_types,
              |    CAST(sum(CASE WHEN fb = bucket THEN 1 ELSE 0 END)
              |      AS BIGINT) AS new_types,
              |    CAST(sum(CASE WHEN fb = bucket THEN c ELSE 0 END)
              |      AS BIGINT) AS novel_occ
              |  FROM bh JOIN fb USING (h) GROUP BY 1)
              |SELECT bucket, n_occ, n_types, new_types,
              |  CAST(sum(new_types) OVER (ORDER BY bucket
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS BIGINT) AS cum_vocab,
              |  novel_occ * 1000000 // n_occ AS novelty_rate_micro
              |FROM pb""".stripMargin)),

    QDef("q312_landmark_closeness",
      (s, dir) => {
        val pairs = Dedup.nearDupMinhashArtifact(
          Tables.documents(s, dir), "doc_id", "text",
          fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
        val edges = pairs
          .unionByName(pairs.select(col("doc_b").as("doc_a"),
            col("doc_a").as("doc_b")))
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .localCheckpoint() // joined once per BFS round
        val landmarks = edges.select(col("src").as("l"))
          .distinct().orderBy("l").limit(NLandmarks)
          .localCheckpoint()
        // bounded-round BFS: dists holds the best-known (l, node, d);
        // each round expands the previous frontier one hop and folds
        // via min — R hash joins total, lineage flattened per round.
        var dists = landmarks.select(col("l"), col("l").as("n"),
          lit(0L).as("d"))
        var frontier = dists
        for (r <- 1 to BfsRounds) {
          val next = frontier.join(edges, col("n") === col("src"))
            .select(col("l"), col("dst").as("n"), lit(r.toLong).as("d"))
            .distinct()
          frontier = next.join(dists.select(col("l"), col("n"))
            .withColumn("seen", lit(1)), Seq("l", "n"), "left_anti")
            .localCheckpoint()
          dists = dists.unionByName(frontier).localCheckpoint()
        }
        dists.groupBy("l")
          .agg(count(lit(1)).as("n_reached"), sum("d").as("sum_dist"))
          .select(col("l").as("landmark"),
            (col("n_reached") - 1).as("n_reached"), col("sum_dist"),
            when(col("sum_dist") > 0,
              expr("(n_reached - 1) * 1000000L div sum_dist"))
              .otherwise(lit(0L)).as("closeness_micro"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks
              |  FROM documents),
              |sh AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |e AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst
              |    FROM p
              |  UNION ALL SELECT doc_b, doc_a FROM p),
              |lm AS (SELECT DISTINCT src AS l FROM e
              |  ORDER BY l LIMIT $NLandmarks),
              |bfs AS (WITH RECURSIVE x(l, n, d) AS (
              |    SELECT l, l, CAST(0 AS BIGINT) FROM lm
              |    UNION
              |    SELECT x.l, e.dst, x.d + 1 FROM x JOIN e
              |      ON e.src = x.n WHERE x.d < $BfsRounds)
              |  SELECT l, n, min(d) AS d FROM x GROUP BY 1, 2)
              |SELECT l AS landmark,
              |  CAST(count(*) - 1 AS BIGINT) AS n_reached,
              |  CAST(sum(d) AS BIGINT) AS sum_dist,
              |  CASE WHEN CAST(sum(d) AS BIGINT) > 0 THEN
              |    CAST(count(*) - 1 AS BIGINT) * 1000000
              |      // CAST(sum(d) AS BIGINT)
              |    ELSE 0 END AS closeness_micro
              |FROM bfs GROUP BY 1""".stripMargin))
  )
}
