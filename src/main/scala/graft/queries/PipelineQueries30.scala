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

  /** DuckDB twins of TextAnalysis.tokens / tokenHash / ngramHashes
    * (lockstep with PipelineQueries' copies). */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"
  private def ngramSql(n: Int): String = {
    val cat = (0 until n).map(k => s"toks[i+$k]").mkString(" || ' ' || ")
    s"""list_distinct(list_transform(
       |  CASE WHEN len(toks) >= $n THEN
       |    list_transform(generate_series(1, len(toks) - ${n - 1}), i -> $cat)
       |  ELSE [] END,
       |  g -> ${hashSql("g")}))""".stripMargin
  }

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
        val pairs = Dedup.nearDupMinhashArtifact(docs, "doc_id", "text",
            fpKey = s"$dir#documents#id_text")
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
        val pairs = Dedup.nearDupMinhashArtifact(docs, "doc_id", "text",
          fpKey = s"$dir#documents#id_text")
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
              |FROM bse GROUP BY source""".stripMargin)),

    // Multi-benchmark decontamination scorecard — q70 generalized to
    // the realistic shape: a pipeline decontaminates against MANY
    // eval sets at once and reports per benchmark (a) how much of the
    // corpus each one taints and (b) how redundant the benchmarks are
    // with each other (shared grams → overlapping protection, a
    // second benchmark that adds no new exclusions). Three disjoint-
    // rule synthetic benchmarks (doc_id ≡ 0 mod 31/37/41 — a doc can
    // sit in several, as real eval suites overlap). One (doc, gram)
    // stream feeds every side; the tagged benchmark gram table is
    // broadcast into the corpus probe (eval sets are small by nature
    // — the 100 TB corpus side never shuffles); every rollup is over
    // O(#benchmarks) rows.
    QDef("q262_multi_benchmark_decon",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val notBench = (col("doc_id") % 31 =!= 0) &&
          (col("doc_id") % 37 =!= 0) && (col("doc_id") % 41 =!= 0)
        val grams = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(ngramHashes(col("toks"), 8)).as("g"))
          .localCheckpoint() // 3 bench sides + the probe side
        val benches = Seq(("mod31", 31L), ("mod37", 37L), ("mod41", 41L))
        val benchGrams = benches.map { case (nm, m) =>
            grams.filter(col("doc_id") % m === 0)
              .select(lit(nm).as("bench"), col("g")).distinct()
          }.reduce(_ unionByName _)
          .localCheckpoint() // probe join + overlap self-join + counts
        val gramCounts = benchGrams.groupBy("bench")
          .agg(count(lit(1)).as("n_grams"))
        val shared = benchGrams.as("a")
          .join(benchGrams.as("b"),
            col("a.g") === col("b.g") && col("a.bench") =!= col("b.bench"))
          .groupBy(col("a.bench").as("bench"))
          .agg(count_distinct(col("a.g")).as("n_shared_grams"))
        val hits = grams.filter(notBench)
          .join(broadcast(benchGrams), "g")
          .groupBy("bench")
          .agg(count_distinct(col("doc_id")).as("n_hit_docs"))
        val benchDocs = benches.map { case (nm, m) =>
            docs.filter(col("doc_id") % m === 0)
              .agg(lit(nm).as("bench"), count(lit(1)).as("n_bench_docs"))
          }.reduce(_ unionByName _)
        val nCorpus = docs.filter(notBench)
          .agg(count(lit(1)).as("nc"))
        benchDocs // every rollup frame is O(#benchmarks) — broadcast
          .join(broadcast(gramCounts), "bench")
          .join(broadcast(shared), Seq("bench"), "left")
          .join(broadcast(hits), Seq("bench"), "left")
          .crossJoin(broadcast(nCorpus))
          .select(col("bench"), col("n_bench_docs"), col("n_grams"),
            coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"),
            coalesce(col("n_hit_docs"), lit(0L)).as("n_hit_docs"),
            expr("(1000 * coalesce(n_hit_docs, 0)) div greatest(nc, 1)")
              .as("hit_rate_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |ga AS (SELECT doc_id, ${ngramSql(8)} AS gs FROM t),
              |g AS MATERIALIZED (
              |  SELECT doc_id, unnest(gs) AS g FROM ga),
              |bg AS MATERIALIZED (
              |  SELECT DISTINCT 'mod31' AS bench, g FROM g
              |    WHERE doc_id % 31 = 0
              |  UNION ALL SELECT DISTINCT 'mod37', g FROM g
              |    WHERE doc_id % 37 = 0
              |  UNION ALL SELECT DISTINCT 'mod41', g FROM g
              |    WHERE doc_id % 41 = 0),
              |gc AS (SELECT bench, CAST(count(*) AS BIGINT) AS n_grams
              |  FROM bg GROUP BY bench),
              |sh AS (SELECT a.bench,
              |    CAST(count(DISTINCT a.g) AS BIGINT) AS n_shared_grams
              |  FROM bg a JOIN bg b
              |    ON a.g = b.g AND a.bench <> b.bench
              |  GROUP BY a.bench),
              |h AS (SELECT bench,
              |    CAST(count(DISTINCT g.doc_id) AS BIGINT) AS n_hit_docs
              |  FROM g JOIN bg USING (g)
              |  WHERE g.doc_id % 31 <> 0 AND g.doc_id % 37 <> 0
              |    AND g.doc_id % 41 <> 0
              |  GROUP BY bench),
              |bd AS (SELECT 'mod31' AS bench,
              |    CAST(count(*) AS BIGINT) AS n_bench_docs
              |  FROM documents WHERE doc_id % 31 = 0
              |  UNION ALL SELECT 'mod37', count(*) FROM documents
              |    WHERE doc_id % 37 = 0
              |  UNION ALL SELECT 'mod41', count(*) FROM documents
              |    WHERE doc_id % 41 = 0),
              |nc AS (SELECT count(*) AS nc FROM documents
              |  WHERE doc_id % 31 <> 0 AND doc_id % 37 <> 0
              |    AND doc_id % 41 <> 0)
              |SELECT bd.bench, bd.n_bench_docs, gc.n_grams,
              |  CAST(coalesce(sh.n_shared_grams, 0) AS BIGINT)
              |    AS n_shared_grams,
              |  CAST(coalesce(h.n_hit_docs, 0) AS BIGINT) AS n_hit_docs,
              |  CAST((1000 * coalesce(h.n_hit_docs, 0))
              |    // greatest(nc.nc, 1) AS BIGINT) AS hit_rate_milli
              |FROM bd JOIN gc USING (bench)
              |  LEFT JOIN sh USING (bench) LEFT JOIN h USING (bench)
              |  CROSS JOIN nc""".stripMargin)),

    // Quasi-identifier k-anonymity audit — the privacy governance
    // number: how many documents sit in equivalence classes (same
    // lang, source, coarse length bucket) smaller than k=5, i.e. are
    // re-identifiable by their metadata alone. Two aggregations: the
    // corpus collapses to O(distinct QI tuples) class rows, then to
    // O(lang·source) report rows; no window ever touches the corpus.
    QDef("q263_k_anonymity",
      (s, dir) => {
        val classes = Tables.documents(s, dir)
          .select(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket"))
          .groupBy("lang", "source", "len_bucket")
          .agg(count(lit(1)).as("cn"))
        classes
          .groupBy("lang", "source")
          .agg(sum(col("cn")).as("n_docs"),
            count(lit(1)).as("n_classes"),
            min(col("cn")).as("min_class_size"),
            sum(when(col("cn") < 5, col("cn")).otherwise(0L))
              .as("n_small_class_docs"))
          .select(col("lang"), col("source"), col("n_docs"),
            col("n_classes"), col("min_class_size"),
            col("n_small_class_docs"),
            expr("(1000 * (n_docs - n_small_class_docs)) div n_docs")
              .as("k_anon_milli"))
      },
      Some("""WITH c AS (SELECT lang, source, n_chars // 100 AS len_bucket,
             |    CAST(count(*) AS BIGINT) AS cn
             |  FROM documents GROUP BY lang, source, len_bucket)
             |SELECT lang, source,
             |  CAST(sum(cn) AS BIGINT) AS n_docs,
             |  CAST(count(*) AS BIGINT) AS n_classes,
             |  CAST(min(cn) AS BIGINT) AS min_class_size,
             |  CAST(sum(CASE WHEN cn < 5 THEN cn ELSE 0 END) AS BIGINT)
             |    AS n_small_class_docs,
             |  CAST((1000 * (sum(cn) - sum(CASE WHEN cn < 5 THEN cn
             |    ELSE 0 END))) // sum(cn) AS BIGINT) AS k_anon_milli
             |FROM c GROUP BY lang, source""".stripMargin))
  )
}
