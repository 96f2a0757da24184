package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighth pipeline group — corpus governance: the operators that turn
  * a curated corpus into a *managed* training set.
  *
  *  - q129: domain authority (PageRank over the URL co-citation
  *    graph) — FineWeb-style domain-level quality priors. The corpus
  *    is touched ONCE (doc → domain extraction); the graph and rank
  *    vector are O(#domains) and the power iterations never see a
  *    document again.
  *  - q130: OOV-rate audit — an incoming batch measured against the
  *    training corpus's vocabulary, the tokenizer-fit check run
  *    before admitting new data into the mix.
  *  - q131: deterministic content-hash split manifest — train/val/
  *    test assignment by CONTENT hash (identical texts can never
  *    straddle splits, the leak the doc-id split has), plus the
  *    per-source manifest the split ships with.
  *  - q132: epoch-repeat schedule (data echoing) — low-resource
  *    sources replayed up to a cap to approach the largest source's
  *    token count; the materialized (doc, epoch) stream each training
  *    shard reads.
  *
  * Integer rules as established: ranks in micro-units with `div`
  * division trees mirrored token-for-token in the oracles; rates in
  * milli-units; no float crosses an engine boundary.
  */
object PipelineQueries8 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  /** raw_docs text has \n\n paragraph breaks: whitespace-class split. */
  private val rtoksSql =
    "list_filter(string_split_regex(text, '\\s+'), x -> x != '')"

  private val rawPq =
    s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"

  private def rawDocs(s: SparkSession): DataFrame =
    s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")

  /** PageRank power iterations (fixed count — the production shape is
    * iterate-to-epsilon, but a fixed k keeps the oracle replayable).
    */
  private val PrIters = 3

  val defs: Seq[QDef] = Seq(

    // Domain authority: PageRank over the domain co-citation graph
    // (domains linked by the same document share an undirected edge).
    // Scale shape: ONE corpus-scale pass builds (doc, domain); the
    // per-doc pair expansion is bounded by citations-per-doc squared;
    // everything after — nodes, degrees, rank vector, 3 power
    // iterations — is O(#domains + #edges), broadcast-joined, and
    // never reads a document again. Ranks are integer micro-units
    // (r0 = 1e6, teleport 0.15, damping 0.85) with `div` trees
    // mirrored in the oracle, so 3 iterations are bit-identical
    // across engines.
    QDef("q129_domain_pagerank",
      (s, _) => {
        val raw = rawDocs(s)
        val perDoc = raw
          .select(col("doc_id"),
            array_distinct(regexp_extract_all(col("text"),
              lit("https?://([a-z0-9.-]+)/"), lit(1))).as("ds"))
          .filter(size(col("ds")) > 0)
          .localCheckpoint() // nodes + edges both read it
        val nodes = perDoc
          .select(explode(col("ds")).as("domain")).distinct()
        val edges = perDoc
          .select(explode(col("ds")).as("src"), col("ds"))
          .select(col("src"), explode(col("ds")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint() // deg + every iteration read it
        val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
          .localCheckpoint()
        var ranks = nodes.withColumn("r", lit(1000000L))
        for (_ <- 1 to PrIters) {
          val acc = edges
            .join(broadcast(ranks.withColumnRenamed("domain", "src")), "src")
            .join(broadcast(deg), "src")
            .select(col("dst").as("domain"), expr("r div deg").as("c"))
            .groupBy("domain").agg(sum(col("c")).as("acc"))
          ranks = nodes.join(broadcast(acc), Seq("domain"), "left")
            .select(col("domain"),
              (lit(150000L) +
                expr("(85 * coalesce(acc, 0L)) div 100")).as("r"))
        }
        ranks
          .join(broadcast(deg.withColumnRenamed("src", "domain")),
            Seq("domain"), "left")
          .select(col("domain"), coalesce(col("deg"), lit(0L)).as("deg"),
            col("r").as("r_micro"))
      },
      Some {
        val iters = (1 to PrIters).map { i =>
          s"""r$i AS (SELECT n.domain,
             |  150000 + (85 * COALESCE(s.acc, 0)) // 100 AS r
             |  FROM n LEFT JOIN (
             |    SELECT e.dst AS domain, SUM(r${i - 1}.r // d.deg) AS acc
             |    FROM e JOIN r${i - 1} ON e.src = r${i - 1}.domain
             |           JOIN d ON e.src = d.src
             |    GROUP BY e.dst) s USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""WITH dd AS (SELECT DISTINCT doc_id, domain FROM (
           |  SELECT doc_id, unnest(regexp_extract_all(text,
           |    'https?://([a-z0-9.-]+)/', 1)) AS domain FROM $rawPq)),
           |n AS (SELECT DISTINCT domain FROM dd),
           |e AS (SELECT DISTINCT a.domain AS src, b.domain AS dst
           |      FROM dd a JOIN dd b USING (doc_id)
           |      WHERE a.domain <> b.domain),
           |d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
           |r0 AS (SELECT domain, CAST(1000000 AS BIGINT) AS r FROM n),
           |$iters
           |SELECT n.domain, CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
           |  CAST(r$PrIters.r AS BIGINT) AS r_micro
           |FROM n LEFT JOIN d ON n.domain = d.src
           |       JOIN r$PrIters ON n.domain = r$PrIters.domain"""
          .stripMargin
      }),

    // OOV-rate audit: the incoming raw_docs batch measured against
    // the training corpus's vocabulary — run BEFORE admission to
    // catch tokenizer drift (a batch whose tokens the vocab can't
    // cover inflates <unk> mass no matter how clean it looks). The
    // vocabulary is tiny relative to the corpus → broadcast; the
    // batch is scanned once; per-doc rates are integer milli-units.
    QDef("q130_oov_rate",
      (s, dir) => {
        val vocab = Tables.documents(s, dir)
          .select(explode(tokens(col("text"))).as("tok")).distinct()
          .withColumn("iv", lit(1))
        val rtoks = rawDocs(s)
          .select(col("doc_id"),
            filter(split(col("text"), "\\s+"), t => t =!= lit(""))
              .as("toks"))
          .select(col("doc_id"), explode(col("toks")).as("tok"))
        rtoks.join(broadcast(vocab), Seq("tok"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("iv").isNull, 1L).otherwise(0L)).as("n_oov"))
          .withColumn("oov_milli", expr("(1000 * n_oov) div n_tokens"))
          .select(col("doc_id"), col("n_tokens"), col("n_oov"),
            col("oov_milli"))
      },
      Some(s"""WITH v AS (SELECT DISTINCT unnest($toksSql) AS tok
              |          FROM documents),
              |rt AS (SELECT doc_id, unnest($rtoksSql) AS tok FROM $rawPq)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
              |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_oov,
              |  CAST((1000 * sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0
              |    END)) // count(*) AS BIGINT) AS oov_milli
              |FROM rt LEFT JOIN v USING (tok)
              |GROUP BY doc_id""".stripMargin)),

    // Deterministic train/val/test split + manifest. The split key is
    // the CONTENT hash, not the doc id: byte-identical documents land
    // in the same split by construction, closing the exact-dup
    // train/test leak a row-id split has (near-dups are q98/q112's
    // job upstream). 90/5/5 on hash mod 100 — scan-only assignment,
    // stable under re-runs, re-partitioning, and corpus growth; the
    // manifest agg is the only (tiny) shuffle.
    QDef("q131_split_manifest",
      (s, dir) => {
        val h = tokenHash(concat(lit("split:"), col("text")))
        Tables.documents(s, dir)
          .select(col("source"),
            size(tokens(col("text"))).cast("long").as("n_toks"),
            pmod(h, lit(100L)).as("b"))
          .withColumn("split",
            when(col("b") < 90, lit("train"))
              .when(col("b") < 95, lit("val")).otherwise(lit("test")))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
          .select(col("source"), col("split"), col("n_docs"),
            col("n_tokens"))
      },
      Some(s"""WITH t AS (SELECT source,
              |  CAST(len($toksSql) AS BIGINT) AS n_toks,
              |  cast('0x' || substr(md5('split:' || text), 1, 8)
              |    as bigint) % 100 AS b
              |  FROM documents),
              |a AS (SELECT source, CASE WHEN b < 90 THEN 'train'
              |    WHEN b < 95 THEN 'val' ELSE 'test' END AS split,
              |    n_toks FROM t)
              |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_toks) AS BIGINT) AS n_tokens
              |FROM a GROUP BY source, split""".stripMargin)),

    // Epoch-repeat schedule (data echoing): each source is replayed
    // ceil(T / tokens_src) times — T = the largest source's token
    // count — capped at 4 epochs, the standard low-resource upweight
    // (UniMax q95 decides TARGETS; this materializes the repeats).
    // The factor table is one row per source, derived in-job and
    // broadcast back (the q83 shape); the corpus is scanned once and
    // the explode multiplies rows only at emission. Every (doc,
    // epoch) gets a deterministic order hash so shards stream the
    // repeats interleaved, not back-to-back.
    QDef("q132_epoch_schedule",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n"))
          .localCheckpoint() // factor agg + emission both read it
        val st = t.groupBy("source").agg(sum(col("n")).as("st"))
        val tMax = st.agg(max(col("st")).as("tm"))
        val factors = st.crossJoin(broadcast(tMax))
          .select(col("source"),
            least(expr("(tm + st - 1) div st"), lit(4L)).as("epochs"))
        t.join(broadcast(factors), "source")
          .select(col("source"), col("doc_id"),
            explode(sequence(lit(0L), col("epochs") - 1)).as("epoch"))
          .withColumn("pos_h",
            tokenHash(concat(lit("ep:"), col("epoch").cast("string"),
              lit(":"), col("doc_id").cast("string"))))
          .select(col("source"), col("doc_id"), col("epoch"),
            col("pos_h"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id,
              |  CAST(len($toksSql) AS BIGINT) AS n FROM documents),
              |s AS (SELECT source, sum(n) AS st FROM t GROUP BY source),
              |m AS (SELECT max(st) AS tm FROM s),
              |f AS (SELECT source,
              |  CAST(least((tm + st - 1) // st, 4) AS BIGINT) AS epochs
              |  FROM s CROSS JOIN m),
              |e AS (SELECT t.source, t.doc_id,
              |  unnest(generate_series(0, f.epochs - 1)) AS epoch
              |  FROM t JOIN f USING (source))
              |SELECT source, doc_id, CAST(epoch AS BIGINT) AS epoch,
              |  cast('0x' || substr(md5('ep:' ||
              |    CAST(epoch AS VARCHAR) || ':' ||
              |    CAST(doc_id AS VARCHAR)), 1, 8) as bigint) AS pos_h
              |FROM e""".stripMargin))
  )
}
