package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
import graft.ops.BpeTrainer
import graft.ops.VectorSearch._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  *  - q133: policy-lexicon tagging (Dolma-tagger shape) — per-doc
  *    per-category hit counts + a decision bitmask, computed in one
  *    scan with no explode.
  *  - q134: filter-funnel audit — per-rule fail/unique/marginal/
  *    survivor counts for an ordered quality-rule cascade, the table
  *    a curation review reads before anyone deletes data.
  *  - q135: positional inverted index — word-level postings
  *    (term, doc, tf, positions), the retrieval/decontamination
  *    artifact built once per corpus snapshot.
  *  - q136: tokenizer fertility audit — BPE pieces per whitespace
  *    word per source after k trained merges (tokenizer fit).
  *  - q137: source-overlap MinHash — per-source signatures folded in
  *    one agg, pairwise Jaccard estimates for dedup planning.
  *  - q138: hard-negative mining — per vector, the most-similar
  *    different-label neighbor within its k-means cell (contrastive
  *    training pairs), cell-bounded like q121.
  *
  * Integer rules as established: ranks in micro-units with `div`
  * division trees mirrored token-for-token in the oracles; rates in
  * milli-units; no float crosses an engine boundary (q138's cosine
  * follows the q29/q121 identical-IEEE-tree + round-6dp convention).
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

  /** MinHash signature width for the source-overlap sketch (q137). */
  private val OvH = 32

  // ---- vector fragments (lockstep with PipelineQueries7's copies) ----
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private def cosSql(a: String, b: String): String =
    VectorOracleSql.cos(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** DuckDB replay of [[graft.ops.VectorSearch.assignBest]] (the q106
    * pattern): descending (sim, cell) struct sort vs literal centroids.
    */
  private def cellsSql(centroids: Array[Array[Double]]): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
  }

  /** q138's late-bound oracle: trained-centroid literals (the q121
    * mechanism — Verify resolves oracle SQL after the query runs).
    */
  private object HardNegOracle { @volatile var sql: Option[String] = None }

  /** The q119 train-replay chain extended with a `source` carry and a
    * per-source fertility rollup (q136). Stages are token-for-token the
    * bpeApplyOracleSql shape: count pairs → pick max (cnt desc, pair
    * asc) → literal padded replace.
    */
  private def bpeFertilityOracleSql(k: Int): String = {
    val toksFrag = "list_filter(string_split(p, ' '), x -> x != '')"
    val pairsFrag = "CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(generate_series(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
    val stages = (1 to k).map { i =>
      s"""c$i AS (SELECT pair, count(*) AS cnt FROM (
         |  SELECT unnest($pairsFrag) AS pair FROM (
         |    SELECT $toksFrag AS toks FROM t${i - 1}) x) y GROUP BY pair),
         |m$i AS (SELECT pair FROM c$i
         |        ORDER BY cnt DESC, pair ASC LIMIT 1),
         |t$i AS (SELECT source, n_raw, replace(p,
         |    ' ' || (SELECT replace(pair, ' ', '  ') FROM m$i) || ' ',
         |    ' ' || (SELECT replace(pair, ' ', chr(31)) FROM m$i) || ' ')
         |    AS p
         |  FROM t${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH t0 AS (SELECT source, len($toksSql) AS n_raw,
       |  ' ' || array_to_string($toksSql, '  ') || ' ' AS p
       |  FROM documents),
       |$stages
       |SELECT source, CAST(sum(n_raw) AS BIGINT) AS n_words,
       |  CAST(sum(len($toksFrag)) AS BIGINT) AS n_bpe,
       |  CAST((1000 * sum(len($toksFrag))) // sum(n_raw) AS BIGINT)
       |    AS fertility_milli
       |FROM t$k GROUP BY source""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // Domain authority: PageRank over the domain co-citation graph
    // (domains linked by the same document share an undirected edge).
    // Scale shape: ONE corpus-scale pass builds (doc, domain); the
    // per-doc pair expansion is bounded by citations-per-doc squared;
    // everything after — nodes, degrees, rank vector, 3 power
    // iterations — is O(#domains + #edges) and never reads a document
    // again. The iteration plan is cardinality-gated in ops/PageRank:
    // broadcast rank joins under the gate, a once-partitioned
    // edge-resident shuffle shape above it (the 10⁷⁺-domain regime).
    // Ranks are integer micro-units (r0 = 1e6, teleport 0.15, damping
    // 0.85) with `div` trees mirrored in the oracle, so 3 iterations
    // are bit-identical across engines on either path.
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
        graft.ops.PageRank.domainRanks(nodes, edges, PrIters)
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
              |FROM e""".stripMargin)),

    // Policy-lexicon tagging (the Dolma-tagger shape): per-document,
    // per-category occurrence counts over small named lexicons plus a
    // decision bitmask. One scan, no explode — each category is a
    // size(filter(toks, In(...))) over the already-split token array,
    // codegen'd end to end; thresholds are integer milli-rates so the
    // mask arithmetic is engine-exact. Categories are configuration,
    // not code: the lexicons here exercise the operator over the
    // fixture vocabulary.
    QDef("q133_policy_tags",
      (s, dir) => {
        val d = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
        d.select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(filter(col("toks"), t => t.isin("slow", "fast")))
              .cast("long").as("c_latency"),
            size(filter(col("toks"), t => t.isin("big", "small")))
              .cast("long").as("c_size"),
            size(filter(col("toks"), t => t === "dup"))
              .cast("long").as("c_risk"))
          .withColumn("flags",
            when(col("n_tokens") > 0 &&
              expr("(1000 * c_latency) div n_tokens") >= 60, 1L)
              .otherwise(0L) +
            when(col("n_tokens") > 0 &&
              expr("(1000 * c_size) div n_tokens") >= 60, 2L)
              .otherwise(0L) +
            when(col("c_risk") >= 1, 4L).otherwise(0L))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |c AS (SELECT doc_id,
              |  CAST(len(toks) AS BIGINT) AS n_tokens,
              |  CAST(len(list_filter(toks, x -> x IN ('slow', 'fast')))
              |    AS BIGINT) AS c_latency,
              |  CAST(len(list_filter(toks, x -> x IN ('big', 'small')))
              |    AS BIGINT) AS c_size,
              |  CAST(len(list_filter(toks, x -> x = 'dup'))
              |    AS BIGINT) AS c_risk
              |  FROM t)
              |SELECT doc_id, n_tokens, c_latency, c_size, c_risk,
              |  CAST((CASE WHEN n_tokens > 0
              |          AND (1000 * c_latency) // n_tokens >= 60
              |          THEN 1 ELSE 0 END)
              |     + (CASE WHEN n_tokens > 0
              |          AND (1000 * c_size) // n_tokens >= 60
              |          THEN 2 ELSE 0 END)
              |     + (CASE WHEN c_risk >= 1 THEN 4 ELSE 0 END)
              |    AS BIGINT) AS flags
              |FROM c""".stripMargin)),

    // Filter-funnel audit: an ordered quality-rule cascade (min
    // length, stopword ratio, duplicated 3-grams, type-token ratio)
    // reported as the four numbers a curation review needs per rule —
    // total fails, unique fails (only this rule), marginal fails
    // (first rule in order to reject the doc), and cumulative
    // survivors. One corpus scan computes all four booleans (native
    // collection ops only — no per-token lambda on the hot path);
    // the sixteen sums fold in a single map-side-combined aggregate
    // and the per-rule rows unstack from ONE driver row.
    QDef("q134_filter_funnel",
      (s, dir) => {
        val flags = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
          // raw (multiset) 3-grams — shingles3 is set-semantics, which
          // would make tg == dg identically; `toks` is an attribute so
          // the lambda's element_at indexing doesn't re-split per gram
          .select(col("toks"), when(size(col("toks")) >= 3,
            transform(sequence(lit(1), size(col("toks")) - 2),
              i => concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1),
                element_at(col("toks"), i + 2))))
            .otherwise(array().cast("array<string>")).as("g"))
          .select(size(col("toks")).cast("long").as("n"),
            size(array_distinct(col("toks"))).cast("long").as("d"),
            size(filter(col("toks"), t => t.isin("the", "a")))
              .cast("long").as("st"),
            size(col("g")).cast("long").as("tg"),
            size(array_distinct(col("g"))).cast("long").as("dg"))
          .select(
            (col("n") < 40).as("f1"),
            (col("n") > 0 && expr("(1000 * st) div n") < 30).as("f2"),
            (col("tg") > 0 && expr("(1000 * (tg - dg)) div tg") >= 19)
              .as("f3"),
            (col("n") > 0 && expr("(1000 * d) div n") < 450).as("f4"))
          .withColumn("nf", col("f1").cast("long") + col("f2").cast("long")
            + col("f3").cast("long") + col("f4").cast("long"))
        val cnt = (c: org.apache.spark.sql.Column) =>
          sum(when(c, 1L).otherwise(0L))
        flags.agg(
            cnt(col("f1")).as("a1"),
            cnt(col("f1") && col("nf") === 1).as("u1"),
            cnt(col("f1")).as("m1"),
            cnt(!col("f1")).as("s1"),
            cnt(col("f2")).as("a2"),
            cnt(col("f2") && col("nf") === 1).as("u2"),
            cnt(col("f2") && !col("f1")).as("m2"),
            cnt(!col("f1") && !col("f2")).as("s2"),
            cnt(col("f3")).as("a3"),
            cnt(col("f3") && col("nf") === 1).as("u3"),
            cnt(col("f3") && !col("f1") && !col("f2")).as("m3"),
            cnt(!col("f1") && !col("f2") && !col("f3")).as("s3"),
            cnt(col("f4")).as("a4"),
            cnt(col("f4") && col("nf") === 1).as("u4"),
            cnt(col("f4") && !col("f1") && !col("f2") && !col("f3"))
              .as("m4"),
            cnt(!col("f1") && !col("f2") && !col("f3") && !col("f4"))
              .as("s4"))
          .selectExpr("""stack(4,
            'min_tokens',       a1, u1, m1, s1,
            'stopword_ratio',   a2, u2, m2, s2,
            'dup_3gram',        a3, u3, m3, s3,
            'type_token_ratio', a4, u4, m4, s4)
            as (rule, n_fail, n_unique, n_marginal, n_survivors)""")
      },
      Some(s"""WITH t AS (SELECT $toksSql AS toks FROM documents),
              |x AS (SELECT toks,
              |  CASE WHEN len(toks) >= 3 THEN
              |    list_transform(generate_series(1, len(toks) - 2),
              |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |    ELSE [] END AS g FROM t),
              |v AS (SELECT CAST(len(toks) AS BIGINT) AS n,
              |  CAST(len(list_distinct(toks)) AS BIGINT) AS d,
              |  CAST(len(list_filter(toks, k -> k IN ('the', 'a')))
              |    AS BIGINT) AS st,
              |  CAST(len(g) AS BIGINT) AS tg,
              |  CAST(len(list_distinct(g)) AS BIGINT) AS dg FROM x),
              |f AS (SELECT (n < 40) AS f1,
              |  (n > 0 AND (1000 * st) // n < 30) AS f2,
              |  (tg > 0 AND (1000 * (tg - dg)) // tg >= 19) AS f3,
              |  (n > 0 AND (1000 * d) // n < 450) AS f4 FROM v),
              |w AS (SELECT f1, f2, f3, f4,
              |  (CASE WHEN f1 THEN 1 ELSE 0 END +
              |   CASE WHEN f2 THEN 1 ELSE 0 END +
              |   CASE WHEN f3 THEN 1 ELSE 0 END +
              |   CASE WHEN f4 THEN 1 ELSE 0 END) AS nf FROM f),
              |agg AS (SELECT
              |  CAST(count(*) FILTER (f1) AS BIGINT) AS a1,
              |  CAST(count(*) FILTER (f1 AND nf = 1) AS BIGINT) AS u1,
              |  CAST(count(*) FILTER (f1) AS BIGINT) AS m1,
              |  CAST(count(*) FILTER (NOT f1) AS BIGINT) AS s1,
              |  CAST(count(*) FILTER (f2) AS BIGINT) AS a2,
              |  CAST(count(*) FILTER (f2 AND nf = 1) AS BIGINT) AS u2,
              |  CAST(count(*) FILTER (f2 AND NOT f1) AS BIGINT) AS m2,
              |  CAST(count(*) FILTER (NOT f1 AND NOT f2) AS BIGINT) AS s2,
              |  CAST(count(*) FILTER (f3) AS BIGINT) AS a3,
              |  CAST(count(*) FILTER (f3 AND nf = 1) AS BIGINT) AS u3,
              |  CAST(count(*) FILTER (f3 AND NOT f1 AND NOT f2)
              |    AS BIGINT) AS m3,
              |  CAST(count(*) FILTER (NOT f1 AND NOT f2 AND NOT f3)
              |    AS BIGINT) AS s3,
              |  CAST(count(*) FILTER (f4) AS BIGINT) AS a4,
              |  CAST(count(*) FILTER (f4 AND nf = 1) AS BIGINT) AS u4,
              |  CAST(count(*) FILTER (f4 AND NOT f1 AND NOT f2 AND NOT f3)
              |    AS BIGINT) AS m4,
              |  CAST(count(*) FILTER (NOT f1 AND NOT f2 AND NOT f3
              |    AND NOT f4) AS BIGINT) AS s4
              |  FROM w)
              |SELECT 'min_tokens' AS rule, a1 AS n_fail, u1 AS n_unique,
              |  m1 AS n_marginal, s1 AS n_survivors FROM agg
              |UNION ALL SELECT 'stopword_ratio', a2, u2, m2, s2 FROM agg
              |UNION ALL SELECT 'dup_3gram', a3, u3, m3, s3 FROM agg
              |UNION ALL SELECT 'type_token_ratio', a4, u4, m4, s4
              |  FROM agg""".stripMargin)),

    // Positional inverted index: word-level postings (term, doc, tf,
    // sorted position list) — the artifact retrieval (q90 BM25),
    // span-level decontamination (q98) and phrase queries read.
    // Shuffle key is the COMPOSITE (tok, doc_id): the hot term is
    // spread across its documents instead of landing on one reducer
    // (the per-term-key skew trap), and per-group state is bounded by
    // a single document's length. Positions serialize space-joined —
    // the engine-portable array form.
    QDef("q135_positional_index",
      (s, dir) => {
        val pos = Tables.documents(s, dir)
          .select(col("doc_id"),
            posexplode_outer(tokens(col("text"))).as(Seq("pos", "tok")))
          .filter(col("tok").isNotNull) // outer + generated-col guard
        pos.groupBy("tok", "doc_id")
          .agg(count(lit(1)).as("tf"),
            array_join(transform(array_sort(collect_list(col("pos"))),
              p => p.cast("string")), " ").as("positions"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |p AS (SELECT doc_id, unnest(toks) AS tok,
              |        unnest(generate_series(0, len(toks) - 1)) AS pos
              |      FROM t WHERE len(toks) > 0)
              |SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS tf,
              |  string_agg(CAST(pos AS VARCHAR), ' ' ORDER BY pos)
              |    AS positions
              |FROM p GROUP BY tok, doc_id""".stripMargin)),

    // Tokenizer fertility audit: BPE pieces per whitespace word, per
    // source, after k trained merges — the tokenizer-fit number that
    // decides whether a source needs its own vocabulary budget. Train
    // is the q99/q119 bounded-collect loop; apply is the one-scan
    // literal replace chain; the rollup is one tiny agg. Oracle
    // replays train AND apply end to end (the q119 guarantee), so a
    // drifted merge order fails the hash.
    QDef("q136_bpe_fertility",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val merges = BpeTrainer.trainArtifact(docs, "text", k = 5,
          fpKey = s"$dir#documents#text")
        docs.select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"), size(col("toks")).cast("long").as("nw"),
            size(BpeTrainer.applyMerges(col("toks"), merges))
              .cast("long").as("nb"))
          .groupBy("source")
          .agg(sum(col("nw")).as("n_words"), sum(col("nb")).as("n_bpe"))
          .withColumn("fertility_milli",
            expr("(1000 * n_bpe) div n_words"))
      },
      Some(bpeFertilityOracleSql(5))),

    // Source-overlap MinHash: per-source signatures (min over the
    // source's shingle-hash SET per affine seed) estimate pairwise
    // Jaccard between sources — the dedup-planning matrix that decides
    // which source pairs are worth a full cross-dedup pass (q112).
    // Scale shape: ONE corpus scan explodes shingles into a 32-column
    // min aggregate — map-side combined, state O(#sources × 32) — and
    // the pairwise compare runs over #sources rows. min is idempotent,
    // so cross-document duplicate shingles need no pre-distinct.
    QDef("q137_source_overlap",
      (s, dir) => {
        val sh = Tables.documents(s, dir)
          .select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"), explode(shingleHashes(col("toks"))).as("h"))
        val aggs = (0 until OvH).map { j =>
          val (a, b) = affineParam(j)
          min(expr(s"(h * ${a}L + ${b}L) % ${MinhashPrime}L")).as(s"s$j")
        }
        val sigs = sh.groupBy("source").agg(aggs.head, aggs.tail: _*)
          .select(col("source"),
            array((0 until OvH).map(j => col(s"s$j")): _*).as("sig"))
        sigs.select(col("source").as("src_a"), col("sig").as("sa"))
          .join(sigs.select(col("source").as("src_b"), col("sig").as("sb")),
            col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"),
            expr(s"(1000 * size(filter(zip_with(sa, sb, (x, y) -> x = y)," +
              s" v -> v))) div $OvH").as("est_milli"))
      },
      Some {
        val mins = (0 until OvH).map { j =>
          val (a, b) = affineParam(j)
          s"min((h * $a + $b) % ${MinhashPrime}) AS s$j"
        }.mkString(",\n  ")
        val arr = (0 until OvH).map(j => s"s$j").mkString("[", ", ", "]")
        s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
           |sh AS (SELECT source, unnest(list_distinct(list_transform(
           |    CASE WHEN len(toks) >= 3 THEN
           |      list_transform(generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           |      ELSE [] END,
           |    g -> cast('0x' || substr(md5(g), 1, 8) as bigint)))) AS h
           |  FROM t),
           |g AS (SELECT source,
           |  $mins
           |  FROM sh GROUP BY source),
           |sig AS (SELECT source, $arr AS sig FROM g)
           |SELECT a.source AS src_a, b.source AS src_b,
           |  CAST((1000 * len(list_filter(list_zip(a.sig, b.sig),
           |    z -> z[1] = z[2]))) // $OvH AS BIGINT) AS est_milli
           |FROM sig a JOIN sig b ON a.source < b.source""".stripMargin
      }),

    // Hard-negative mining: for every vector, the most-similar
    // DIFFERENT-label vector within its k-means cell — the
    // contrastive-pair generator for embedding training. Candidate
    // space is cell-bounded (the q121 IVF shape: O(n·cell) not
    // O(n²)); the per-vector argmax folds as max(struct(sim, -nb)) —
    // map-side combined, no per-cell window, ties to the smaller
    // neighbor id. Centroids train in-job; the oracle binds them as
    // literals (q121's late-bound mechanism).
    QDef("q138_hard_negatives",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val init = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 256, seed = 99),
          k = 8, iters = 0, seed = 99)
        val cents = lloydRoundsDistributed(emb, "vec_id", "embedding",
          init, rounds = 2)
        HardNegOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, label, $vSql AS v FROM embeddings),
             |a AS (SELECT vec_id, label, v,
             |        list_reverse_sort(${cellsSql(cents)})[1].cell AS cell
             |      FROM e),
             |c AS (SELECT x.vec_id, y.vec_id AS nb, y.label AS nl,
             |        ${cosSql("x.v", "y.v")} AS sim
             |      FROM a x JOIN a y
             |        ON x.cell = y.cell AND x.label <> y.label),
             |g AS (SELECT vec_id, count(*) AS n_cands,
             |        list_sort(list({'ns': -sim, 'nb': nb, 'nl': nl}))[1]
             |          AS t
             |      FROM c GROUP BY vec_id)
             |SELECT a.vec_id, CAST(a.label AS BIGINT) AS label, a.cell,
             |  CAST(coalesce(g.n_cands, 0) AS BIGINT) AS n_cands,
             |  CAST(coalesce(g.t.nb, -1) AS BIGINT) AS neg_id,
             |  CAST(coalesce(g.t.nl, -1) AS BIGINT) AS neg_label,
             |  coalesce(round(-g.t.ns, 6), -2.0) AS sim_r
             |FROM a LEFT JOIN g USING (vec_id)""".stripMargin)
        val e = emb.select(col("vec_id").as("id"),
            col("label").cast("long").as("label"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", norm(col("v")))
          .withColumn("cell", assignBest(col("v"), cents).getField("cell"))
          .localCheckpoint() // feeds candidate side, probe side, output
        val cand = e.select(col("cell"), col("id").as("nb"),
          col("label").as("nl"), col("v").as("vb"), col("nrm").as("nb_nrm"))
        val hn = e.join(cand, Seq("cell"))
          .filter(col("label") =!= col("nl"))
          .withColumn("sim",
            dot(col("v"), col("vb")) / (col("nrm") * col("nb_nrm")))
          .groupBy("id")
          .agg(count(lit(1)).as("n_cands"),
            max(struct(col("sim"), (-col("nb")).as("nnb"), col("nl")))
              .as("m"))
          .select(col("id"), col("n_cands"), (-col("m.nnb")).as("neg_id"),
            col("m.nl").as("neg_label"), round(col("m.sim"), 6).as("sim_r"))
        e.select(col("id").as("vec_id"), col("label"), col("cell"))
          .join(hn.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
          .select(col("vec_id"), col("label"), col("cell"),
            coalesce(col("n_cands"), lit(0L)).as("n_cands"),
            coalesce(col("neg_id"), lit(-1L)).as("neg_id"),
            coalesce(col("neg_label"), lit(-1L)).as("neg_label"),
            coalesce(col("sim_r"), lit(-2.0)).as("sim_r"))
      },
      None, Some(() => HardNegOracle.sql)),

    // Vocabulary-growth (Heaps'-law) audit: cumulative tokens, docs
    // and distinct-type counts at fixed corpus checkpoints — the curve
    // that sizes a tokenizer vocabulary and flags synthetic/templated
    // data (sub-Heaps growth). The sequential-looking "cumulative
    // distinct" decomposes embarrassingly: a type's first occurrence
    // is one groupBy-min, per-checkpoint news are one count, and the
    // only running sum is over the O(#checkpoints) bucket table —
    // bounded by config (bucket width scales with the corpus), never
    // by corpus size.
    QDef("q139_vocab_growth",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .localCheckpoint() // bucket agg + first-occurrence both read it
        val tb = t.select(expr("doc_id div 50").as("bucket"),
            size(col("toks")).cast("long").as("n"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("nd"), sum(col("n")).as("nt"))
        val nv = t.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("tok").agg(min(col("doc_id")).as("fd"))
          .select(expr("fd div 50").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("v"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tb.join(nv, Seq("bucket"), "left")
          .select(col("bucket"), col("nd"), col("nt"),
            coalesce(col("v"), lit(0L)).as("v"))
          .select(col("bucket"),
            sum("nd").over(w).as("n_docs_cum"),
            sum("nt").over(w).as("n_tokens_cum"),
            sum("v").over(w).as("vocab_cum"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |tb AS (SELECT doc_id // 50 AS bucket,
              |        CAST(count(*) AS BIGINT) AS nd,
              |        CAST(sum(len(toks)) AS BIGINT) AS nt
              |      FROM t GROUP BY 1),
              |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |fo AS (SELECT tok, min(doc_id) AS fd FROM e GROUP BY tok),
              |nv AS (SELECT fd // 50 AS bucket,
              |        CAST(count(*) AS BIGINT) AS v FROM fo GROUP BY 1),
              |j AS (SELECT tb.bucket, tb.nd, tb.nt, coalesce(nv.v, 0) AS v
              |      FROM tb LEFT JOIN nv USING (bucket))
              |SELECT bucket,
              |  CAST(sum(nd) OVER w AS BIGINT) AS n_docs_cum,
              |  CAST(sum(nt) OVER w AS BIGINT) AS n_tokens_cum,
              |  CAST(sum(v) OVER w AS BIGINT) AS vocab_cum
              |FROM j
              |WINDOW w AS (ORDER BY bucket
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin)),

    // MinHash estimator calibration: for every pair the q25 LSH
    // geometry surfaces at threshold 0.8, the signed error between the
    // 24-component signature estimate and exact Jaccard, histogrammed
    // in 25-milli buckets — the audit that justifies (or indicts) a
    // chosen signature width before a corpus-wide dedup run. One sig
    // table (checkpointed) feeds the band join and both verify sides;
    // err+1000 keeps the bucket division on non-negative ground
    // (DuckDB // floors, Spark div truncates — they only agree ≥ 0).
    // The oracle replays the 12x2 band-candidate filter (component
    // equality over the signature arrays), NOT all-pairs exact
    // Jaccard: both engines define the pair set identically, so the
    // hash gate is deterministic rather than resting on the banding's
    // (near-1 but probabilistic) recall at the threshold.
    QDef("q140_minhash_calibration",
      (s, dir) => {
        val sig = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), shingleHashes(col("toks")).as("hs"))
          .withColumn("mh", minhashAffine(col("hs"), 24))
          .localCheckpoint() // band join + both verify sides read it
        val bands = sig.select(col("doc_id"),
          explode(graft.ops.Dedup.bandKeyArray(col("mh"), 12, 2)).as("bk"))
        val cand = bands.as("x").join(bands.as("y"),
            col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
          .distinct()
        val a = sig.select(col("doc_id").as("doc_a"),
          col("hs").as("hs_a"), col("mh").as("mh_a"))
        val b = sig.select(col("doc_id").as("doc_b"),
          col("hs").as("hs_b"), col("mh").as("mh_b"))
        cand.join(a, "doc_a").join(b, "doc_b")
          .withColumn("inter",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
          .withColumn("uni", size(col("hs_a")).cast("long") +
            size(col("hs_b")).cast("long") - col("inter"))
          .filter(col("inter").cast("double") / col("uni").cast("double")
            >= 0.8)
          .withColumn("exact_milli", expr("(1000 * inter) div uni"))
          .withColumn("est_milli", expr("(1000 * size(filter(" +
            "zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v))) div 24"))
          .withColumn("err_bucket",
            expr("(est_milli - exact_milli + 1000) div 25"))
          .groupBy("err_bucket")
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some {
        val mins = (0 until 24).map { j =>
          val (a, b) = affineParam(j)
          s"list_min(list_transform(sh, h -> (h * $a + $b) % " +
            s"${MinhashPrime}))"
        }.mkString("[", ",\n  ", "]")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id, list_distinct(list_transform(
           |    CASE WHEN len(toks) >= 3 THEN
           |      list_transform(generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           |      ELSE [] END,
           |    g -> cast('0x' || substr(md5(g), 1, 8) as bigint))) AS sh
           |  FROM t WHERE len(toks) >= 3),
           |m AS (SELECT doc_id, sh, $mins AS sig FROM s),
           |p AS (SELECT len(list_intersect(a.sh, b.sh)) AS inter,
           |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
           |      AS uni,
           |    a.sig AS sa, b.sig AS sb
           |  FROM m a JOIN m b ON a.doc_id < b.doc_id
           |  WHERE len(list_filter(generate_series(1, 12), k ->
           |      a.sig[2*k-1] = b.sig[2*k-1] AND a.sig[2*k] = b.sig[2*k]))
           |    > 0
           |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           |    >= 0.8),
           |c AS (SELECT (1000 * inter) // uni AS exact_milli,
           |    (1000 * len(list_filter(list_zip(sa, sb),
           |      z -> z[1] = z[2]))) // 24 AS est_milli
           |  FROM p)
           |SELECT CAST((est_milli - exact_milli + 1000) // 25 AS BIGINT)
           |    AS err_bucket,
           |  CAST(count(*) AS BIGINT) AS n_pairs
           |FROM c GROUP BY 1""".stripMargin
      })
  )
}
