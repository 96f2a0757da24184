package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
import graft.ops.BpeTrainer.adjacentPairs
import graft.ops.TopK
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighteenth pipeline group — crawl-frontier curation on the
  * URL-carrying raw_docs fixture:
  *
  *  - q183: per-domain document quota (FineWeb/C4-style domain cap) —
  *    keep at most N docs per registrable domain in a deterministic
  *    hash order, report kept/dropped doc and token mass per domain.
  *    The cap runs through ops/TopK (partial/final per-group top-k),
  *    NOT a `row_number OVER (PARTITION BY domain)` window: at crawl
  *    scale one mega-domain (blogspot.com) is most of the corpus and
  *    a window would put it in one task.
  *  - q184: URL canonicalization + re-crawl dedup — lowercase
  *    scheme/host, strip fragments and tracking params (utm_*, ref,
  *    fbclid, gclid; genuine params survive in order), strip trailing
  *    slashes, then group re-crawls of one canonical URL. Every step
  *    is a regex/array builtin chosen to behave identically under
  *    Java regex (Spark) and RE2 (DuckDB) — no lookaround, no
  *    backrefs. One scan + one aggregation.
  */
object PipelineQueries18 {

  private def rawPq =
    s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  private def rawDocs(s: SparkSession): DataFrame =
    s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")

  /** Tracking-parameter pattern, shared verbatim with the oracle. */
  private val TrackPat = "^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="

  /** URL canonicalization as a Column pipeline (documented order:
    * de-fragment -> split query -> case-fold scheme+host -> strip
    * trailing slash -> drop tracking params, preserving the rest in
    * original order).
    */
  private[graft] def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_extract(noFrag, "^([^?]*)", 1)
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val schemeHost = lower(regexp_extract(base, "^([A-Za-z]+://[^/]*)", 1))
    val path = regexp_replace(
      regexp_replace(base, "^[A-Za-z]+://[^/]*", ""), "/+$", "")
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackPat))
    val qs = array_join(params, "&")
    concat(schemeHost, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** The same canonicalization in DuckDB SQL (kept in lockstep with
    * [[canonicalUrl]] — one step per line, same regexes).
    */
  private def canonicalUrlSql(u: String): String = {
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val base = s"regexp_extract($noFrag, '^([^?]*)', 1)"
    val query = s"regexp_extract($noFrag, '\\?(.*)$$', 1)"
    val schemeHost = s"lower(regexp_extract($base, '^([A-Za-z]+://[^/]*)', 1))"
    val path =
      s"regexp_replace(regexp_replace($base, '^[A-Za-z]+://[^/]*', ''), '/+$$', '')"
    // coalesce: DuckDB's array_to_string over an EMPTY list is NULL
    // (Spark's array_join is ''), and NULL would sink the whole concat
    val qs = s"coalesce(array_to_string(list_filter(string_split($query, " +
      s"'&'), p -> p != '' AND NOT regexp_matches(p, '$TrackPat')), '&'), '')"
    s"$schemeHost || $path || " +
      s"(CASE WHEN $qs = '' THEN '' ELSE '?' || $qs END)"
  }

  private val DomainCap = 6

  val defs: Seq[QDef] = Seq(

    // Per-domain quota: the order key is a content-free doc hash so
    // the kept set is reproducible across engines/runs and unbiased
    // w.r.t. crawl order. TopK's key struct carries n_toks through so
    // the kept-mass aggregate needs no join back to the corpus.
    QDef("q183_domain_cap",
      (s, _) => {
        val d = rawDocs(s).select(
          col("doc_id"),
          size(split(col("text"), lit(" "))).cast("long").as("n_toks"),
          lower(regexp_extract(col("url"), "^[A-Za-z]+://([^/?#]+)", 1))
            .as("domain"),
          tokenHash(concat(lit("cap:"), col("doc_id").cast("string")))
            .as("h"))
          .localCheckpoint() // totals agg + TopK share one scan
        val kept = TopK.perGroup(d, "domain",
          struct(col("h"), col("doc_id"), col("n_toks")), DomainCap)
          .groupBy("domain")
          .agg(count(lit(1)).as("n_kept"),
            sum(col("key.n_toks")).as("kept_toks"))
        d.groupBy("domain")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_toks"))
          .join(kept, "domain")
          .select(col("domain"), col("n_docs"), col("sum_toks"),
            col("n_kept"), col("kept_toks"),
            (col("n_docs") - col("n_kept")).as("n_dropped"))
      },
      Some(s"""WITH d AS (SELECT doc_id,
              |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
              |    lower(regexp_extract(url,
              |      '^[A-Za-z]+://([^/?#]+)', 1)) AS domain,
              |    cast('0x' || substr(md5('cap:' ||
              |      CAST(doc_id AS VARCHAR)), 1, 8) as bigint) AS h
              |  FROM $rawPq),
              |r AS (SELECT domain, n_toks,
              |    row_number() OVER (PARTITION BY domain
              |      ORDER BY h, doc_id) AS rn
              |  FROM d)
              |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_toks) AS BIGINT) AS sum_toks,
              |  CAST(sum(CASE WHEN rn <= $DomainCap THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_kept,
              |  CAST(sum(CASE WHEN rn <= $DomainCap THEN n_toks ELSE 0 END)
              |    AS BIGINT) AS kept_toks,
              |  CAST(count(*) - sum(CASE WHEN rn <= $DomainCap
              |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
              |FROM r GROUP BY domain""".stripMargin)),

    // Re-crawl dedup: group by canonical URL; the canonical doc is the
    // smallest doc_id (first crawl), n_variants counts distinct raw
    // spellings. One scan, one aggregation — at crawl scale this is
    // the cheap first dedup pass that runs BEFORE any content hash.
    QDef("q184_url_dedup",
      (s, _) => {
        rawDocs(s)
          .select(col("doc_id"), col("url"),
            canonicalUrl(col("url")).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("url")).as("n_variants"),
            min(col("doc_id")).as("canonical_doc"))
      },
      Some(s"""SELECT ${canonicalUrlSql("url")} AS canonical_url,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(count(DISTINCT url) AS BIGINT) AS n_variants,
              |  CAST(min(doc_id) AS BIGINT) AS canonical_doc
              |FROM $rawPq GROUP BY 1""".stripMargin)),

    // KMV (bottom-k) distinct sketch + sketch-based source overlap.
    // The third cardinality sketch next to HLL (q111) and Bloom
    // (q109): keep the K smallest distinct shingle hashes per source;
    // the K-th smallest estimates distinct count ((K-1)·2^32 div h_K
    // — hashes are uniform in [0, 2^32)), and the union sketch of two
    // sources gives a Jaccard estimate (share of the union's bottom-K
    // present in BOTH sketches) WITHOUT q137's corpus-mass pairwise
    // postings intersection — per-pair work is O(K), not O(postings).
    // The K-smallest-per-source selection is ops/TopK (bounded
    // partial/final, no per-source window); every estimator division
    // is exact integer arithmetic in both engines. Exact per-source
    // distinct counts ride along so the sketch error is visible.
    QDef("q185_kmv_distinct",
      (s, dir) => {
        val K = 256
        val sh = Tables.documents(s, dir)
          .select(col("source"), tokens(col("text")).as("toks"))
          .select(col("source"),
            explode(shingleHashes(col("toks"))).as("h"))
          .distinct()
          .localCheckpoint() // exact counts + sketch share it
        val exact = sh.groupBy("source").agg(count(lit(1)).as("n_exact"))
        val sk = TopK.perGroup(sh, "source", struct(col("h")), K)
          .groupBy("source")
          .agg(sort_array(collect_list(col("key.h"))).as("sk"))
          .join(exact, "source")
          .localCheckpoint() // self-joined into S(S-1)/2 pairs
        def kmvEst(skc: Column): Column =
          graft.ops.Sketches.kmvEstimate(skc, K)
        val a = sk.select(col("source").as("src_a"), col("sk").as("ska"),
          col("n_exact").as("n_a"))
        val b = sk.select(col("source").as("src_b"), col("sk").as("skb"),
          col("n_exact").as("n_b"))
        a.join(broadcast(b), col("src_a") < col("src_b"))
          .withColumn("uk",
            slice(array_sort(array_distinct(concat(col("ska"),
              col("skb")))), 1, K))
          .withColumn("n_inter", expr("cast(size(filter(uk, " +
            "y -> array_contains(ska, y) AND array_contains(skb, y))) " +
            "as long)"))
          .select(col("src_a"), col("src_b"), col("n_a"),
            kmvEst(col("ska")).as("est_a"), col("n_b"),
            kmvEst(col("skb")).as("est_b"),
            kmvEst(col("uk")).as("est_union"),
            expr("(1000 * n_inter) div size(uk)").as("jacc_milli"))
      },
      Some {
        val shingles =
          s"""CASE WHEN len(toks) >= 3 THEN
             |      list_distinct(list_transform(
             |        generate_series(1, len(toks) - 2),
             |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
             |      ELSE [] END""".stripMargin
        def est(sk: String) =
          s"CASE WHEN len($sk) < 256 THEN CAST(len($sk) AS BIGINT) " +
            s"ELSE (255 * 4294967296) // " +
            s"greatest(list_extract($sk, least(len($sk), 256)), 1) END"
        s"""WITH t AS (SELECT source, $toksSql AS toks FROM documents),
           |g AS (SELECT DISTINCT source, h FROM (
           |  SELECT source, unnest(list_transform($shingles,
           |    g -> ${hashSql("g")})) AS h FROM t) z),
           |x AS (SELECT source, CAST(count(*) AS BIGINT) AS n_exact,
           |    list_slice(list_sort(list(h)), 1, 256) AS sk
           |  FROM g GROUP BY source),
           |p AS (SELECT a.source AS src_a, b.source AS src_b,
           |    a.n_exact AS n_a, a.sk AS ska, b.n_exact AS n_b,
           |    b.sk AS skb,
           |    list_slice(list_sort(list_distinct(
           |      list_concat(a.sk, b.sk))), 1, 256) AS uk
           |  FROM x a JOIN x b ON a.source < b.source)
           |SELECT src_a, src_b, n_a, ${est("ska")} AS est_a,
           |  n_b, ${est("skb")} AS est_b, ${est("uk")} AS est_union,
           |  (1000 * CAST(len(list_filter(uk, y ->
           |    list_contains(ska, y) AND list_contains(skb, y)))
           |    AS BIGINT)) // len(uk) AS jacc_milli
           |FROM p""".stripMargin
      }),

    // Interpolated Kneser-Ney bigram scoring on the held-out split —
    // the LM-family capstone over q108 (MLE bigram), q162 (stupid
    // backoff) and q142 (the discount's count-of-counts): discount
    // D = N1/(N1+2N2) from TRAIN bigram counts, continuation
    // probability from distinct-history counts, and the interpolated
    // estimate max(c-D,0)/c(w1·) + D·N1+(w1·)/c(w1·)·Pcont(w2).
    // Unseen histories fall to Pcont alone; unseen w2 gets one
    // pseudo-continuation (the q162 coalesce convention). Scale shape
    // is q162's: count tables are vocabulary-sized broadcasts, only
    // the 5% held-out stream carries doc granularity, per-bigram
    // scores floor to milli-nats so per-doc sums are exact; the
    // double arithmetic inside ln() is mirrored op-for-op.
    QDef("q186_kn_score",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"),
            (tokenHash(concat(lit("kn:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .localCheckpoint() // train aggregates + val probe share it
        val big = t.filter(col("b") < 18)
          .select(explode(adjacentPairs(col("toks"))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("c2"))
          .withColumn("w1", element_at(split(col("pair"), " "), 1))
          .withColumn("w2", element_at(split(col("pair"), " "), 2))
          .localCheckpoint() // history/continuation/discount/probe share it
        val hist = big.groupBy("w1")
          .agg(count(lit(1)).as("n1plus"), sum("c2").as("h1tot"))
        val cont = big.groupBy("w2").agg(count(lit(1)).as("ncont"))
        // N1 = 0 happens: at 10x corpus the bigram space saturates and
        // no singleton bigrams remain (q142's closed-vocabulary trap,
        // one stratum up) — fall back to the standard fixed absolute
        // discount 0.75 (Chen & Goodman) instead of dividing by zero.
        val stats = big.agg(count(lit(1)).as("ntypes"),
          sum(when(col("c2") === 1, 1L).otherwise(0L)).as("dn"),
          sum(when(col("c2") === 2, 1L).otherwise(0L)).as("dn2"))
          .withColumn("dd", when(col("dn") === 0, lit(0.75))
            .otherwise(col("dn").cast("double") /
              (col("dn") + lit(2L) * col("dn2")).cast("double")))
        val valStream = t.filter(col("b") === 18)
          .select(col("doc_id"), col("toks"),
            posexplode(adjacentPairs(col("toks"))).as(Seq("pos", "pair")))
          .select(col("doc_id"), col("pair"),
            element_at(col("toks"), col("pos") + 1).as("w1"),
            element_at(col("toks"), col("pos") + 2).as("w2"))
        val pcont = coalesce(col("ncont"), lit(1L)).cast("double") /
          col("ntypes").cast("double")
        val dd = col("dd")
        val interp = (greatest(
          coalesce(col("c2"), lit(0L)).cast("double") - dd, lit(0.0)) +
          dd * col("n1plus").cast("double") * pcont) /
          col("h1tot").cast("double")
        valStream
          .join(big.select("pair", "c2"), Seq("pair"), "left")
          .join(broadcast(hist), Seq("w1"), "left")
          .join(broadcast(cont), Seq("w2"), "left")
          .crossJoin(broadcast(stats))
          .withColumn("mnat", floor(lit(1000.0) * log(
            when(col("n1plus").isNotNull, interp).otherwise(pcont)))
            .cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("mnat").as("smnat"),
            sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_unseen"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("(-smnat) div n_bigrams").as("nll_milli"),
            col("n_unseen"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks,
              |    ${hashSql("'kn:' || CAST(doc_id AS VARCHAR)")} % 20 AS b
              |  FROM documents),
              |bg AS (SELECT pair, count(*) AS c2 FROM (
              |    SELECT unnest(CASE WHEN len(toks) >= 2 THEN
              |      list_transform(generate_series(1, len(toks) - 1),
              |        i -> toks[i] || ' ' || toks[i+1])
              |      ELSE [] END) AS pair FROM t WHERE b < 18) y
              |  GROUP BY 1),
              |bgw AS (SELECT pair, c2,
              |    string_split(pair, ' ')[1] AS w1,
              |    string_split(pair, ' ')[2] AS w2 FROM bg),
              |h AS (SELECT w1, count(*) AS n1plus, sum(c2) AS h1tot
              |  FROM bgw GROUP BY 1),
              |nc AS (SELECT w2, count(*) AS ncont FROM bgw GROUP BY 1),
              |st0 AS (SELECT count(*) AS ntypes,
              |    sum(CASE WHEN c2 = 1 THEN 1 ELSE 0 END) AS dn,
              |    sum(CASE WHEN c2 = 2 THEN 1 ELSE 0 END) AS dn2
              |  FROM bg),
              |st AS (SELECT ntypes,
              |    CASE WHEN dn = 0 THEN 0.75::DOUBLE
              |      ELSE dn::DOUBLE / (dn + 2*dn2)::DOUBLE END AS dd
              |  FROM st0),
              |vs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
              |    toks[i] || ' ' || toks[i+1] AS pair
              |  FROM (SELECT doc_id, toks,
              |      unnest(generate_series(1, len(toks) - 1)) AS i
              |    FROM t WHERE b = 18 AND len(toks) >= 2) q),
              |sc AS (SELECT doc_id, bg.c2,
              |    CAST(floor(1000.0 * ln(CASE WHEN h.n1plus IS NOT NULL
              |      THEN (greatest(coalesce(bg.c2, 0)::DOUBLE - st.dd, 0.0)
              |        + st.dd * h.n1plus::DOUBLE
              |          * (coalesce(nc.ncont, 1)::DOUBLE
              |             / st.ntypes::DOUBLE))
              |        / h.h1tot::DOUBLE
              |      ELSE coalesce(nc.ncont, 1)::DOUBLE
              |        / st.ntypes::DOUBLE END)) AS BIGINT) AS mnat
              |  FROM vs LEFT JOIN bg USING (pair)
              |    LEFT JOIN h ON h.w1 = vs.w1
              |    LEFT JOIN nc ON nc.w2 = vs.w2
              |    CROSS JOIN st)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              |  CAST((-CAST(sum(mnat) AS BIGINT)) // count(*) AS BIGINT)
              |    AS nll_milli,
              |  CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_unseen
              |FROM sc GROUP BY 1""".stripMargin)),

    // Content-defined chunking (LBFS/FastCDC anchor style, token
    // granularity): a chunk boundary opens at every token whose hash
    // ≡ 0 (mod 16) — boundaries depend only on LOCAL content, so an
    // insertion re-chunks one neighborhood instead of shifting every
    // downstream chunk the way fixed-width blocks do (the property
    // q100's media segments lack, and the missing middle granularity
    // between q81's paragraphs and q101's every-gram spans). Expected
    // chunk ~16 tokens. The per-doc running cut count is a window
    // partitioned on doc_id — bounded by one document's length, the
    // q101 shape, never corpus-wide; chunk identity is a 60-bit hash
    // (collision-safe into the billions of distinct chunks) so the
    // global sharing table joins on longs.
    QDef("q187_cdc_chunks",
      (s, dir) => {
        val chunks = graft.ops.CdcChunks
          .chunks(Tables.documents(s, dir), "doc_id", "text", modulus = 16)
          .localCheckpoint() // global sharing counts + per-doc rollup
        val global = chunks.groupBy("ch")
          .agg(count_distinct(col("doc_id")).as("nd"))
        chunks.join(global, "ch")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"),
            sum("chunk_len").as("n_tokens"),
            sum(when(col("nd") > 1, 1L).otherwise(0L)).as("n_shared"))
          .select(col("doc_id"), col("n_chunks"), col("n_tokens"),
            col("n_shared"),
            expr("(1000 * n_shared) div n_chunks").as("shared_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
              |    CASE WHEN ${hashSql("toks[i]")} % 16 = 0
              |      THEN 1 ELSE 0 END AS cut
              |  FROM (SELECT doc_id, toks,
              |      unnest(generate_series(1, len(toks))) AS i FROM t) z),
              |c AS (SELECT doc_id, pos, tok,
              |    sum(cut) OVER (PARTITION BY doc_id ORDER BY pos)
              |      AS chunk_no
              |  FROM p),
              |chk AS (SELECT doc_id, chunk_no,
              |    ${hash60Sql("string_agg(tok, ' ' ORDER BY pos)")} AS ch,
              |    count(*) AS chunk_len
              |  FROM c GROUP BY 1, 2),
              |g AS (SELECT ch, count(DISTINCT doc_id) AS nd
              |  FROM chk GROUP BY 1)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
              |  CAST(sum(chunk_len) AS BIGINT) AS n_tokens,
              |  CAST(sum(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS n_shared,
              |  (1000 * CAST(sum(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END)
              |    AS BIGINT)) // count(*) AS shared_milli
              |FROM chk JOIN g USING (ch) GROUP BY doc_id""".stripMargin))
  )
}
