package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cleaning- and mixing-stage pipeline operators: over the
  * paragraph-structured `raw_docs` fixture (crawl-shaped text the
  * word-soup `documents` table cannot express) — PII redaction,
  * paragraph-level exact dedup (the Lee-et-al-style substring dedup at
  * paragraph granularity), URL/domain blocklist filtering; and over
  * `documents` — temperature-based language rebalancing and per-source
  * token-budget selection (the data-mixing steps between "clean" and
  * "emit shards").
  *
  * All regex patterns are ASCII-simple by construction so the Java
  * regex engine (Spark) and RE2 (DuckDB) agree on every match; the
  * fixture generator plants only content both engines tokenize
  * identically.
  */
object PipelineQueries2 {

  private val rawPq =
    s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"

  private def rawDocs(s: SparkSession): DataFrame =
    s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")

  // PII / URL patterns shared with the SQL surface (graft_pii_redact)
  private val EmailPat = graft.functions.TextAnalysis.EmailPat
  private val UrlPat = graft.functions.TextAnalysis.UrlPat
  private val IpPat = graft.functions.TextAnalysis.IpPat
  private val PhonePat = graft.functions.TextAnalysis.PhonePat

  /** Domain blocklist (spam/SEO-farm stand-in). Plan-time constant: at
    * scale a real list is a broadcast lookup, but membership against a
    * bounded list is cheaper still as a literal array filter.
    */
  private val BlockedDomains = Seq(
    "site3.example.com", "site7.example.com", "blog-2.test.org")

  /** DuckDB twin of TextAnalysis.tokens (lockstep with PipelineQueries). */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  val defs: Seq[QDef] = Seq(

    // PII redaction — the scrubbing pass before anything is retained:
    // per-category match counts (on the original text) plus the
    // redacted text. One scan, all codegen'd regexp builtins, no
    // shuffle; at 100 TB this fuses with the quality gates (q74/q77)
    // into the same first filter stage. Counts are taken per category
    // independently and redaction applies email -> url -> ip -> phone;
    // the patterns are mutually non-overlapping on every category pair
    // (emails contain '@', URLs contain '://', IPs need dotted quads,
    // phones exclude dots), so the sequence cannot double-redact.
    QDef("q80_pii_redact",
      (s, _) => {
        val redacted = redactPii(col("text"))
        rawDocs(s).select(col("doc_id"),
          regexp_count(col("text"), lit(EmailPat)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(PhonePat)).cast("long").as("n_phones"),
          regexp_count(col("text"), lit(IpPat)).cast("long").as("n_ips"),
          regexp_count(col("text"), lit(UrlPat)).cast("long").as("n_urls"),
          redacted.as("redacted"))
          .withColumn("pii_free",
            col("n_emails") + col("n_phones") + col("n_ips") === 0)
      },
      Some(s"""SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '$EmailPat')) AS BIGINT)
              |    AS n_emails,
              |  CAST(len(regexp_extract_all(text, '$PhonePat')) AS BIGINT)
              |    AS n_phones,
              |  CAST(len(regexp_extract_all(text, '$IpPat')) AS BIGINT)
              |    AS n_ips,
              |  CAST(len(regexp_extract_all(text, '$UrlPat')) AS BIGINT)
              |    AS n_urls,
              |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              |    text, '$EmailPat', '<EMAIL>', 'g'),
              |    '$UrlPat', '<URL>', 'g'),
              |    '$IpPat', '<IP>', 'g'),
              |    '$PhonePat', '<PHONE>', 'g') AS redacted,
              |  len(regexp_extract_all(text, '$EmailPat'))
              |    + len(regexp_extract_all(text, '$PhonePat'))
              |    + len(regexp_extract_all(text, '$IpPat')) = 0 AS pii_free
              |FROM $rawPq""".stripMargin)),

    // Paragraph-level exact dedup (Lee et al.'s dedup granularity,
    // paragraph instead of suffix): every paragraph keeps only its
    // GLOBAL first occurrence in (doc_id, pos) order; documents are
    // reassembled from surviving paragraphs. Scale shape: first
    // occurrence is a groupBy-min on the paragraph hash — partial
    // aggregation absorbs mega-duplicated boilerplate map-side, where
    // a window over the hash would put one boilerplate paragraph's
    // billion occurrences into a single task. The rejoin is keyed on
    // the same hash (co-partitioned with the agg); rebuild is one
    // groupBy over surviving rows. Order encodes as one long
    // (doc_id * 1e6 + pos) so min() needs no struct comparator and the
    // DuckDB twin is a plain min — assumes < 1e6 paragraphs per doc
    // (far beyond any real document; widen the factor if violated).
    QDef("q81_para_dedup",
      (s, _) => {
        val paras = rawDocs(s)
          .select(col("doc_id"),
            posexplode(split(col("text"), lit("\n\n"))).as(Seq("pos", "para")))
          .withColumn("ph", md5(col("para")))
          .withColumn("ord",
            col("doc_id") * 1000000L + col("pos").cast("long"))
        val firstOcc = paras.groupBy("ph").agg(min("ord").as("first_ord"))
        val kept = paras.join(firstOcc, "ph")
          .filter(col("ord") === col("first_ord"))
        val rebuilt = kept.groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          concat_ws("\n\n",
            transform(array_sort(collect_list(struct(col("pos"), col("para")))),
              p => p.getField("para"))).as("text_kept"))
        rawDocs(s)
          .select(col("doc_id"),
            size(split(col("text"), lit("\n\n"))).cast("long").as("n_paras"))
          .join(rebuilt, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_paras"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("text_kept"), lit("")).as("text_kept"))
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps
              |  FROM $rawPq),
              |p AS (
              |  SELECT doc_id, unnest(ps) AS para,
              |    unnest(generate_series(0, len(ps) - 1)) AS pos
              |  FROM d),
              |o AS (SELECT doc_id, para, pos,
              |  doc_id * 1000000 + pos AS ord, md5(para) AS ph FROM p),
              |f AS (SELECT ph, min(ord) AS first_ord FROM o GROUP BY ph),
              |k AS (SELECT o.* FROM o JOIN f ON o.ph = f.ph
              |      AND o.ord = f.first_ord),
              |r AS (SELECT doc_id, count(*) AS n_kept,
              |  string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text_kept
              |  FROM k GROUP BY doc_id)
              |SELECT d.doc_id, CAST(len(d.ps) AS BIGINT) AS n_paras,
              |  CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
              |  coalesce(r.text_kept, '') AS text_kept
              |FROM d LEFT JOIN r USING (doc_id)""".stripMargin)),

    // URL/domain blocklist filter: extract every linked domain, count
    // blocklist hits, emit the distinct domain set (sorted, joined —
    // LIST cells break the driver's hash gate). Pure scan: the
    // extraction and membership test are array builtins over each row,
    // no explode, no shuffle.
    QDef("q82_domain_filter",
      (s, _) => {
        val domains = regexp_extract_all(col("text"), lit(UrlPat), lit(0))
        val hostOf = (u: org.apache.spark.sql.Column) =>
          regexp_extract(u, "https?://([A-Za-z0-9.-]+)", 1)
        val hosts = transform(domains, u => hostOf(u))
        val blocked = filter(hosts,
          h => array_contains(array(BlockedDomains.map(lit): _*), h))
        rawDocs(s).select(col("doc_id"),
          size(domains).cast("long").as("n_urls"),
          size(blocked).cast("long").as("n_blocked"),
          array_join(array_sort(array_distinct(hosts)), ",").as("domains"))
          .withColumn("pass", col("n_blocked") === 0)
      },
      Some {
        val blockLit = BlockedDomains.map(d => s"'$d'").mkString("[", ", ", "]")
        s"""WITH t AS (
           |  SELECT doc_id,
           |    list_transform(regexp_extract_all(text, '$UrlPat'),
           |      u -> regexp_extract(u, 'https?://([A-Za-z0-9.-]+)', 1))
           |      AS hosts
           |  FROM $rawPq)
           |SELECT doc_id,
           |  CAST(len(hosts) AS BIGINT) AS n_urls,
           |  CAST(len(list_filter(hosts, h -> list_contains($blockLit, h)))
           |    AS BIGINT) AS n_blocked,
           |  coalesce(array_to_string(list_sort(list_distinct(hosts)), ','), '')
           |    AS domains,
           |  len(list_filter(hosts, h -> list_contains($blockLit, h))) = 0
           |    AS pass
           |FROM t""".stripMargin
      }),

    // Temperature-based language rebalancing (the multilingual mixing
    // rule): with alpha = 0.5, language l keeps rate_l =
    // sqrt(n_min / n_l) — the smallest language keeps everything,
    // dominant languages are downsampled toward the flattened
    // distribution. Rates are derived FROM the corpus in the same job
    // (one tiny groupBy broadcast back at the scan) and acceptance is
    // the salted content-independent hash (q71's primitive) — no RNG,
    // reproducible across engines and partitionings. Every arithmetic
    // step (double divide, sqrt, floor) is IEEE-754-exact, so the
    // per-language ppm rates are bit-identical cross-engine.
    QDef("q83_temperature_resample",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        val minN = counts.agg(min("n").as("mn"))
        val rates = counts.crossJoin(broadcast(minN))
          .select(col("lang"),
            floor(sqrt(col("mn").cast("double") / col("n").cast("double"))
              * 1000000).cast("long").as("rate_ppm"))
        val h = tokenHash(concat(lit("tmp:"), col("doc_id").cast("string")))
        docs.join(broadcast(rates), "lang")
          .filter(h % 1000000 < col("rate_ppm"))
          .select(col("doc_id"), col("lang"), col("rate_ppm"))
      },
      Some(s"""WITH c AS (SELECT lang, count(*) AS n FROM documents
              |  GROUP BY lang),
              |m AS (SELECT min(n) AS mn FROM c),
              |r AS (SELECT lang,
              |  CAST(floor(sqrt(mn::DOUBLE / n::DOUBLE) * 1000000) AS BIGINT)
              |    AS rate_ppm
              |  FROM c CROSS JOIN m)
              |SELECT d.doc_id, d.lang, r.rate_ppm
              |FROM documents d JOIN r USING (lang)
              |WHERE ${hashSql("'tmp:' || CAST(doc_id AS VARCHAR)")} % 1000000
              |  < r.rate_ppm""".stripMargin)),

    // Per-source token-budget selection — "take the first B tokens of
    // each source in deterministic shuffle order": docs are ordered
    // within source by the salted hash (a reproducible shuffle), and
    // the greedy prefix whose preceding token count is under the
    // budget is kept (the boundary-crossing doc is included — the
    // training pipeline truncates it downstream). The running sum uses
    // the q72/q75 two-level construction — shard = high hash bits
    // (monotone in the sort key), per-shard sums in parallel, O(#shards)
    // broadcast offsets — because a per-source window would put an
    // entire source (most of the corpus, for a dominant crawl) into
    // one task at 100 TB.
    QDef("q84_token_budget_mix",
      (s, dir) => {
        val budget = 400L
        val h = tokenHash(concat(lit("mix:"), col("doc_id").cast("string")))
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("n_tokens"),
            h.as("h"))
          .withColumn("shard", floor(col("h") / lit(1L << 24)).cast("long"))
          .localCheckpoint()
        graft.ops.PrefixSum
          .twoLevelPrev(t, Seq("source"), "shard", "doc_id", "n_tokens", "h")
          .filter(col("prev_tokens") < budget)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("prev_tokens"))
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
              |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |  ${hashSql("'mix:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |c AS (SELECT doc_id, source, n_tokens,
              |  coalesce(sum(n_tokens) OVER (PARTITION BY source
              |    ORDER BY h, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |    AS prev_tokens
              |  FROM t)
              |SELECT doc_id, source, n_tokens,
              |  CAST(prev_tokens AS BIGINT) AS prev_tokens
              |FROM c WHERE prev_tokens < 400""".stripMargin))
  )
}
