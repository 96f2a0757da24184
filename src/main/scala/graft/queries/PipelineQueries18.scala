package graft.queries

import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
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

  private def rawDocs(s: SparkSession): DataFrame =
    s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")

  /** Tracking-parameter pattern, shared verbatim with the oracle. */
  private val TrackPat = "^(utm_[A-Za-z0-9_]*|ref|fbclid|gclid)="

  /** URL canonicalization as a Column pipeline (documented order:
    * de-fragment -> split query -> case-fold scheme+host -> strip
    * trailing slash -> drop tracking params, preserving the rest in
    * original order).
    */
  private def canonicalUrl(url: Column): Column = {
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
              |FROM $rawPq GROUP BY 1""".stripMargin))
  )
}
