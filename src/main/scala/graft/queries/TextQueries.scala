package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Text-analysis + deduplication coverage over the `documents` table:
  * quality scoring, token counting, language-ID heuristic, rolling-hash
  * fingerprinting, exact dedup, MinHash-LSH and SimHash near-dup.
  *
  * Hashes are md5-derived so the DuckDB oracle reproduces them exactly;
  * ratios are integer-exact divisions emitted as doubles.
  */
object TextQueries {

  /** Shared DuckDB fragments, kept in lockstep with TextAnalysis. */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "cast('0x' || substr(md5(__T__), 1, 8) as bigint)"

  val defs: Seq[QDef] = Seq(

    // Quality scoring: token stats, type-token ratio, stopword ratio.
    QDef("q19_text_quality",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
          .select(col("doc_id"),
            size(col("toks")).as("n_tokens"),
            size(array_distinct(col("toks"))).as("n_distinct"),
            round(size(array_distinct(col("toks"))).cast("double") /
              size(col("toks")).cast("double"), 6).as("ttr"),
            round(wordSetRatio(col("toks"), Seq("the", "a")), 6).as("stop_ratio"),
            // closed-form: sum of token lengths == chars of the
            // concatenation (codegen'd, vs interpreted per-token lambda)
            round(length(array_join(col("toks"), ""))
              .cast("double") / size(col("toks")).cast("double"), 6)
              .as("avg_token_len"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
              |SELECT doc_id, len(toks) AS n_tokens,
              |  len(list_distinct(toks)) AS n_distinct,
              |  round(len(list_distinct(toks))::DOUBLE / len(toks), 6) AS ttr,
              |  round(len(list_filter(toks, x -> x IN ('the','a')))::DOUBLE
              |    / len(toks), 6) AS stop_ratio,
              |  round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
              |    / len(toks), 6) AS avg_token_len
              |FROM t""".stripMargin)),

    // Corpus stats per language label.
    QDef("q20_lang_stats",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(tokens(col("text"))))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("n_chars")).as("total_chars"))
      },
      Some(s"""SELECT lang, count(*) AS n_docs,
              |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
              |  CAST(sum(n_chars) AS BIGINT) AS total_chars
              |FROM documents GROUP BY lang""".stripMargin)),

    // Token counting rollup per source.
    QDef("q21_token_count",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("n_tokens", size(tokens(col("text"))))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            max(col("n_tokens")).as("max_tokens"))
      },
      Some(s"""SELECT source, count(*) AS n_docs,
              |  CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens,
              |  CAST(max(len($toksSql)) AS BIGINT) AS max_tokens
              |FROM documents GROUP BY source""".stripMargin)),

    // Rolling-hash document fingerprint (order-sensitive).
    QDef("q22_fingerprint",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))
      },
      Some(s"""SELECT doc_id,
              |  list_reduce(list_prepend(0::BIGINT,
              |    list_transform($toksSql,
              |      t -> ${tokenHashSql.replace("__T__", "t")})),
              |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
              |FROM documents""".stripMargin)),

    // Language-ID heuristic: English marker-word scoring.
    QDef("q23_lang_id",
      (s, dir) => {
        Tables.documents(s, dir)
          .withColumn("toks", tokens(col("text")))
          .withColumn("en_score", round(wordSetRatio(col("toks"), EnglishMarkers), 6))
          .select(col("doc_id"), col("en_score"),
            when(col("en_score") > 0.05, lit("en")).otherwise(lit("und"))
              .as("predicted"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
              |SELECT doc_id,
              |  round(len(list_filter(toks, x -> x IN
              |    ('the','a','of','and','to','in','is','it','that','for')))::DOUBLE
              |    / len(toks), 6) AS en_score,
              |  CASE WHEN round(len(list_filter(toks, x -> x IN
              |    ('the','a','of','and','to','in','is','it','that','for')))::DOUBLE
              |    / len(toks), 6) > 0.05 THEN 'en' ELSE 'und' END AS predicted
              |FROM t""".stripMargin)),

    // Exact dedup: hash-groupBy on content, canonical id + dup count.
    QDef("q24_dedup_exact",
      (s, dir) => Dedup.exact(Tables.documents(s, dir), "doc_id", "text"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id,
             |  count(*) AS n_dups
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // MinHash-LSH near-duplicate pairs, exact-Jaccard verified at 0.8.
    // Oracle is the brute-force O(n²) pairwise Jaccard — the LSH path
    // must find exactly the same pairs.
    QDef("q25_neardup_minhash",
      (s, dir) => Dedup.nearDupMinhashArtifact(
        Tables.documents(s, dir), "doc_id", "text",
        fpKey = s"$dir#documents#id_text"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    len(list_intersect(a.sh, b.sh)) AS inter,
              |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
              |SELECT doc_a, doc_b, round(inter::DOUBLE / uni, 6) AS jaccard
              |FROM p WHERE inter::DOUBLE / uni >= 0.8""".stripMargin)),

    // Prefix-filtered set-similarity join (AllPairs/PPJoin prefix
    // principle): deterministic full recall at threshold 0.7 — the
    // guarantee-path dedup, vs q25's probabilistic LSH. Same brute-force
    // exact-Jaccard oracle shape as q25, lower threshold.
    QDef("q66_neardup_prefix",
      (s, dir) => Dedup.nearDupPrefixArtifact(
        Tables.documents(s, dir), "doc_id", "text", threshold = 0.7,
        fpKey = s"$dir#documents#neardup_prefix"),
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (
              |  SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${tokenHashSql.replace("__T__", "g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    len(list_intersect(a.sh, b.sh)) AS inter,
              |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS uni
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0)
              |SELECT doc_a, doc_b, round(inter::DOUBLE / uni, 6) AS jaccard
              |FROM p WHERE inter::DOUBLE / uni >= 0.7""".stripMargin)),

    // SimHash values (portable md5-derived bits).
    QDef("q26_simhash",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(col("doc_id"), simhash32(tokens(col("text"))).as("simhash"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |h AS (SELECT doc_id,
              |  list_transform(toks, t -> ${tokenHashSql.replace("__T__", "t")}) AS hs
              |  FROM t)
              |SELECT doc_id,
              |  list_sum(list_transform(generate_series(0, 31), b ->
              |    CASE WHEN list_sum(list_transform(hs,
              |      h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
              |    THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
              |FROM h""".stripMargin)),

    // BPE-ish subword token counting: alpha runs / digit runs /
    // punctuation runs (the GPT-2-style pre-tokenizer shape) alongside
    // whitespace tokens — the chars-per-token ratio is the usual
    // quality/cost signal for training-data budgeting.
    QDef("q62_bpe_tokens",
      (s, dir) => {
        // pattern passed as a Column literal — an expr() SQL string
        // would eat the \s escape in Spark's non-standard literals
        val pat = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"
        Tables.documents(s, dir)
          .withColumn("ws_tokens", size(tokens(col("text"))))
          .withColumn("bpe_tokens", regexp_count(col("text"), lit(pat)))
          .select(col("doc_id"), col("ws_tokens"), col("bpe_tokens"),
            round(col("n_chars").cast("double") /
              col("bpe_tokens").cast("double"), 6).as("chars_per_token"))
      },
      Some(s"""SELECT doc_id,
        |  len($toksSql) AS ws_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))
        |    AS bpe_tokens,
        |  round(n_chars::DOUBLE /
        |    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+')),
        |    6) AS chars_per_token
        |FROM documents""".stripMargin)),

    // SimHash near-dup pairs (hamming <= 3, byte-blocked join); oracle
    // brute-forces hamming over all pairs.
    QDef("q27_neardup_simhash",
      (s, dir) => Dedup.nearDupSimhash(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(simhashNearDupOracleSql))
  )

  /** q27's brute-force hamming oracle — EXACT for the blocked op (the
    * Manku pigeonhole: distance ≤ 3 forces one agreeing byte, so
    * 4-byte blocking has full recall). Shared with q401, the
    * maintained-index twin (PipelineQueries82), so the contract
    * cannot drift. */
  // lazy: q27's QDef above captures it during this object's own
  // initialization, before a plain val declared below `defs` would
  // have been assigned
  private[queries] lazy val simhashNearDupOracleSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |h AS (SELECT doc_id,
       |  list_transform(toks, t -> ${tokenHashSql.replace("__T__", "t")}) AS hs
       |  FROM t),
       |sh AS (SELECT doc_id,
       |  list_sum(list_transform(generate_series(0, 31), b ->
       |    CASE WHEN list_sum(list_transform(hs,
       |      h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
       |    THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
       |  FROM h)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.simhash, b.simhash)) AS dist
       |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
}
