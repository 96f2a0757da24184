package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.DupSpans
import org.apache.spark.sql.functions._

/** Fifth pipeline group: corpus-internal duplicated-substring spans
  * and their excision (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022 — ExactSubstr at k-gram
  * granularity), deterministic weight-proportional sampling
  * (Efraimidis & Spirakis, "Weighted random sampling with a
  * reservoir", IPL 2006 — the exponential-race keys, RNG replaced by
  * a salted hash), DSIR importance weighting (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023 — hashed n-gram features), and lexical-diversity scoring
  * (type-token ratio / hapax density — the classical corpus
  * statistics quality axis q74's surface heuristics don't cover).
  *
  * Float rules as established: log-derived quantities quantize to
  * integer micro-units BEFORE any aggregation or ordering, remaining
  * arithmetic is single-expression IEEE ops with parenthesization
  * mirrored verbatim in the oracle SQL, and every embedded constant
  * (0.5, 2^32, 10^6) is exactly representable.
  */
object PipelineQueries5 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** DuckDB fragment: positional k-gram hashes over a `toks` column
    * (lockstep with TextAnalysis.gramHashesPositional, as in the
    * PipelineQueries4 twin).
    */
  private def gramHashSql(k: Int): String = {
    val cat = (0 until k).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len(toks) >= $k THEN
       |  list_transform(generate_series(1, len(toks) - ${k - 1}),
       |    i -> ${hashSql(s"($cat)")})
       |ELSE [] END""".stripMargin
  }

  /** Shared oracle prefix: gram positions and corpus-duplicated start
    * positions (the [[graft.ops.DupSpans.dupStarts]] twin — duplicate
    * test is a count over the gram-hash partition).
    */
  private def dupStartsSql(k: Int): String =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |g AS (SELECT doc_id, ${gramHashSql(k)} AS gh FROM t),
       |p AS (SELECT doc_id,
       |        unnest(generate_series(1, len(gh))) - 1 AS pos,
       |        unnest(gh) AS ghv
       |      FROM g),
       |d AS (SELECT doc_id, pos FROM (
       |        SELECT doc_id, pos,
       |          count(*) OVER (PARTITION BY ghv) AS cnt FROM p) x
       |      WHERE cnt >= 2)""".stripMargin

  private val SpanK = 5

  val defs: Seq[QDef] = Seq(

    // Duplicated-substring spans: every token position whose 5-gram
    // occurs >= 2 times corpus-wide (within-doc repeats included),
    // merged into maximal per-doc spans. This is the corpus-INTERNAL
    // twin of q98's eval-contamination spans — production pipelines
    // run both cuts. Scale shape (ops/DupSpans.scala): duplicate test
    // = one window count partitioned on the gram hash (a partition is
    // one specific 5-token string's occurrence list — tiny at any
    // corpus size), span merge = one window partitioned on doc_id
    // (bounded by doc length); two shuffles, no self-join, 8-byte
    // hashes on the wire.
    QDef("q101_dup_spans",
      (s, dir) => {
        val starts = DupSpans.dupStarts(DupSpans.gramPositions(
          Tables.documents(s, dir), "doc_id", "text", SpanK))
        DupSpans.spans(starts, SpanK)
      },
      Some(s"""WITH ${dupStartsSql(SpanK)},
              |m AS (SELECT doc_id, pos,
              |        max(pos + ${SpanK - 1}) OVER (PARTITION BY doc_id
              |          ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
              |          AND 1 PRECEDING) AS prev_end
              |      FROM d),
              |st AS (SELECT doc_id, pos, CASE WHEN prev_end IS NULL
              |          OR pos > prev_end + 1 THEN 1 ELSE 0 END AS st
              |       FROM m),
              |gr AS (SELECT doc_id, pos,
              |         sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
              |       FROM st)
              |SELECT doc_id,
              |  min(pos) AS span_start,
              |  max(pos) + ${SpanK - 1} AS span_end,
              |  max(pos) + ${SpanK - 1} - min(pos) + 1 AS span_tokens,
              |  count(*) AS n_grams
              |FROM gr GROUP BY doc_id, gid""".stripMargin)),

    // Span excision — the cut that consumes q101: drop every token
    // covered by a duplicated 5-gram and re-emit the cleaned text.
    // Covered positions come straight from the dup starts (each start
    // explodes into its 5 positions, distinct), tokens leave by
    // anti-join on (doc, position), and the text reassembles with an
    // ordered aggregation (the q37 ordered-string_agg shape). All
    // joins/aggs key on doc_id or (doc_id,pos) — per-doc partitions,
    // bounded everywhere.
    QDef("q105_span_excise",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val covered = DupSpans.coveredPositions(
          DupSpans.dupStarts(DupSpans.gramPositions(
            docs, "doc_id", "text", SpanK)), SpanK)
        val tokPos = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            posexplode_outer(col("toks")).as(Seq("pos", "tok")))
          .filter(col("tok").isNotNull) // outer + generated-col guard:
          // keeps InferFiltersFromGenerate from inlining the tokenizer
          // into a pushed-down filter (see DupSpans.gramPositions)
          .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
        val kept = tokPos.join(covered,
          tokPos("doc_id") === covered("doc_id") && col("pos") === col("cp"),
          "left_anti")
        val clean = kept.groupBy("doc_id")
          .agg(array_join(transform(
              sort_array(collect_list(struct(col("pos"), col("tok")))),
              x => x.getField("tok")), " ").as("clean_text"),
            count(lit(1)).as("n_kept"))
        docs.select(col("doc_id"))
          .join(clean, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("clean_text"), lit("")).as("clean_text"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      },
      Some(s"""WITH ${dupStartsSql(SpanK)},
              |cov AS (SELECT DISTINCT doc_id, cp FROM (
              |          SELECT doc_id,
              |            unnest(generate_series(pos, pos + ${SpanK - 1})) AS cp
              |          FROM d) x),
              |tp AS (SELECT doc_id,
              |         unnest(generate_series(1, len(toks))) - 1 AS pos,
              |         unnest(toks) AS tok
              |       FROM t),
              |k AS (SELECT tp.doc_id, tp.pos, tp.tok
              |      FROM tp LEFT JOIN cov
              |        ON tp.doc_id = cov.doc_id AND tp.pos = cov.cp
              |      WHERE cov.cp IS NULL),
              |c AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
              |        count(*) AS n_kept
              |      FROM k GROUP BY doc_id)
              |SELECT d2.doc_id,
              |  coalesce(c.clean_text, '') AS clean_text,
              |  CAST(coalesce(c.n_kept, 0) AS BIGINT) AS n_kept
              |FROM documents d2 LEFT JOIN c USING (doc_id)""".stripMargin)),

    // Weight-proportional sampling without replacement, RNG-free: the
    // Efraimidis-Spirakis exponential race. Doc i draws u_i from a
    // salted hash (32-bit value + 0.5, over 2^32 — exactly the
    // stratified-sample q71 portability trick) and gets key
    // -ln(u_i)/w_i with w_i = its token count; the N smallest keys are
    // the sample, selection probability proportional to w without
    // replacement. Keys quantize to integer MICRO-units before
    // ordering (q78's rule: ln is the one libm call, floor to micro
    // makes both engines agree; ties break on doc_id). The top-N is a
    // TakeOrdered — no global sort at any scale.
    QDef("q102_weighted_sample",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"),
            tokenHash(concat(lit("aes:"), col("doc_id").cast("string"))).as("h"))
          .select(col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_tokens"), col("h"))
          .filter(col("n_tokens") >= 1)
        t.withColumn("key_micro",
            floor((lit(1000000.0) *
              -log((col("h").cast("double") + 0.5) / lit(4294967296.0))) /
              col("n_tokens").cast("double")).cast("long"))
          .orderBy(col("key_micro"), col("doc_id"))
          .limit(100)
          .select(col("doc_id"), col("lang"), col("n_tokens"), col("key_micro"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang,
              |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |  ${hashSql("'aes:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |k AS (SELECT doc_id, lang, n_tokens,
              |  CAST(floor((1000000.0 *
              |    -ln((CAST(h AS DOUBLE) + 0.5) / 4294967296.0)) /
              |    CAST(n_tokens AS DOUBLE)) AS BIGINT) AS key_micro
              |  FROM t WHERE n_tokens >= 1)
              |SELECT doc_id, lang, n_tokens, key_micro FROM k
              |ORDER BY key_micro, doc_id LIMIT 100""".stripMargin)),

    // DSIR importance weights: hashed-unigram features (256 buckets),
    // target distribution = the bench-convention docs (doc_id % 31 ==
    // 0, as in q93/q98), raw = the rest; a raw doc's weight is the sum
    // over its tokens of log(p_target/p_raw) of the token's bucket,
    // add-1 smoothed. Per-bucket log-ratios quantize to integer
    // micro-nats, so the per-doc weight is an exact long sum (q78's
    // determinism rule). Scale shape: the feature table is 256 rows —
    // broadcast — and the corpus side is one scan plus the per-doc
    // aggregation; the bucket counts are one map-side-combined shuffle
    // of at most 2x256 partial rows per task.
    QDef("q103_dsir_weights",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // checkpointed: feeds the bucket counts AND the scoring probe
        val toksDf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .select(col("doc_id"), (tokenHash(col("tok")) % 256).as("b"),
            (col("doc_id") % 31 === 0).as("is_t"))
          .localCheckpoint()
        val bc = toksDf.groupBy("b").agg(
          sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
          sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
        val totals = bc.agg(sum("ct").as("nt"), sum("cr").as("nr"))
        val ratios = bc.crossJoin(broadcast(totals))
          .select(col("b"), floor(lit(1000000.0) * (
              log((col("ct").cast("double") + 1.0) /
                (col("nt").cast("double") + 256.0)) -
              log((col("cr").cast("double") + 1.0) /
                (col("nr").cast("double") + 256.0))))
            .cast("long").as("lr_micro"))
        val w = toksDf.filter(!col("is_t"))
          .join(broadcast(ratios), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"),
            sum("lr_micro").as("weight_micro"))
        docs.filter(col("doc_id") % 31 =!= 0).select(col("doc_id"))
          .join(w, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("weight_micro"), lit(0L)).as("weight_micro"))
      },
      Some(s"""WITH e AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
              |eb AS (SELECT doc_id, ${hashSql("tok")} % 256 AS b,
              |         doc_id % 31 = 0 AS is_t FROM e),
              |bc AS (SELECT b,
              |         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
              |         sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END) AS cr
              |       FROM eb GROUP BY b),
              |tt AS (SELECT sum(ct) AS nt, sum(cr) AS nr FROM bc),
              |r AS (SELECT b, CAST(floor(1000000.0 * (
              |        ln((CAST(ct AS DOUBLE) + 1.0) /
              |          (CAST(nt AS DOUBLE) + 256.0)) -
              |        ln((CAST(cr AS DOUBLE) + 1.0) /
              |          (CAST(nr AS DOUBLE) + 256.0)))) AS BIGINT) AS lr_micro
              |     FROM bc CROSS JOIN tt),
              |w AS (SELECT doc_id, count(*) AS n_tokens,
              |        sum(lr_micro) AS weight_micro
              |      FROM eb JOIN r USING (b) WHERE NOT is_t GROUP BY doc_id)
              |SELECT d.doc_id,
              |  CAST(coalesce(w.n_tokens, 0) AS BIGINT) AS n_tokens,
              |  CAST(coalesce(w.weight_micro, 0) AS BIGINT) AS weight_micro
              |FROM documents d LEFT JOIN w USING (doc_id)
              |WHERE d.doc_id % 31 <> 0""".stripMargin)),

    // Lexical diversity: type-token ratio, hapax density, top-token
    // share, mean token length — the vocabulary-richness quality axis
    // (template/boilerplate text scores low-TTR / high-top-share even
    // when it passes q74's surface gates). One token-level aggregation
    // with map-side partials plus one per-doc rollup; mean token
    // length is closed-form char arithmetic (len of the joined token
    // string — no per-token lambda, the q74-advice rule). All ratios
    // are exact integer-over-integer IEEE divisions rounded to 6.
    QDef("q104_lexical_diversity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // checkpointed: feeds the char-length scan AND the tf stream
        val docsT = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .localCheckpoint()
        val cl = docsT.select(col("doc_id"),
          length(array_join(col("toks"), "")).cast("long").as("char_len"))
        val a = docsT
          .select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_tokens"), count(lit(1)).as("n_types"),
            max("c").as("max_c"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
        def ratio(num: org.apache.spark.sql.Column) =
          when(col("n_tokens").isNull, 0.0)
            .otherwise(round(num.cast("double") /
              col("n_tokens").cast("double"), 6))
        docs.select(col("doc_id"))
          .join(a, Seq("doc_id"), "left")
          .join(cl, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
            coalesce(col("n_types"), lit(0L)).as("n_types"),
            ratio(col("n_types")).as("ttr"),
            ratio(col("n_hapax")).as("hapax_ratio"),
            ratio(col("max_c")).as("top_share"),
            ratio(col("char_len")).as("mean_tok_len"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |tf AS (SELECT doc_id, tok, count(*) AS c FROM e
              |       GROUP BY doc_id, tok),
              |a AS (SELECT doc_id, sum(c) AS n_tokens, count(*) AS n_types,
              |        max(c) AS max_c,
              |        sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n_hapax
              |      FROM tf GROUP BY doc_id),
              |cl AS (SELECT doc_id,
              |         len(array_to_string(toks, '')) AS char_len FROM t)
              |SELECT d.doc_id,
              |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
              |  CAST(coalesce(a.n_types, 0) AS BIGINT) AS n_types,
              |  CASE WHEN a.n_tokens IS NULL THEN 0.0 ELSE
              |    round(CAST(a.n_types AS DOUBLE) /
              |      CAST(a.n_tokens AS DOUBLE), 6) END AS ttr,
              |  CASE WHEN a.n_tokens IS NULL THEN 0.0 ELSE
              |    round(CAST(a.n_hapax AS DOUBLE) /
              |      CAST(a.n_tokens AS DOUBLE), 6) END AS hapax_ratio,
              |  CASE WHEN a.n_tokens IS NULL THEN 0.0 ELSE
              |    round(CAST(a.max_c AS DOUBLE) /
              |      CAST(a.n_tokens AS DOUBLE), 6) END AS top_share,
              |  CASE WHEN a.n_tokens IS NULL THEN 0.0 ELSE
              |    round(CAST(cl.char_len AS DOUBLE) /
              |      CAST(a.n_tokens AS DOUBLE), 6) END AS mean_tok_len
              |FROM documents d LEFT JOIN a USING (doc_id)
              |LEFT JOIN cl USING (doc_id)""".stripMargin))
  )
}
