package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{Coreset, PrefixSum}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tenth pipeline group — curation-policy operators:
  *
  *  - q148: Gopher repetition rules (Rae et al. 2021 §A1.1): per-doc
  *    duplicate-2-gram mass and top-unigram mass with keep flags —
  *    the standard repetition screen before any LM training run.
  *  - q149: EXACT distributed quantiles of token length per language —
  *    histogram-first (one groupBy shuffle), then the order statistic
  *    is selected over O(distinct lengths) rows; no global sort, no
  *    corpus-scale window. The exact twin of q114's sketch quantiles.
  *  - q150: stratified train/val/test split — deterministic hash-rank
  *    inside each (lang, source) stratum via the two-level PrefixSum
  *    rank (no per-stratum window), exact 90/5/5 integer thresholds.
  *  - q151: greedy k-center coreset selection ([[graft.ops.Coreset]]).
  *  - q152: truncation-loss accounting per candidate context length.
  *  - q153: normalization-aware exact dedup (casefold + punct-strip +
  *    whitespace-collapse before hashing — the C4-style canonical
  *    form; catches trivial variants raw md5 dedup misses).
  *  - q154: per-epoch deterministic reshuffle (seeded hash order per
  *    epoch, PrefixSum global rank — no global sort).
  *  - q155: dedup threshold sensitivity sweep — exact Jaccard computed
  *    ONCE per band-surfaced candidate pair, counted at 0.7/0.8/0.9.
  *  - q156: per-source quality scorecard (volume, length, Gopher keep
  *    rate, within-source dup rate) — the ingest-source triage table.
  *  - q157: token-budget waterfill — the classical water-filling
  *    allocation of a token budget across languages, closed-form on
  *    the sorted O(#langs) aggregate (no iteration, both engines
  *    replay the same integer level selection).
  *  - q158: split leakage audit — 8-gram overlap from every test doc
  *    back into the q150 train split (the "did my held-out set leak"
  *    check that must run BEFORE any eval is trusted).
  *  - q159: perplexity outliers — per-language z-scores of the q108
  *    doc-level bigram NLL (CCNet-style LM filtering, exact integer
  *    moments; the only float op is one IEEE sqrt both engines round
  *    identically).
  *
  * Float/division rules as established: all ratios are integer milli
  * units on non-negative ground (`div` == `//` there), cross-row sums
  * are integer (DuckDB sums CAST back to BIGINT — the HUGEINT trap),
  * and q151's distance quantization floors to micros BEFORE min/argmax
  * so the greedy selection replays bit-identically.
  */
object PipelineQueries10 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  // lockstep with PipelineQueries6's vector fragments
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  val defs: Seq[QDef] = Seq(

    // Gopher repetition screen: fraction of 2-gram instances belonging
    // to a within-doc-repeated 2-gram, and the most-frequent unigram's
    // share. Both per-doc aggregations are map-side-combined groupBys
    // keyed by (doc, gram) then (doc) — no windows, no self-joins; the
    // thresholds (200‰ dup-2-gram, 300‰ top-unigram) are the paper's
    // repetition-rule tier quantized to integers.
    QDef("q148_gopher_repetition",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .localCheckpoint() // unigram + bigram streams share it
        graft.ops.QualityGates.gopherRepetition(t)
          .select(col("doc_id"), col("dup2_milli"), col("top1_milli"),
            col("keep"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
              |ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
              |        CAST(max(c) AS BIGINT) AS top1 FROM uc GROUP BY 1),
              |b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
              |        list_transform(generate_series(1, len(toks) - 1),
              |          i -> toks[i] || ' ' || toks[i+1])
              |        ELSE [] END) AS g FROM t),
              |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
              |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
              |        CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
              |          AS dup2 FROM bc GROUP BY 1),
              |j AS (SELECT ua.doc_id,
              |        coalesce((1000 * ba.dup2) // ba.n2, 0) AS dup2_milli,
              |        (1000 * ua.top1) // ua.n_tok AS top1_milli
              |      FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id)
              |SELECT doc_id, CAST(dup2_milli AS BIGINT) AS dup2_milli,
              |  CAST(top1_milli AS BIGINT) AS top1_milli,
              |  CAST(CASE WHEN dup2_milli <= 200 AND top1_milli <= 300
              |    THEN 1 ELSE 0 END AS BIGINT) AS keep
              |FROM j""".stripMargin)),

    // Exact token-length quantiles per language, histogram-first: the
    // corpus collapses to (lang, len) counts in ONE shuffle; the
    // cumulative window runs over O(distinct lengths) rows per lang
    // (bounded — never the corpus), and v_q = min{len : cum ≥
    // ceil(q·n)} is the classical discrete order statistic, replayed
    // with the same integer ceiling in the oracle.
    QDef("q149_exact_length_quantiles",
      (s, dir) => {
        val lens = Tables.documents(s, dir)
          .select(col("lang"), size(tokens(col("text"))).as("len"))
          .groupBy("lang", "len").agg(count(lit(1)).as("c"))
          .localCheckpoint() // cum window + totals share it
        val w = Window.partitionBy("lang").orderBy("len")
          .rowsBetween(Window.unboundedPreceding, 0)
        val n = lens.groupBy("lang").agg(sum("c").as("n"))
        def q(p: Int, out: String) =
          min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
            col("len"))).cast("long").as(out)
        lens.withColumn("cum", sum("c").over(w))
          .join(broadcast(n), "lang")
          .groupBy("lang")
          .agg(q(50, "p50"), q(90, "p90"), q(99, "p99"))
      },
      Some(s"""WITH t AS (SELECT lang,
              |    len($toksSql) AS l FROM documents),
              |c AS (SELECT lang, l, count(*) AS cnt FROM t GROUP BY 1, 2),
              |cc AS (SELECT lang, l, cnt,
              |    sum(cnt) OVER (PARTITION BY lang ORDER BY l) AS cum
              |  FROM c),
              |n AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n
              |  FROM c GROUP BY 1)
              |SELECT lang,
              |  CAST(min(CASE WHEN cum >= (50*n + 99) // 100 THEN l END)
              |    AS BIGINT) AS p50,
              |  CAST(min(CASE WHEN cum >= (90*n + 99) // 100 THEN l END)
              |    AS BIGINT) AS p90,
              |  CAST(min(CASE WHEN cum >= (99*n + 99) // 100 THEN l END)
              |    AS BIGINT) AS p99
              |FROM cc JOIN n USING (lang) GROUP BY lang""".stripMargin)),

    // Stratified train/val/test split: deterministic seeded-hash order
    // inside each (lang, source) stratum, exact 90/5/5 by integer rank
    // thresholds. The rank is the two-level PrefixSum construction —
    // a per-stratum row_number window would put each stratum in one
    // task (the q9 trap); here no task ever windows more than one
    // hash bucket of one stratum.
    QDef("q150_stratified_split",
      (s, dir) => {
        val h = tokenHash(concat(lit("split:"), col("doc_id").cast("string")))
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"), h.as("h"))
          .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
          .withColumn("one", lit(1L))
          .localCheckpoint() // rank pass + offsets agg share this
        val sizes = t.groupBy("lang", "source").agg(count(lit(1)).as("n"))
        PrefixSum
          .twoLevelPrev(t, Seq("lang", "source"), "bucket", "doc_id",
            "one", "h", outCol = "prev")
          .join(broadcast(sizes), Seq("lang", "source"))
          .withColumn("rnk", col("prev") + 1L)
          .select(col("doc_id"), col("lang"), col("source"),
            when(col("rnk") <= expr("(9 * n) div 10"), "train")
              .when(col("rnk") <= expr("(19 * n) div 20"), "val")
              .otherwise("test").as("split"))
      },
      Some(s"""WITH d AS (SELECT doc_id, lang, source,
              |    ${hashSql("'split:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |r AS (SELECT doc_id, lang, source,
              |    row_number() OVER (PARTITION BY lang, source
              |      ORDER BY h, doc_id) AS rnk,
              |    count(*) OVER (PARTITION BY lang, source) AS n
              |  FROM d)
              |SELECT doc_id, lang, source,
              |  CASE WHEN rnk <= (9 * n) // 10 THEN 'train'
              |       WHEN rnk <= (19 * n) // 20 THEN 'val'
              |       ELSE 'test' END AS split
              |FROM r""".stripMargin)),

    // Greedy k-center coreset (k = 6): the selection itself is the
    // checked output — round, chosen vector, and its min-distance to
    // the prior centers in micro-units. The oracle replays the full
    // farthest-point traversal (unrolled rounds, same per-center
    // flooring, same id tie-break) with no run-computed literals.
    QDef("q151_kcenter_coreset",
      (s, dir) => {
        import s.implicits._
        Coreset.kCenter(Tables.embeddings(s, dir), "vec_id", "embedding", 6)
          .toDF("round", "vec_id", "mind_micro")
      },
      Some {
        val parts = (2 to 6).map { i =>
          val excl = Seq("(SELECT min(vec_id) FROM en)") ++
            (2 until i).map(j => s"(SELECT vec_id FROM s$j)")
          val notIn = excl.map(e => s"m.vec_id <> $e").mkString(" AND ")
          val d2 = s"CAST(floor(1e6 * ((m.nsq + c.cn) - " +
            s"(2.0 * ${dotSql("m.v", "c.cv")}))) AS BIGINT)"
          s"""s$i AS (SELECT m.vec_id, m.mind FROM m${i - 1} m
             |  WHERE $notIn ORDER BY m.mind DESC, m.vec_id LIMIT 1),
             |c$i AS (SELECT v AS cv, nsq AS cn FROM en
             |  WHERE vec_id = (SELECT vec_id FROM s$i)),
             |m$i AS (SELECT m.vec_id, m.v, m.nsq,
             |    least(m.mind, $d2) AS mind
             |  FROM m${i - 1} m, c$i c)""".stripMargin
        }.mkString(",\n")
        val rows = Seq(
          "SELECT CAST(1 AS BIGINT) AS round, " +
            "(SELECT min(vec_id) FROM en) AS vec_id, " +
            "CAST(-1 AS BIGINT) AS mind_micro") ++
          (2 to 6).map(i =>
            s"SELECT CAST($i AS BIGINT), (SELECT vec_id FROM s$i), " +
              s"(SELECT mind FROM s$i)")
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
           |en AS (SELECT vec_id, v, ${dotSql("v", "v")} AS nsq FROM e),
           |c1 AS (SELECT v AS cv, nsq AS cn FROM en
           |  WHERE vec_id = (SELECT min(vec_id) FROM en)),
           |m1 AS (SELECT m.vec_id, m.v, m.nsq,
           |    CAST(floor(1e6 * ((m.nsq + c.cn) -
           |      (2.0 * ${dotSql("m.v", "c.cv")}))) AS BIGINT) AS mind
           |  FROM en m, c1 c),
           |$parts
           |${rows.mkString("\nUNION ALL\n")}""".stripMargin
      }),

    // Truncation-loss accounting: for each candidate context length,
    // the tokens a hard truncation keeps/loses and the docs affected —
    // the one-scan audit behind choosing a packing length (pairs with
    // q71/q72's packers). Corpus collapses in a single aggregation.
    QDef("q152_truncation_loss",
      (s, dir) => {
        Tables.documents(s, dir)
          .select(size(tokens(col("text"))).cast("long").as("len"))
          .select(col("len"),
            explode(typedLit(Seq(128L, 512L, 2048L))).as("l_ctx"))
          .groupBy("l_ctx")
          .agg(sum(least(col("len"), col("l_ctx"))).as("tokens_kept"),
            sum(greatest(col("len") - col("l_ctx"), lit(0L)))
              .as("tokens_lost"),
            count_if(col("len") > col("l_ctx")).as("docs_truncated"))
      },
      Some(s"""WITH t AS (SELECT CAST(len($toksSql) AS BIGINT) AS len
              |  FROM documents),
              |l AS (SELECT CAST(unnest([128, 512, 2048]) AS BIGINT)
              |  AS l_ctx)
              |SELECT l_ctx,
              |  CAST(sum(least(len, l_ctx)) AS BIGINT) AS tokens_kept,
              |  CAST(sum(greatest(len - l_ctx, 0)) AS BIGINT)
              |    AS tokens_lost,
              |  CAST(sum(CASE WHEN len > l_ctx THEN 1 ELSE 0 END)
              |    AS BIGINT) AS docs_truncated
              |FROM t CROSS JOIN l GROUP BY 1""".stripMargin)),

    // Normalization-aware exact dedup: hash the canonical form
    // (casefold, strip non-alphanumerics, collapse whitespace) instead
    // of the raw text — the C4-style canonicalization that catches
    // case/punctuation variants. Same one-shuffle groupBy-min shape as
    // q24; n_raw_variants > 1 marks clusters ONLY normalization finds.
    // Emits EVERY cluster (singletons included) so the oracle hash
    // covers the whole canonicalization, not just the dup tail —
    // sf0.01 plants no duplicates at all.
    QDef("q153_normalized_dedup",
      (s, dir) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""),
          " +", " "))
        Tables.documents(s, dir)
          .select(col("doc_id"), col("text"), md5(norm).as("norm_hash"))
          .groupBy("norm_hash")
          .agg(min("doc_id").as("canonical_id"),
            count(lit(1)).as("n_docs"),
            count_distinct(col("text")).as("n_raw_variants"))
      },
      Some("""WITH n AS (SELECT doc_id, text,
             |    md5(trim(regexp_replace(regexp_replace(lower(text),
             |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash
             |  FROM documents)
             |SELECT norm_hash,
             |  CAST(min(doc_id) AS BIGINT) AS canonical_id,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT text) AS BIGINT) AS n_raw_variants
             |FROM n GROUP BY 1""".stripMargin)),

    // Per-epoch deterministic reshuffle: each training epoch gets its
    // own seeded hash order (the standard "reshuffle between epochs"
    // without materializing a permutation): pos = PrefixSum rank of
    // the epoch-salted hash. One construction covers every epoch — the
    // epoch id is just another group column, so no global sort and no
    // per-epoch pass.
    QDef("q154_epoch_reshuffle",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"),
            explode(typedLit(Seq(0L, 1L))).as("epoch"))
          .withColumn("h", tokenHash(concat(lit("ep"),
            col("epoch").cast("string"), lit(":"),
            col("doc_id").cast("string"))))
          .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
          .withColumn("one", lit(1L))
          .localCheckpoint() // rank pass + offsets agg share this
        PrefixSum
          .twoLevelPrev(t, Seq("epoch"), "bucket", "doc_id", "one", "h",
            outCol = "pos")
          .select(col("epoch"), col("doc_id"), col("pos"))
      },
      Some(s"""WITH ep AS (SELECT CAST(unnest([0, 1]) AS BIGINT) AS epoch),
              |d AS (SELECT epoch, doc_id,
              |    ${hashSql("'ep' || CAST(epoch AS VARCHAR) || ':' || " +
                            "CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents CROSS JOIN ep)
              |SELECT epoch, doc_id,
              |  CAST(row_number() OVER (PARTITION BY epoch
              |    ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
              |FROM d""".stripMargin)),

    // Dedup threshold sensitivity: exact Jaccard is computed ONCE per
    // band-surfaced candidate pair (the q25/q140 12x2 geometry, oracle
    // replaying the band filter so both engines define the candidate
    // set identically), then counted at each policy threshold — the
    // audit that shows what a 0.7-vs-0.9 dedup policy would actually
    // remove before anyone pays for the corpus-wide run.
    QDef("q155_dedup_threshold_sweep",
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
        val jm = cand
          .join(sig.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")),
            "doc_a")
          .join(sig.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
            "doc_b")
          .withColumn("inter",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
          .withColumn("uni", size(col("hs_a")).cast("long") +
            size(col("hs_b")).cast("long") - col("inter"))
          .select(expr("(1000 * inter) div uni").as("jm"))
        val th = Tables.documents(s, dir).sparkSession.range(0, 1)
          .select(explode(typedLit(Seq(700L, 800L, 900L))).as("t_milli"))
        th.join(jm, col("jm") >= col("t_milli"), "left")
          .groupBy("t_milli")
          .agg(count(col("jm")).as("n_pairs"))
      },
      Some {
        val mins = (0 until 24).map { j =>
          val (a, b) = graft.functions.TextAnalysis.affineParam(j)
          s"list_min(list_transform(sh, h -> (h * $a + $b) % " +
            s"${graft.functions.TextAnalysis.MinhashPrime}))"
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
           |      AS uni
           |  FROM m a JOIN m b ON a.doc_id < b.doc_id
           |  WHERE len(list_filter(generate_series(1, 12), k ->
           |      a.sig[2*k-1] = b.sig[2*k-1] AND a.sig[2*k] = b.sig[2*k]))
           |    > 0),
           |j AS (SELECT (1000 * inter) // uni AS jm FROM p),
           |th AS (SELECT CAST(unnest([700, 800, 900]) AS BIGINT)
           |  AS t_milli)
           |SELECT t_milli, CAST(count(j.jm) AS BIGINT) AS n_pairs
           |FROM th LEFT JOIN j ON j.jm >= th.t_milli
           |GROUP BY 1""".stripMargin
      }),

    // Per-source quality scorecard: the triage table an ingest
    // operator reads before admitting a source — volume, mean length,
    // Gopher keep rate (q148's rules re-aggregated per source), and
    // the within-source exact-dup share. Everything is integer milli
    // rates over map-side-combined counts.
    QDef("q156_source_scorecard",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"),
            tokens(col("text")).as("toks"))
          .localCheckpoint() // feeds per-doc screens + source rollups
        val perDoc = base.select(col("doc_id"), col("source"))
          .join(graft.ops.QualityGates.gopherRepetition(base), "doc_id")
        val dups = base.groupBy("source")
          .agg(count(lit(1)).as("nd"),
            count_distinct(col("text")).as("ndist"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            sum("keep").as("n_keep"))
          .join(dups, "source")
          .select(col("source"), col("n_docs"), col("n_tokens"),
            expr("(1000 * n_tokens) div n_docs").as("mean_len_milli"),
            expr("(1000 * n_keep) div n_docs").as("keep_milli"),
            expr("(1000 * (n_docs - ndist)) div n_docs").as("dup_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, source, text, $toksSql AS toks
              |  FROM documents),
              |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |uc AS (SELECT doc_id, tok, count(*) AS c FROM u GROUP BY 1, 2),
              |ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
              |        CAST(max(c) AS BIGINT) AS top1 FROM uc GROUP BY 1),
              |b AS (SELECT doc_id, unnest(CASE WHEN len(toks) >= 2 THEN
              |        list_transform(generate_series(1, len(toks) - 1),
              |          i -> toks[i] || ' ' || toks[i+1])
              |        ELSE [] END) AS g FROM t),
              |bc AS (SELECT doc_id, g, count(*) AS c FROM b GROUP BY 1, 2),
              |ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n2,
              |        CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
              |          AS dup2 FROM bc GROUP BY 1),
              |pd AS (SELECT t.doc_id, t.source, ua.n_tok,
              |        CASE WHEN coalesce((1000 * ba.dup2) // ba.n2, 0) <= 200
              |          AND (1000 * ua.top1) // ua.n_tok <= 300
              |          THEN 1 ELSE 0 END AS keep
              |      FROM t JOIN ua ON t.doc_id = ua.doc_id
              |        LEFT JOIN ba ON t.doc_id = ba.doc_id),
              |dd AS (SELECT source, count(*) AS nd,
              |        count(DISTINCT text) AS ndist
              |      FROM t GROUP BY 1),
              |sc AS (SELECT source, count(*) AS n_docs,
              |        sum(n_tok) AS n_tokens, sum(keep) AS n_keep
              |      FROM pd GROUP BY 1)
              |SELECT sc.source, CAST(n_docs AS BIGINT) AS n_docs,
              |  CAST(n_tokens AS BIGINT) AS n_tokens,
              |  CAST((1000 * n_tokens) // n_docs AS BIGINT)
              |    AS mean_len_milli,
              |  CAST((1000 * n_keep) // n_docs AS BIGINT) AS keep_milli,
              |  CAST((1000 * (dd.nd - dd.ndist)) // dd.nd AS BIGINT)
              |    AS dup_milli
              |FROM sc JOIN dd ON sc.source = dd.source""".stripMargin)),

    // Token-budget waterfill: allocate half the corpus's tokens across
    // languages by the classical water-filling rule (every language
    // gets min(available, level) with the level chosen so the budget
    // is met). The level has a CLOSED FORM on the availability table
    // sorted ascending — find the first segment whose availability
    // covers the per-remaining-language share, one integer division —
    // so both engines replay it without iteration. Windows run over
    // O(#langs) rows (bounded by the language inventory, never the
    // corpus); floors make Σalloc ≤ budget with the gap reported.
    QDef("q157_token_budget_waterfill",
      (s, dir) => {
        val avail = Tables.documents(s, dir)
          .select(col("lang"), size(tokens(col("text"))).cast("long").as("len"))
          .groupBy("lang").agg(sum("len").as("avail"))
          .localCheckpoint() // totals + sorted scan share it
        val tot = avail.agg(sum("avail").as("total"),
          count(lit(1)).as("nl"))
        val w = Window.orderBy(col("avail"), col("lang"))
        val rows = avail.crossJoin(broadcast(tot))
          .withColumn("b", expr("total div 2"))
          .withColumn("i", row_number().over(w))
          .withColumn("prefix", sum("avail").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("rem", col("b") - (col("prefix") - col("avail")))
          .withColumn("lft", col("nl") - col("i") + 1L)
        val level = rows.filter(col("avail") * col("lft") >= col("rem"))
          .orderBy(col("i")).limit(1)
          .select(expr("rem div lft").as("level"))
        val alloc = rows.crossJoin(broadcast(level))
          .select(col("lang"), col("avail"), col("b"),
            least(col("avail"), col("level")).as("alloc"))
        val short = alloc.agg((max(col("b")) - sum(col("alloc")))
          .as("shortfall"))
        alloc.crossJoin(broadcast(short))
          .select(col("lang"), col("avail"), col("alloc"), col("shortfall"))
      },
      Some(s"""WITH a AS (SELECT lang,
              |    CAST(sum(len($toksSql)) AS BIGINT) AS avail
              |  FROM documents GROUP BY 1),
              |t AS (SELECT CAST(sum(avail) AS BIGINT) AS total,
              |    CAST(count(*) AS BIGINT) AS nl FROM a),
              |r AS (SELECT lang, avail, total // 2 AS b,
              |    row_number() OVER (ORDER BY avail, lang) AS i,
              |    CAST(sum(avail) OVER (ORDER BY avail, lang)
              |      AS BIGINT) AS prefix,
              |    nl FROM a CROSS JOIN t),
              |r2 AS (SELECT *, b - (prefix - avail) AS rem,
              |    nl - i + 1 AS lft FROM r),
              |lv AS (SELECT rem // lft AS level FROM r2
              |  WHERE avail * lft >= rem ORDER BY i LIMIT 1),
              |al AS (SELECT lang, avail, b,
              |    least(avail, level) AS alloc FROM r2 CROSS JOIN lv),
              |sh AS (SELECT max(b) - sum(alloc) AS shortfall FROM al)
              |SELECT lang, avail, CAST(alloc AS BIGINT) AS alloc,
              |  CAST(shortfall AS BIGINT) AS shortfall
              |FROM al CROSS JOIN sh""".stripMargin)),

    // Split leakage audit: for every q150 test-split document, how
    // much of its distinct-8-gram mass appears anywhere in the train
    // split. The gram join keys on 8-byte hashes (sort-merge at
    // scale); the test side is 5% of the corpus by construction, so
    // the probe is the small side. A leak_milli > 0 doc means the
    // "held-out" eval is partly memorizable from training data.
    QDef("q158_split_leakage",
      (s, dir) => {
        val h = tokenHash(concat(lit("split:"), col("doc_id").cast("string")))
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("source"), col("text"),
            h.as("h"))
          .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
          .withColumn("one", lit(1L))
          .localCheckpoint() // rank pass + offsets agg share this
        val sizes = t.groupBy("lang", "source").agg(count(lit(1)).as("n"))
        val withSplit = PrefixSum
          .twoLevelPrev(t, Seq("lang", "source"), "bucket", "doc_id",
            "one", "h", outCol = "prev")
          .join(broadcast(sizes), Seq("lang", "source"))
          .withColumn("rnk", col("prev") + 1L)
          .withColumn("split",
            when(col("rnk") <= expr("(9 * n) div 10"), "train")
              .when(col("rnk") <= expr("(19 * n) div 20"), "val")
              .otherwise("test"))
        val g = withSplit
          .select(col("doc_id"), col("split"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("split"),
            explode(ngramHashes(col("toks"), 8)).as("g8"))
          .localCheckpoint() // train index + test probe share it
        val tr = g.filter(col("split") === "train")
          .select(col("g8")).distinct().withColumn("hit", lit(1L))
        g.filter(col("split") === "test")
          .join(tr, Seq("g8"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(coalesce(col("hit"), lit(0L))).as("n_leaked"))
          .withColumn("leak_milli", expr("(1000 * n_leaked) div n_grams"))
      },
      Some {
        val g8 = "list_distinct(list_transform(" +
          "generate_series(1, len(toks) - 7), i -> " +
          hashSql("(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || " +
            "' ' || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || " +
            "' ' || toks[i+6] || ' ' || toks[i+7])") + "))"
        s"""WITH d AS (SELECT doc_id, lang, source, text,
           |    ${hashSql("'split:' || CAST(doc_id AS VARCHAR)")} AS h
           |  FROM documents),
           |r AS (SELECT doc_id, text,
           |    CASE WHEN rnk <= (9 * n) // 10 THEN 'train'
           |         WHEN rnk <= (19 * n) // 20 THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM (SELECT doc_id, text,
           |      row_number() OVER (PARTITION BY lang, source
           |        ORDER BY h, doc_id) AS rnk,
           |      count(*) OVER (PARTITION BY lang, source) AS n
           |    FROM d)),
           |tk AS (SELECT doc_id, split, $toksSql AS toks FROM r),
           |g AS (SELECT doc_id, split, unnest(CASE WHEN len(toks) >= 8
           |    THEN $g8 ELSE [] END) AS g8 FROM tk),
           |tr AS (SELECT DISTINCT g8 FROM g WHERE split = 'train'),
           |te AS (SELECT doc_id, g.g8, tr.g8 IS NOT NULL AS hit
           |  FROM g LEFT JOIN tr USING (g8) WHERE split = 'test'),
           |a AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
           |    CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_leaked
           |  FROM te GROUP BY 1)
           |SELECT doc_id, n_grams, n_leaked,
           |  CAST((1000 * n_leaked) // n_grams AS BIGINT) AS leak_milli
           |FROM a""".stripMargin
      }),

    // Perplexity outliers (the CCNet filtering signal): per-language
    // z-scores of the q108 doc-level bigram NLL. Doc scores and both
    // moments are exact integer arithmetic (milli-nats, floored means,
    // integer squared deviations); the ONLY float op is the final
    // sqrt, a single correctly-rounded IEEE operation both engines
    // compute identically from identical integers. Signed z uses the
    // shared canonical-remainder floor division.
    QDef("q159_nll_outliers",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val withG = docs
          .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("lang"), col("toks"),
            gramHashesPositional(col("toks"), 2).as("g2arr"))
        val stream = withG
          .select(col("doc_id"), col("lang"), col("toks"),
            posexplode_outer(col("g2arr")).as(Seq("pos", "g2")))
          .filter(col("g2").isNotNull)
          .select(col("doc_id"), col("lang"), col("g2"),
            tokenHash(element_at(col("toks"), col("pos") + 1)).as("h1"))
          .localCheckpoint() // c2, c1, vocab and the probe share it
        val c2 = stream.groupBy("g2").agg(count(lit(1)).as("c2"))
        val c1 = stream.groupBy("h1").agg(count(lit(1)).as("c1"))
        val vDf = stream.agg(count_distinct(col("h1")).as("v"))
        val perDoc = stream
          .join(c2, "g2").join(c1, "h1")
          .crossJoin(broadcast(vDf))
          .withColumn("mnat", floor(lit(1000.0) * log(
            (col("c2").cast("double") + 1.0) /
              (col("c1").cast("double") + col("v").cast("double"))))
            .cast("long"))
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("nb"), sum(col("mnat")).as("smnat"))
          .withColumn("x", expr("(-smnat) div nb")) // mean milli-NLL ≥ 0
          .localCheckpoint() // moments + the z pass share it
        val mom = perDoc.groupBy("lang")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"))
          .withColumn("mean_x", expr("sx div n"))
        val dev = perDoc.join(broadcast(mom), "lang")
          .withColumn("d", col("x") - col("mean_x"))
        val std = dev.groupBy("lang")
          .agg(sum(col("d") * col("d")).as("devsq"), max("n").as("n2"))
          .withColumn("std_x",
            floor(sqrt(expr("devsq div n2").cast("double"))).cast("long"))
        dev.join(broadcast(std), "lang")
          .withColumn("z_centi", fdiv(lit(100L) * col("d"),
            greatest(col("std_x"), lit(1L))))
          .select(col("doc_id"), col("lang"), col("x").as("nll_milli"),
            col("z_centi"),
            (abs(col("z_centi")) >= 250L).cast("long").as("outlier"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks
              |  FROM documents),
              |st AS (SELECT doc_id, lang,
              |    unnest(${gram2Sql("toks")}) AS g2,
              |    unnest(CASE WHEN len(toks) >= 2 THEN
              |      list_transform(generate_series(1, len(toks) - 1),
              |        i -> ${hashSql("toks[i]")})
              |      ELSE [] END) AS h1
              |  FROM t),
              |c2 AS (SELECT g2, count(*) AS c2 FROM st GROUP BY 1),
              |c1 AS (SELECT h1, count(*) AS c1 FROM st GROUP BY 1),
              |v AS (SELECT count(DISTINCT h1) AS v FROM st),
              |pd AS (SELECT doc_id, lang,
              |    CAST(count(*) AS BIGINT) AS nb,
              |    CAST(sum(CAST(floor(1000.0 * ln(
              |      (c2.c2::DOUBLE + 1.0) / (c1.c1::DOUBLE + v.v::DOUBLE)
              |    )) AS BIGINT)) AS BIGINT) AS smnat
              |  FROM st JOIN c2 USING (g2) JOIN c1 USING (h1) CROSS JOIN v
              |  GROUP BY 1, 2),
              |px AS (SELECT doc_id, lang, (-smnat) // nb AS x FROM pd),
              |mo AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(x) AS BIGINT) AS sx FROM px GROUP BY 1),
              |mm AS (SELECT lang, n, sx // n AS mean_x FROM mo),
              |dv AS (SELECT px.doc_id, px.lang, px.x,
              |    px.x - mm.mean_x AS d, mm.n
              |  FROM px JOIN mm USING (lang)),
              |sd AS (SELECT lang,
              |    CAST(floor(sqrt(((CAST(sum(d*d) AS BIGINT)) // max(n))
              |      ::DOUBLE)) AS BIGINT) AS std_x
              |  FROM dv GROUP BY 1)
              |SELECT dv.doc_id, dv.lang, CAST(dv.x AS BIGINT)
              |    AS nll_milli,
              |  CAST(${fdivSql("100 * dv.d", "greatest(sd.std_x, 1)")}
              |    AS BIGINT) AS z_centi,
              |  CAST(CASE WHEN abs(${fdivSql("100 * dv.d",
                   "greatest(sd.std_x, 1)")}) >= 250
              |    THEN 1 ELSE 0 END AS BIGINT) AS outlier
              |FROM dv JOIN sd USING (lang)""".stripMargin))
  )

  /** DuckDB twin of gramHashesPositional(toks, 2) (duplicates kept). */
  private def gram2Sql(toks: String): String =
    s"CASE WHEN len($toks) >= 2 THEN " +
      s"list_transform(generate_series(1, len($toks) - 1), " +
      s"i -> ${hashSql(s"($toks[i] || ' ' || $toks[i+1])")}) " +
      "ELSE [] END"

  /** Exact FLOOR division for possibly-negative numerators (the shared
    * canonical-remainder idiom — PipelineQueries9's fdiv).
    */
  private def fdiv(s: org.apache.spark.sql.Column,
                   n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    ((s - ((s % n) + n) % n) / n).cast("long")

  private def fdivSql(s: String, n: String): String =
    s"(($s) - ((($s) % ($n)) + ($n)) % ($n)) // ($n)"
}
