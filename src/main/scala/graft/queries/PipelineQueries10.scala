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
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(list_zip($a, $b), x -> x[1] * x[2])), (p, q) -> p + q)"
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
        val ua = t.select(col("doc_id"), explode(col("toks")).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n_tok"), max("c").as("top1"))
        val bg = t.select(col("doc_id"),
            explode(when(size(col("toks")) >= 2,
              transform(sequence(lit(1), size(col("toks")) - 1),
                i => concat_ws(" ", element_at(col("toks"), i),
                  element_at(col("toks"), i + 1))))
              .otherwise(array().cast("array<string>"))).as("g"))
          .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
          .groupBy("doc_id")
          .agg(sum("c").as("n2"),
            sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup2"))
        ua.join(bg, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(expr("(1000 * dup2) div n2"), lit(0L)).as("dup2_milli"),
            expr("(1000 * top1) div n_tok").as("top1_milli"))
          .withColumn("keep",
            (col("dup2_milli") <= 200 && col("top1_milli") <= 300)
              .cast("long"))
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
             |FROM n GROUP BY 1""".stripMargin))
  )
}
