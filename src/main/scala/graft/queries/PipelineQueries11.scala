package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.BpeTrainer.adjacentPairs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Eleventh pipeline group — character-level signals, held-out LM
  * scoring, a second tokenizer family, and signal ensembling:
  *
  *  - q160: per-doc character-unigram entropy (quantized milli-nats) —
  *    the classic gibberish/binary-junk screen that token-level
  *    quality ops can't see (mojibake, base64 blobs and key-mash all
  *    read as "tokens" but have abnormal char distributions).
  *  - q161: shard mix-entropy audit — does q97's token-balanced shard
  *    assignment actually interleave sources inside every shard, or
  *    did a shard end up single-source? Entropy of the source
  *    distribution per shard, same quantization as q160.
  *  - q162: stupid-backoff held-out scoring (Brants et al., "Large
  *    Language Models in Machine Translation", EMNLP 2007): train
  *    bigram/unigram counts on a 90% hash split, score the 5% val
  *    split with S(w2|w1) = c2/c1 when the bigram was seen, else
  *    0.4·c1(w2)/N — the LM-quality signal that, unlike q108/q159,
  *    actually exercises the unseen-bigram path because the scored
  *    docs are disjoint from the training mass.
  *  - q163: WordPiece-scored tokenizer training ([[graft.ops
  *    .WordPieceTrainer]]) — likelihood-ranked merges, the BERT-family
  *    alternative to q99's frequency-ranked BPE.
  *  - q164: quality-signal ensemble — per-language percentile ranks of
  *    two independent signals (token length, char entropy) blended
  *    into one score, the FineWeb-style "mix your filters" step. Ranks
  *    come from value histograms (windows run over O(distinct values)
  *    per language, never the corpus — the q149 construction).
  *
  * Determinism: every cross-row sum is an integer (term-wise floored
  * milli-nat contributions, so float summation order can never
  * diverge); the only per-row float ops are single ln/multiply/divide
  * chains written with identical association in both engines; all
  * ratios are integer milli/nano units on non-negative ground
  * (`div` == `//` there).
  */
object PipelineQueries11 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** Locale-pinned double literal — the f-interpolator would use the
    * default locale and emit comma decimal separators on e.g. de_DE.
    */
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** Per-doc character histogram → (n, n_distinct, Σfloor(1000·c·lnc)).
    * The statistic is row-local, so it computes inside the scan via the
    * codegen'd [[graft.expressions.CharEntropyTerms]] kernel — NO
    * explode, NO shuffle; q160 is a map-only query. (The original
    * explode + (doc, char) double-aggregation construction shuffled
    * the full char stream; kernel == HOF equivalence is spec-pinned.)
    */
  private[queries] def charEnt(docs: DataFrame): DataFrame =
    docs.filter(length(col("text")) >= 1)
      .select(col("doc_id"), org.apache.spark.sql.GraftExpr.column(
        graft.expressions.CharEntropyTerms(
          org.apache.spark.sql.GraftExpr.expression(col("text")))).as("t"))
      .select(col("doc_id"), col("t.n").as("n"),
        col("t.k").as("n_distinct"), col("t.sterm").as("sterm"))

  /** Σ floor(1000·c·ln c) over a count column `c` — each term floored
    * BEFORE the sum, so the aggregate is an exact integer and
    * partition order can never change it.
    */
  private def entTermSum: Column =
    sum(floor(lit(1000.0) * col("c").cast("double") *
      log(col("c").cast("double"))).cast("long"))

  /** floor(1000·ln n) − (Σfloor(1000·c·ln c)) div n — the quantized
    * entropy; both pieces are integers by construction.
    */
  private[queries] def entMilli(n: String, sterm: String): Column =
    floor(lit(1000.0) * log(col(n).cast("double"))).cast("long") -
      expr(s"$sterm div $n")

  private[queries] def entSql(n: String, sterm: String): String =
    s"CAST(CAST(floor(1000.0 * ln(($n)::DOUBLE)) AS BIGINT) - " +
      s"(($sterm) // ($n)) AS BIGINT)"

  /** DuckDB twin of [[charEnt]] (three CTEs: ch, cc, ce). */
  private[queries] val charCtes =
    """ch AS (SELECT doc_id, unnest(list_transform(
      |    generate_series(1, len(text)), i -> substr(text, i, 1))) AS ch
      |  FROM documents WHERE len(text) >= 1),
      |cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      |ce AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |    CAST(count(*) AS BIGINT) AS n_distinct,
      |    CAST(sum(CAST(floor(1000.0 * c::DOUBLE * ln(c::DOUBLE))
      |      AS BIGINT)) AS BIGINT) AS sterm
      |  FROM cc GROUP BY 1)""".stripMargin

  private def wordpieceOracleSql(k: Int): String = {
    val toksFrag = "list_filter(string_split(p, ' '), x -> x != '')"
    val pairsFrag = "CASE WHEN len(toks) >= 2 THEN " +
      "list_transform(generate_series(1, len(toks) - 1), " +
      "i -> toks[i] || ' ' || toks[i+1]) ELSE [] END"
    val stages = (1 to k).map { i =>
      s"""x$i AS (SELECT $toksFrag AS toks FROM t${i - 1}),
         |u$i AS (SELECT tok, count(*) AS c FROM (
         |    SELECT unnest(toks) AS tok FROM x$i) z GROUP BY tok),
         |c$i AS (SELECT pair, count(*) AS cnt FROM (
         |    SELECT unnest($pairsFrag) AS pair FROM x$i) y GROUP BY pair),
         |m$i AS (SELECT $i AS iter, pair, cnt,
         |        (1000000000 * cnt) // (ua.c * ub.c) AS score_nano
         |        FROM c$i
         |        JOIN u$i ua ON ua.tok = split_part(pair, ' ', 1)
         |        JOIN u$i ub ON ub.tok = split_part(pair, ' ', 2)
         |        ORDER BY score_nano DESC, pair ASC LIMIT 1),
         |t$i AS (SELECT replace(p,
         |    ' ' || (SELECT replace(pair, ' ', '  ') FROM m$i) || ' ',
         |    ' ' || (SELECT replace(pair, ' ', chr(31)) FROM m$i) || ' ')
         |    AS p
         |  FROM t${i - 1})""".stripMargin
    }.mkString(",\n")
    val unions = (1 to k).map(i =>
      s"SELECT iter, pair, cnt, score_nano, " +
        s"replace(pair, ' ', chr(31)) AS merged FROM m$i")
      .mkString("\nUNION ALL\n")
    s"""WITH t0 AS (SELECT ' ' || array_to_string($toksSql, '  ') || ' '
       |  AS p FROM documents),
       |$stages
       |$unions""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // Character-unigram entropy per doc: the distribution screen for
    // gibberish/binary junk. The kernel computes the histogram terms
    // inside the scan — map-only, zero exchanges (contract-pinned);
    // the oracle spells the equivalent explode + double aggregation.
    QDef("q160_char_entropy",
      (s, dir) => charEnt(Tables.documents(s, dir))
        .select(col("doc_id"), col("n").as("n_chars"), col("n_distinct"),
          entMilli("n", "sterm").as("ent_milli")),
      Some(s"""WITH $charCtes
              |SELECT doc_id, n AS n_chars, n_distinct,
              |  ${entSql("n", "sterm")} AS ent_milli
              |FROM ce""".stripMargin)),

    // Shard mix-entropy: per q97-style token-balanced shard, the
    // entropy of its source distribution — a single-source shard
    // (ent_milli = 0) trains on un-interleaved data no matter how
    // balanced its token count is. The assignment rides ShardAssign's
    // scan (source is an `extra` column — no join-back); the audit
    // itself aggregates O(#shards · #sources) rows.
    QDef("q161_shard_mix_entropy",
      (s, dir) => {
        val asg = graft.ops.ShardAssign.tokenBalanced(
          Tables.documents(s, dir), nShards = 16,
          extra = Seq("source" -> col("source")))
        asg.groupBy("shard_id", "source").agg(count(lit(1)).as("c"))
          .groupBy("shard_id")
          .agg(sum("c").as("n_docs"), count(lit(1)).as("n_sources"),
            entTermSum.as("sterm"))
          .select(col("shard_id"), col("n_docs"), col("n_sources"),
            entMilli("n_docs", "sterm").as("ent_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
              |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |    ${hashSql("'shard:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |tot AS (SELECT sum(n_tokens) AS total FROM t),
              |c AS (SELECT doc_id, source,
              |    coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |      AS prev
              |  FROM t),
              |a AS (SELECT source,
              |    CAST(prev // greatest(tot.total // 16, 1) AS BIGINT)
              |      AS shard_id
              |  FROM c CROSS JOIN tot),
              |g AS (SELECT shard_id, source, count(*) AS c
              |  FROM a GROUP BY 1, 2),
              |e AS (SELECT shard_id, CAST(sum(c) AS BIGINT) AS n_docs,
              |    CAST(count(*) AS BIGINT) AS n_sources,
              |    CAST(sum(CAST(floor(1000.0 * c::DOUBLE * ln(c::DOUBLE))
              |      AS BIGINT)) AS BIGINT) AS sterm
              |  FROM g GROUP BY 1)
              |SELECT shard_id, n_docs, n_sources,
              |  ${entSql("n_docs", "sterm")} AS ent_milli
              |FROM e""".stripMargin)),

    // Stupid-backoff held-out scoring: bigram/unigram counts train on
    // the 90% hash split (buckets 0-17 of h%20), the val split
    // (bucket 18) is scored. Unlike q108/q159 — which score the
    // training corpus itself, where every bigram is by construction
    // seen — the disjoint split makes the backoff branch real:
    // n_backoff counts the val bigrams the train LM never saw. Scale
    // shape: count tables are vocabulary-sized and broadcast; only
    // the 5% val stream carries doc granularity; per-bigram scores
    // are floored milli-nats so the per-doc sum is exact.
    QDef("q162_backoff_score",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"),
            (tokenHash(concat(lit("bo:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .localCheckpoint() // train aggregates + val probe share it
        val trainToks = t.filter(col("b") < 18)
        val uni = trainToks.select(explode(col("toks")).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c1"))
          .localCheckpoint() // two probe joins + the total share it
        val nTot = uni.agg(sum("c1").as("n"))
        val big = trainToks
          .select(explode(adjacentPairs(col("toks"))).as("pair"))
          .groupBy("pair").agg(count(lit(1)).as("c2"))
        val valStream = t.filter(col("b") === 18)
          .select(col("doc_id"), col("toks"),
            posexplode(adjacentPairs(col("toks"))).as(Seq("pos", "pair")))
          .select(col("doc_id"), col("pair"),
            element_at(col("toks"), col("pos") + 1).as("w1"),
            element_at(col("toks"), col("pos") + 2).as("w2"))
        valStream
          .join(big, Seq("pair"), "left")
          .join(broadcast(uni.select(col("tok").as("w1"),
            col("c1").as("c1a"))), Seq("w1"), "left")
          .join(broadcast(uni.select(col("tok").as("w2"),
            col("c1").as("c1b"))), Seq("w2"), "left")
          .crossJoin(broadcast(nTot))
          .withColumn("mnat", floor(lit(1000.0) * log(
            when(col("c2").isNotNull,
              col("c2").cast("double") / col("c1a").cast("double"))
              .otherwise(lit(0.4) *
                coalesce(col("c1b"), lit(1L)).cast("double") /
                col("n").cast("double"))))
            .cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum("mnat").as("smnat"),
            sum(when(col("c2").isNull, 1L).otherwise(0L)).as("n_backoff"))
          .select(col("doc_id"), col("n_bigrams"),
            expr("(-smnat) div n_bigrams").as("nll_milli"),
            col("n_backoff"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks,
              |    ${hashSql("'bo:' || CAST(doc_id AS VARCHAR)")} % 20 AS b
              |  FROM documents),
              |tr AS (SELECT toks FROM t WHERE b < 18),
              |u AS (SELECT tok, count(*) AS c1 FROM (
              |    SELECT unnest(toks) AS tok FROM tr) z GROUP BY 1),
              |n AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM u),
              |bg AS (SELECT pair, count(*) AS c2 FROM (
              |    SELECT unnest(CASE WHEN len(toks) >= 2 THEN
              |      list_transform(generate_series(1, len(toks) - 1),
              |        i -> toks[i] || ' ' || toks[i+1])
              |      ELSE [] END) AS pair FROM tr) y GROUP BY 1),
              |vs AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
              |    toks[i] || ' ' || toks[i+1] AS pair
              |  FROM (SELECT doc_id, toks,
              |      unnest(generate_series(1, len(toks) - 1)) AS i
              |    FROM t WHERE b = 18 AND len(toks) >= 2) q),
              |sc AS (SELECT doc_id, bg.c2,
              |    CAST(floor(1000.0 * ln(CASE WHEN bg.c2 IS NOT NULL
              |      THEN bg.c2::DOUBLE / ua.c1::DOUBLE
              |      ELSE (${dbl(0.4)} * coalesce(ub.c1, 1)::DOUBLE)
              |        / n.n::DOUBLE END)) AS BIGINT) AS mnat
              |  FROM vs LEFT JOIN bg USING (pair)
              |    LEFT JOIN u ua ON ua.tok = vs.w1
              |    LEFT JOIN u ub ON ub.tok = vs.w2
              |    CROSS JOIN n)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
              |  CAST((-CAST(sum(mnat) AS BIGINT)) // count(*) AS BIGINT)
              |    AS nll_milli,
              |  CAST(sum(CASE WHEN c2 IS NULL THEN 1 ELSE 0 END)
              |    AS BIGINT) AS n_backoff
              |FROM sc GROUP BY 1""".stripMargin)),

    // WordPiece-scored tokenizer training: q99's loop with the
    // likelihood objective — each round's winner maximizes
    // cnt(ab)/(cnt(a)·cnt(b)) as an exact integer nano-score. The
    // oracle unrolls the k rounds and replays count/score/pick/apply
    // bit-identically (same tie-break, same integer division).
    QDef("q163_wordpiece_train",
      (s, dir) => {
        import s.implicits._
        graft.ops.WordPieceTrainer
          .trainArtifact(Tables.documents(s, dir), "text", k = 4,
            fpKey = s"$dir#documents#text")
          .map(m => (m.iter, m.pair, m.cnt, m.scoreNano, m.merged))
          .toDF("iter", "pair", "cnt", "score_nano", "merged")
      },
      Some(wordpieceOracleSql(4))),

    // Quality-signal ensemble: per-language percentile ranks of token
    // length and char entropy, blended 50/50 — ensembling independent
    // weak signals is the standard curation move (each signal's
    // failure mode is uncorrelated with the other's). Ranks come from
    // value HISTOGRAMS: the cumulative window runs over O(distinct
    // values) rows per language, the corpus only ever joins back on
    // (lang, value) — no corpus-scale window, no per-doc sort.
    QDef("q164_quality_ensemble",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val ent = charEnt(docs)
          .select(col("doc_id"), entMilli("n", "sterm").as("ent"))
        val base = docs
          .select(col("doc_id"), col("lang"),
            size(tokens(col("text"))).cast("long").as("len"))
          .join(ent, "doc_id")
          .localCheckpoint() // two histograms + the final join share it
        val n = base.groupBy("lang").agg(count(lit(1)).as("n"))
        def ranks(v: String, out: String): DataFrame = {
          val w = Window.partitionBy("lang").orderBy(v)
            .rowsBetween(Window.unboundedPreceding, 0)
          base.groupBy("lang", v).agg(count(lit(1)).as("c"))
            .withColumn("cumlt", sum("c").over(w) - col("c"))
            .join(broadcast(n), "lang")
            .select(col("lang"), col(v),
              expr("(1000 * cumlt) div greatest(n - 1, 1)").as(out))
        }
        base
          .join(ranks("len", "r_len"), Seq("lang", "len"))
          .join(ranks("ent", "r_ent"), Seq("lang", "ent"))
          .select(col("doc_id"), col("lang"), col("r_len"), col("r_ent"),
            expr("(r_len + r_ent) div 2").as("q_milli"))
      },
      Some(s"""WITH $charCtes,
              |en AS (SELECT doc_id, ${entSql("n", "sterm")} AS ent
              |  FROM ce),
              |b AS (SELECT d.doc_id, d.lang,
              |    CAST(len($toksSql) AS BIGINT) AS len, en.ent
              |  FROM documents d JOIN en ON d.doc_id = en.doc_id),
              |nn AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
              |  FROM b GROUP BY 1),
              |h1 AS (SELECT lang, len AS v, count(*) AS c
              |  FROM b GROUP BY 1, 2),
              |w1 AS (SELECT lang, v, CAST(sum(c) OVER (PARTITION BY lang
              |    ORDER BY v) - c AS BIGINT) AS cumlt FROM h1),
              |h2 AS (SELECT lang, ent AS v, count(*) AS c
              |  FROM b GROUP BY 1, 2),
              |w2 AS (SELECT lang, v, CAST(sum(c) OVER (PARTITION BY lang
              |    ORDER BY v) - c AS BIGINT) AS cumlt FROM h2)
              |SELECT b.doc_id, b.lang,
              |  CAST((1000 * w1.cumlt) // greatest(nn.n - 1, 1) AS BIGINT)
              |    AS r_len,
              |  CAST((1000 * w2.cumlt) // greatest(nn.n - 1, 1) AS BIGINT)
              |    AS r_ent,
              |  CAST(((1000 * w1.cumlt) // greatest(nn.n - 1, 1) +
              |    (1000 * w2.cumlt) // greatest(nn.n - 1, 1)) // 2
              |    AS BIGINT) AS q_milli
              |FROM b JOIN nn USING (lang)
              |  JOIN w1 ON w1.lang = b.lang AND w1.v = b.len
              |  JOIN w2 ON w2.lang = b.lang AND w2.v = b.ent""".stripMargin))
  )
}
