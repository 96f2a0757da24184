package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

/** Thirteenth pipeline group — corpus-composition statistics:
  *
  *  - q169: source-pair cross-entropy — H(Pa, Pb) over the per-source
  *    unigram distributions restricted to the global top-50k
  *    vocabulary (add-one smoothing on the target side); the cap
  *    bounds per-pair work at any tail size.
  *    The distributional-similarity matrix behind "which sources are
  *    interchangeable / which one drifted": a source whose best
  *    cross-entropy partner is far from its self-entropy is an
  *    outlier mix member.
  *  - q170: train/test PSI (population stability index) over token-
  *    length buckets — the standard drift score between two samples;
  *    here it audits that a hash split didn't skew the length
  *    distribution (a non-uniform doc_id hash would show up
  *    immediately).
  *  - q171: language × source contingency lift — observed/expected
  *    milli ratios per cell, the composition audit that flags a
  *    source feeding one language only.
  *
  * All three collapse the corpus in ONE aggregation pass each
  * (vocab-sized, bucket-sized, |langs|×|sources|-sized tables after
  * that); every cross-row sum is an integer; the only float ops are
  * per-row ln chains on identically-derived doubles, floored before
  * any sum.
  */
object PipelineQueries13 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  val defs: Seq[QDef] = Seq(

    // Source-pair cross-entropy: per-source term counts (ONE corpus
    // aggregation) restricted to the global top-K vocab, then every
    // ordered pair (a, b) scores
    // H = −Σ_w c_a(w)·floor(1000·ln((c_b(w)+1)/(N_b+V))) / N_a.
    // The pair fan-out happens on the CAPPED vocab table (≤ K·|S|
    // rows cross |S| sources → O(K·S²) term-ops, embarrassingly
    // parallel), never the corpus; totals and the source list
    // broadcast. An S×S matrix with V-dim inner products is
    // irreducibly Ω(S²) — the cap makes the per-pair factor a
    // constant. Self pairs (a == a) report the smoothed self-entropy
    // — the natural diagonal baseline.
    QDef("q169_source_cross_entropy",
      (s, dir) => {
        val raw = Tables.documents(s, dir)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
          .localCheckpoint() // vocab cap + capped table share it
        // the metric is DEFINED over the global top-K vocabulary
        // (count desc, tok tiebreak): per-pair work is then bounded by
        // K however large the long tail grows — the q96 cap pattern.
        // At sf scale the full vocab fits under K, so the cap is
        // exact there.
        val vocab = raw.groupBy("tok").agg(sum("c").as("cg"))
          .orderBy(col("cg").desc, col("tok")).limit(50000)
          .select(col("tok"))
        val t = raw.join(broadcast(vocab), "tok")
          .localCheckpoint() // probe side + totals + vocab share it
        val totals = t.groupBy("source").agg(sum("c").as("n"))
          .localCheckpoint() // joined twice (a and b sides)
        val v = t.agg(count_distinct(col("tok")).as("v"))
        val bSide = t.select(col("source").as("src_b"),
          col("tok"), col("c").as("cb"))
        val pairs = t.select(col("source").as("src_a"), col("tok"),
            col("c").as("ca"))
          .crossJoin(broadcast(totals.select(col("source").as("src_b"))))
          .join(bSide, Seq("src_b", "tok"), "left")
          .crossJoin(broadcast(v))
          .join(broadcast(totals.select(col("source").as("src_b"),
            col("n").as("nb"))), "src_b")
        pairs
          .withColumn("h", floor(lit(1000.0) * log(
            (coalesce(col("cb"), lit(0L)) + 1L).cast("double") /
              (col("nb") + col("v")).cast("double"))).cast("long"))
          .groupBy("src_a", "src_b")
          .agg(sum(col("ca") * col("h")).as("sh"))
          .join(broadcast(totals.select(col("source").as("src_a"),
            col("n").as("na"))), "src_a")
          .select(col("src_a"), col("src_b"), col("na").as("n_tokens_a"),
            expr("(-sh) div na").as("xent_milli"))
      },
      Some(s"""WITH e AS (SELECT source, unnest($toksSql) AS tok
              |  FROM documents),
              |traw AS (SELECT source, tok, count(*) AS c
              |  FROM e GROUP BY 1, 2),
              |vcap AS (SELECT tok FROM (
              |    SELECT tok, sum(c) AS cg FROM traw GROUP BY 1)
              |  ORDER BY cg DESC, tok LIMIT 50000),
              |t AS (SELECT traw.* FROM traw JOIN vcap USING (tok)),
              |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
              |  FROM t GROUP BY 1),
              |v AS (SELECT count(DISTINCT tok) AS v FROM t),
              |p AS (SELECT a.source AS src_a, sb.source AS src_b,
              |    a.tok, a.c AS ca, b.c AS cb
              |  FROM t a
              |  CROSS JOIN (SELECT source FROM tot) sb
              |  LEFT JOIN t b ON b.source = sb.source AND b.tok = a.tok),
              |h AS (SELECT src_a, src_b, ca,
              |    CAST(floor(1000.0 * ln(
              |      (coalesce(cb, 0) + 1)::DOUBLE /
              |      (tb.n + v.v)::DOUBLE)) AS BIGINT) AS h
              |  FROM p JOIN tot tb ON tb.source = p.src_b CROSS JOIN v),
              |g AS (SELECT src_a, src_b,
              |    CAST(sum(ca * h) AS BIGINT) AS sh
              |  FROM h GROUP BY 1, 2)
              |SELECT src_a, src_b, ta.n AS n_tokens_a,
              |  CAST((-sh) // ta.n AS BIGINT) AS xent_milli
              |FROM g JOIN tot ta ON ta.source = g.src_a""".stripMargin)),

    // Train/test PSI over token-length buckets: the 90/5/5 hash split
    // (train = buckets 0-17, test = 19), a fixed 6-rung length
    // ladder, add-one smoothing so empty buckets stay defined, and
    // per-bucket PSI terms Σ(p−q)·ln(p/q) in micro units. The corpus
    // collapses to 6 rows per side in one aggregation; the bucket
    // frame is a literal explode so both engines enumerate all rungs.
    QDef("q170_split_psi",
      (s, dir) => {
        val lenB = {
          val l = col("len")
          when(l <= 16, 0L).when(l <= 32, 1L).when(l <= 64, 2L)
            .when(l <= 128, 3L).when(l <= 256, 4L).otherwise(5L)
        }
        val t = Tables.documents(s, dir)
          .select(size(tokens(col("text"))).as("len"),
            (tokenHash(concat(lit("split:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .filter(col("b") < 18 || col("b") === 19)
          .select(lenB.as("bucket"), (col("b") === 19).as("is_test"))
          .groupBy("bucket")
          .agg(count_if(!col("is_test")).as("ct"),
            count_if(col("is_test")).as("cq"))
        val buckets = Tables.documents(s, dir).sparkSession.range(0, 1)
          .select(explode(typedLit((0L to 5L))).as("bucket"))
        val filled = buckets.join(t, Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("ct"), lit(0L)).as("n_train"),
            coalesce(col("cq"), lit(0L)).as("n_test"))
          .localCheckpoint() // totals + the term pass share it
        val tot = filled.agg(sum("n_train").as("nt"), sum("n_test").as("nq"))
        filled.crossJoin(broadcast(tot))
          .withColumn("p", (col("n_train") + 1L).cast("double") /
            (col("nt") + 6L).cast("double"))
          .withColumn("q", (col("n_test") + 1L).cast("double") /
            (col("nq") + 6L).cast("double"))
          .select(col("bucket"), col("n_train"), col("n_test"),
            floor(lit(1000000.0) * ((col("p") - col("q")) *
              log(col("p") / col("q")))).cast("long").as("psi_micro"))
      },
      Some(s"""WITH d AS (SELECT len($toksSql) AS len,
              |    ${hashSql("'split:' || CAST(doc_id AS VARCHAR)")} % 20
              |      AS b
              |  FROM documents),
              |f AS (SELECT CASE WHEN len <= 16 THEN 0
              |      WHEN len <= 32 THEN 1 WHEN len <= 64 THEN 2
              |      WHEN len <= 128 THEN 3 WHEN len <= 256 THEN 4
              |      ELSE 5 END AS bucket, b = 19 AS is_test
              |  FROM d WHERE b < 18 OR b = 19),
              |c AS (SELECT bucket,
              |    CAST(sum(CASE WHEN is_test THEN 0 ELSE 1 END)
              |      AS BIGINT) AS ct,
              |    CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END)
              |      AS BIGINT) AS cq
              |  FROM f GROUP BY 1),
              |bk AS (SELECT CAST(unnest([0, 1, 2, 3, 4, 5]) AS BIGINT)
              |  AS bucket),
              |fl AS (SELECT bk.bucket, coalesce(c.ct, 0) AS n_train,
              |    coalesce(c.cq, 0) AS n_test
              |  FROM bk LEFT JOIN c USING (bucket)),
              |tt AS (SELECT CAST(sum(n_train) AS BIGINT) AS nt,
              |    CAST(sum(n_test) AS BIGINT) AS nq FROM fl)
              |SELECT bucket, n_train, n_test,
              |  CAST(floor(1000000.0 * (
              |    ((n_train + 1)::DOUBLE / (nt + 6)::DOUBLE -
              |     (n_test + 1)::DOUBLE / (nq + 6)::DOUBLE) *
              |    ln(((n_train + 1)::DOUBLE / (nt + 6)::DOUBLE) /
              |       ((n_test + 1)::DOUBLE / (nq + 6)::DOUBLE))))
              |    AS BIGINT) AS psi_micro
              |FROM fl CROSS JOIN tt""".stripMargin)),

    // Language × source contingency lift: observed count vs the
    // independence expectation, both in integer milli. lift < 1000
    // marks an under-represented cell, a missing row a source that
    // never feeds the language. Bound: the larger product is the lift
    // numerator 1000·n·n_tot, so n·n_tot must stay under ~9.2·10¹⁵
    // (e.g. a 10⁹-doc corpus with cells up to ~10⁶ docs); beyond
    // that, compute the ratios on margin-preserving samples. One
    // corpus aggregation; everything after runs on |L|×|S| rows.
    QDef("q171_lang_source_lift",
      (s, dir) => {
        val g = Tables.documents(s, dir)
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
          .localCheckpoint() // margins + the lift pass share it
        val nl = g.groupBy("lang").agg(sum("n").as("n_lang"))
        val ns = g.groupBy("source").agg(sum("n").as("n_source"))
        val nt = g.agg(sum("n").as("n_tot"))
        g.join(broadcast(nl), "lang").join(broadcast(ns), "source")
          .crossJoin(broadcast(nt))
          .select(col("lang"), col("source"), col("n"),
            expr("(1000 * n_lang * n_source) div n_tot")
              .as("expected_milli"),
            expr("(1000 * n * n_tot) div (n_lang * n_source)")
              .as("lift_milli"))
      },
      Some("""WITH g AS (SELECT lang, source, count(*) AS n
             |  FROM documents GROUP BY 1, 2),
             |nl AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
             |  FROM g GROUP BY 1),
             |ns AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_source
             |  FROM g GROUP BY 1),
             |nt AS (SELECT CAST(sum(n) AS BIGINT) AS n_tot FROM g)
             |SELECT lang, source, CAST(n AS BIGINT) AS n,
             |  CAST((1000 * n_lang * n_source) // n_tot AS BIGINT)
             |    AS expected_milli,
             |  CAST((1000 * n * n_tot) // (n_lang * n_source) AS BIGINT)
             |    AS lift_milli
             |FROM g JOIN nl USING (lang) JOIN ns USING (source)
             |CROSS JOIN nt""".stripMargin))
  )
}
