package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.VectorSearch.{dot, planeVector, toDouble}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nineteenth pipeline group — classifier evaluation and corpus
  * versioning:
  *
  *  - q189: exact AUC of the q86/q177 quality classifier against the
  *    even-label truth, computed from the SCORE-VALUE HISTOGRAM: the
  *    Mann-Whitney rank statistic needs a global ordering, but the
  *    cumulative negative count runs as a window over O(distinct
  *    quantized scores) aggregated rows — the q164 histogram shape —
  *    so no corpus-scale sort or window exists anywhere. Ties get the
  *    standard half credit via the doubled numerator; every term is
  *    an exact integer in both engines.
  *  - q190: corpus snapshot diff — the data-versioning audit a corpus
  *    refresh ships with (added / removed / changed / unchanged, doc
  *    and token mass per status). Versions derive from the hash split
  *    (v1 = buckets 0..18, v2 = buckets 1..19, with bucket 10's text
  *    edited in v2); the diff itself is ONE full-outer equi join of
  *    content HASHES — at 100 TB only 8-byte hashes and counts
  *    shuffle, never document text, and the join co-partitions on
  *    doc_id.
  */
object PipelineQueries19 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** The 24-component minhash signature as DuckDB SQL (q140's oracle
    * replay fragment — same affine family as minhashAffine). */
  private def minsSql: String = (0 until 24).map { j =>
    val (a, b) = affineParam(j)
    s"list_min(list_transform(sh, h -> (h * $a + $b) % $MinhashPrime))"
  }.mkString("[", ",\n  ", "]")

  val defs: Seq[QDef] = Seq(

    // AUC = [Σ_v 2·pos(v)·negBelow(v) + pos(v)·neg(v)] / (2·P·N) over
    // milli-quantized logits (the tie granularity is the documented
    // quantization; floor on identically-derived doubles is
    // engine-identical). The numerator stays under 2·P·N ≤ ~1e9 at
    // sf1, and the micro-scaled division is exact integer arithmetic.
    QDef("q189_classifier_auc",
      (s, dir) => {
        val w = planeVector(9999, 64)
        val logit = dot(toDouble(col("embedding")), typedLit(w)) +
          lit(-0.05)
        val hist = Tables.embeddings(s, dir)
          .select(floor(logit * 1000.0).cast("long").as("score"),
            (col("label") % 2 === 0).cast("long").as("pos"))
          .groupBy("score")
          .agg(sum("pos").as("np"),
            sum(lit(1L) - col("pos")).as("nn"))
        // cumulative negatives strictly below each score value — a
        // window over the O(distinct scores) histogram only
        val wv = Window.orderBy("score")
          .rowsBetween(Window.unboundedPreceding, -1)
        hist
          .withColumn("neg_below", coalesce(sum("nn").over(wv), lit(0L)))
          .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
            sum(col("np") * (lit(2L) * col("neg_below") + col("nn")))
              .as("num2"))
          .select(col("n_pos"), col("n_neg"),
            expr("(1000000 * num2) div (2 * n_pos * n_neg)")
              .as("auc_micro"))
      },
      Some {
        val wLit = planeVector(9999, 64).map(dbl).mkString("[", ", ", "]")
        val vSql = "list_transform(embedding, x -> x::DOUBLE)"
        val dotSql = VectorOracleSql.dot(vSql, wLit)
        s"""WITH b AS (SELECT
           |    CAST(floor(($dotSql + ${dbl(-0.05)}) * 1000.0) AS BIGINT)
           |      AS score,
           |    CASE WHEN label % 2 = 0 THEN 1 ELSE 0 END AS pos
           |  FROM embeddings),
           |h AS (SELECT score, CAST(sum(pos) AS BIGINT) AS np,
           |    CAST(sum(1 - pos) AS BIGINT) AS nn
           |  FROM b GROUP BY 1),
           |c AS (SELECT score, np, nn,
           |    coalesce(sum(nn) OVER (ORDER BY score
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           |      0) AS neg_below
           |  FROM h)
           |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
           |  CAST(sum(nn) AS BIGINT) AS n_neg,
           |  CAST((1000000 * CAST(sum(np * (2 * neg_below + nn))
           |    AS BIGINT)) // (2 * CAST(sum(np) AS BIGINT)
           |    * CAST(sum(nn) AS BIGINT)) AS BIGINT) AS auc_micro
           |FROM c""".stripMargin
      }),

    // Snapshot diff: content hashes for both versions are computed in
    // the SAME scan (the edited-text hash is a second column, not a
    // second pass); the checkpointed base self-joins full-outer on
    // doc_id and the status rollup is one aggregation.
    QDef("q190_snapshot_diff",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("n_toks"),
            tokenHash(col("text")).as("h1"),
            tokenHash(concat(col("text"), lit(" v2-edit"))).as("h2"),
            (tokenHash(concat(lit("ver:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .localCheckpoint() // v1 + v2 derive from one scan
        val v1 = base.filter(col("b") <= 18)
          .select(col("doc_id"), col("h1").as("ha"),
            col("n_toks").as("ta"))
        val v2 = base.filter(col("b") >= 1)
          .select(col("doc_id"),
            when(col("b") === 10, col("h2")).otherwise(col("h1")).as("hb"),
            col("n_toks").as("tb"))
        v1.join(v2, Seq("doc_id"), "full_outer")
          .select(
            when(col("ha").isNull, "added")
              .when(col("hb").isNull, "removed")
              .when(col("ha") =!= col("hb"), "changed")
              .otherwise("unchanged").as("status"),
            coalesce(col("tb"), col("ta")).as("n_toks"))
          .groupBy("status")
          .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("sum_toks"))
      },
      Some(s"""WITH base AS (SELECT doc_id,
              |    CAST(len($toksSql) AS BIGINT) AS n_toks,
              |    ${hashSql("text")} AS h1,
              |    ${hashSql("text || ' v2-edit'")} AS h2,
              |    ${hashSql("'ver:' || CAST(doc_id AS VARCHAR)")} % 20 AS b
              |  FROM documents),
              |v1 AS (SELECT doc_id, h1 AS ha, n_toks AS ta
              |  FROM base WHERE b <= 18),
              |v2 AS (SELECT doc_id,
              |    CASE WHEN b = 10 THEN h2 ELSE h1 END AS hb,
              |    n_toks AS tb
              |  FROM base WHERE b >= 1),
              |d AS (SELECT CASE WHEN ha IS NULL THEN 'added'
              |      WHEN hb IS NULL THEN 'removed'
              |      WHEN ha <> hb THEN 'changed'
              |      ELSE 'unchanged' END AS status,
              |    coalesce(tb, ta) AS n_toks
              |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
              |SELECT status, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_toks) AS BIGINT) AS sum_toks
              |FROM d GROUP BY status""".stripMargin)),

    // Perplexity-cutoff survival curve: how much token mass remains
    // under each NLL threshold — the planning table a CCNet-style
    // perplexity filter is tuned FROM (q96 buckets into fixed
    // terciles; this emits the whole curve). Per-doc NLL is q78's
    // integer milli-nat machinery (exact long sums); the cumulative
    // mass window runs over the O(#buckets) histogram only.
    QDef("q191_nll_mass_curve",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toksDf = docs
          .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
          .localCheckpoint() // vocab aggregation + probe share it
        val freq = toksDf.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val totalDf = freq.agg(sum("cnt").as("total"))
        val vocab = freq.orderBy(col("cnt").desc, col("tok")).limit(50000)
        val p = when(col("cnt").isNotNull,
          col("total").cast("double") / col("cnt").cast("double"))
          .otherwise(col("total").cast("double") * 2.0) // OOV: p = 1/(2N)
        val hist = toksDf
          .join(broadcast(vocab), Seq("tok"), "left")
          .crossJoin(broadcast(totalDf))
          .withColumn("mnat", floor(lit(1000.0) * log(p)).cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_tokens"), sum("mnat").as("smnat"))
          .withColumn("bucket", expr("(smnat div n_tokens) div 250"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("toks"))
        // running mass AND grand total as two frames of the SAME
        // O(#buckets) histogram window — one pass, no self-reference
        // (a hist.agg() cross-join would re-execute the corpus-side
        // lineage a second time)
        val wv = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        hist
          .withColumn("cum_toks", sum("toks").over(wv))
          .withColumn("total_toks", sum("toks").over(wAll))
          .select(col("bucket"), col("n_docs"), col("toks"),
            col("cum_toks"),
            expr("(1000 * cum_toks) div total_toks").as("cum_frac_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
              |f AS (SELECT tok, count(*) AS cnt FROM e GROUP BY tok),
              |tot AS (SELECT sum(cnt) AS total FROM f),
              |v AS (SELECT tok, cnt FROM f
              |  ORDER BY cnt DESC, tok LIMIT 50000),
              |s AS (SELECT e.doc_id,
              |    CAST(count(*) AS BIGINT) AS n_tokens,
              |    CAST(sum(CAST(floor(1000.0 * ln(CASE
              |      WHEN v.cnt IS NOT NULL THEN tot.total::DOUBLE / v.cnt
              |      ELSE tot.total::DOUBLE * 2.0 END)) AS BIGINT))
              |      AS BIGINT) AS smnat
              |  FROM e LEFT JOIN v USING (tok) CROSS JOIN tot
              |  GROUP BY e.doc_id),
              |h AS (SELECT (smnat // n_tokens) // 250 AS bucket,
              |    CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(sum(n_tokens) AS BIGINT) AS toks
              |  FROM s GROUP BY 1),
              |tt AS (SELECT CAST(sum(toks) AS BIGINT) AS total_toks FROM h)
              |SELECT CAST(bucket AS BIGINT) AS bucket, n_docs, toks,
              |  CAST(sum(toks) OVER (ORDER BY bucket
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS BIGINT) AS cum_toks,
              |  (1000 * CAST(sum(toks) OVER (ORDER BY bucket
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS BIGINT)) // tt.total_toks AS cum_frac_milli
              |FROM h CROSS JOIN tt""".stripMargin)),

    // Temperature-sampling sweep: per-language token shares under
    // alpha ∈ {1/4, 1/2, 3/4} — the mixing-planning table behind
    // q83's single-alpha resampler. The exponents are deliberately
    // sqrt-COMPOSABLE (n^(1/4) = sqrt(sqrt n), n^(3/4) =
    // sqrt(n)·sqrt(sqrt n)): IEEE sqrt is correctly rounded in both
    // engines, so no libm pow() enters the cross-engine gate. Weights
    // quantize to integer micros BEFORE the per-alpha normalization
    // sum (float sums are order-dependent; integer sums are not).
    QDef("q192_temperature_sweep",
      (s, dir) => {
        val langTok = Tables.documents(s, dir)
          .groupBy("lang")
          .agg(sum(size(tokens(col("text"))).cast("long")).as("n"))
        val w = when(col("alpha_milli") === 250,
          sqrt(sqrt(col("n").cast("double"))))
          .when(col("alpha_milli") === 500, sqrt(col("n").cast("double")))
          .otherwise(sqrt(col("n").cast("double")) *
            sqrt(sqrt(col("n").cast("double"))))
        // per-alpha normalizer as a window over the O(3·#langs)
        // aggregated frame — one pass; a groupBy + join-back would
        // re-execute the corpus tokenize lineage a second time
        val wA = Window.partitionBy("alpha_milli")
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)
        langTok
          .select(col("lang"), col("n"),
            explode(typedLit(Seq(250, 500, 750))).as("alpha_milli"))
          .withColumn("w_micro",
            floor(lit(1000000.0) * w).cast("long"))
          .withColumn("tw", sum("w_micro").over(wA))
          .select(col("lang"), col("alpha_milli").cast("long")
            .as("alpha_milli"), col("n"), col("w_micro"),
            expr("(1000 * w_micro) div tw").as("share_milli"))
      },
      Some(s"""WITH lt AS (SELECT lang,
              |    CAST(sum(len($toksSql)) AS BIGINT) AS n
              |  FROM documents GROUP BY lang),
              |x AS (SELECT lang, n,
              |    CAST(unnest([250, 500, 750]) AS INT) AS alpha_milli
              |  FROM lt),
              |wt AS (SELECT lang, alpha_milli, n,
              |    CAST(floor(1000000.0 * CASE alpha_milli
              |      WHEN 250 THEN sqrt(sqrt(n::DOUBLE))
              |      WHEN 500 THEN sqrt(n::DOUBLE)
              |      ELSE sqrt(n::DOUBLE) * sqrt(sqrt(n::DOUBLE)) END)
              |      AS BIGINT) AS w_micro
              |  FROM x),
              |tot AS (SELECT alpha_milli,
              |    CAST(sum(w_micro) AS BIGINT) AS tw
              |  FROM wt GROUP BY 1)
              |SELECT wt.lang, CAST(wt.alpha_milli AS BIGINT)
              |    AS alpha_milli, wt.n, wt.w_micro,
              |  (1000 * wt.w_micro) // tot.tw AS share_milli
              |FROM wt JOIN tot USING (alpha_milli)""".stripMargin)),

    // SimHash Hamming-radius operating curve: precision/recall of
    // "dist <= r" (r = 0..3) against exact-Jaccard >= 0.8 truth — the
    // q155 threshold-sweep companion for the OTHER near-dup family
    // (q155 dials MinHash-LSH's Jaccard threshold; this dials
    // SimHash's radius). Both pair sets come from the bounded
    // generators (byte-blocked simhash join, full recall to r=3 by
    // pigeonhole; LSH bands + exact verify for truth); the sweep
    // itself runs on the PAIR frames — corpus-mass work happens once,
    // the 4 radii reuse it. The oracle brute-forces both sides.
    QDef("q193_simhash_radius_sweep",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.documents(s, dir)
        val sim = graft.ops.Dedup
          .nearDupSimhash(docs, "doc_id", "text", maxDist = 3)
          .select(col("doc_a"), col("doc_b"), col("dist"))
        val truth = graft.ops.Dedup
          .nearDupMinhashArtifact(docs, "doc_id", "text",
            fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
          .localCheckpoint() // joined against pred + counted
        val nTruth = truth.agg(count(lit(1)).as("n_truth"))
        val counts = sim
          .join(broadcast(truth), Seq("doc_a", "doc_b"), "left")
          .select(col("dist"), coalesce(col("hit"), lit(0L)).as("hit"),
            explode(typedLit(Seq(0, 1, 2, 3))).as("r"))
          .filter(col("dist") <= col("r"))
          .groupBy("r")
          .agg(count(lit(1)).as("n_pred"), sum("hit").as("n_inter"))
        Seq(0, 1, 2, 3).toDF("r")
          .join(broadcast(counts), Seq("r"), "left")
          .crossJoin(broadcast(nTruth))
          .select(col("r").cast("long").as("r"),
            coalesce(col("n_pred"), lit(0L)).as("n_pred"),
            col("n_truth"),
            coalesce(col("n_inter"), lit(0L)).as("n_inter"))
          .withColumn("prec_milli",
            expr("(1000 * n_inter) div greatest(n_pred, 1)"))
          .withColumn("rec_milli",
            expr("(1000 * n_inter) div greatest(n_truth, 1)"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |h AS (SELECT doc_id, list_transform(toks,
              |    t -> ${hashSql("t")}) AS hs FROM t),
              |sh AS (SELECT doc_id,
              |  list_sum(list_transform(generate_series(0, 31), b ->
              |    CASE WHEN list_sum(list_transform(hs,
              |      h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
              |    THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
              |  FROM h),
              |pred AS (SELECT a.doc_id AS da, b.doc_id AS db,
              |    bit_count(xor(a.simhash, b.simhash)) AS dist
              |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
              |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
              |sg AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS sh
              |  FROM t WHERE len(toks) >= 3),
              |m AS (SELECT doc_id, sh, $minsSql AS sig FROM sg),
              |truth AS (SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM m a JOIN m b ON a.doc_id < b.doc_id
              |  WHERE len(list_filter(generate_series(1, 12), k ->
              |      a.sig[2*k-1] = b.sig[2*k-1] AND a.sig[2*k] = b.sig[2*k]))
              |    > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth
              |  FROM truth),
              |rs AS (SELECT unnest(generate_series(0, 3)) AS r),
              |cnt AS (SELECT rs.r,
              |    CAST(count(pred.da) AS BIGINT) AS n_pred,
              |    CAST(sum(CASE WHEN truth.da IS NOT NULL
              |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inter
              |  FROM rs LEFT JOIN pred ON pred.dist <= rs.r
              |    LEFT JOIN truth ON truth.da = pred.da
              |      AND truth.db = pred.db
              |  GROUP BY rs.r)
              |SELECT CAST(r AS BIGINT) AS r,
              |  coalesce(n_pred, 0) AS n_pred, nt.n_truth,
              |  coalesce(n_inter, 0) AS n_inter,
              |  (1000 * coalesce(n_inter, 0)) //
              |    greatest(coalesce(n_pred, 0), 1) AS prec_milli,
              |  (1000 * coalesce(n_inter, 0)) //
              |    greatest(nt.n_truth, 1) AS rec_milli
              |FROM cnt CROSS JOIN nt""".stripMargin)),

    // Batch-size padding sweep: total padding waste of length-sorted
    // batching at 8/32/128 docs per batch — the dynamic-batching
    // planning table behind q127's single setting (bigger batches
    // amortize scheduling but pay more padding inside each batch).
    // The global (len, doc_id) rank is computed ONCE via the
    // composite-bucket two-level prefix sum (no global sort, no
    // unbounded window); the sweep is an explode + two aggregations.
    QDef("q194_batchsize_sweep",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"),
            size(tokens(col("text"))).cast("long").as("len"))
          .withColumn("bucket",
            struct(col("len"), floor(col("doc_id") / lit(1024L)).as("idr")))
          .withColumn("one", lit(1L))
          .localCheckpoint() // window pass + offsets agg share this
        graft.ops.PrefixSum
          .twoLevelPrev(t, Seq(), "bucket", "doc_id", "one", "len",
            outCol = "rank")
          .select(col("rank"), col("len"),
            explode(typedLit(Seq(8, 32, 128))).as("bsz"))
          .withColumn("batch_id", expr("rank div bsz"))
          .groupBy("bsz", "batch_id")
          .agg(count(lit(1)).as("nd"), max("len").as("mx"),
            sum("len").as("sl"))
          .groupBy("bsz")
          .agg(count(lit(1)).as("n_batches"),
            sum(expr("nd * mx - sl")).as("pad_waste"),
            sum("sl").as("sum_len"))
          .select(col("bsz").cast("long").as("batch_size"),
            col("n_batches"), col("pad_waste"), col("sum_len"),
            expr("(1000 * pad_waste) div (pad_waste + sum_len)")
              .as("waste_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |  CAST(len($toksSql) AS BIGINT) AS len FROM documents),
              |r AS (SELECT doc_id, len,
              |  row_number() OVER (ORDER BY len, doc_id) - 1 AS rank
              |  FROM t),
              |x AS (SELECT rank, len,
              |  CAST(unnest([8, 32, 128]) AS INT) AS bsz FROM r),
              |b AS (SELECT bsz, rank // bsz AS batch_id,
              |    CAST(count(*) AS BIGINT) AS nd,
              |    CAST(max(len) AS BIGINT) AS mx,
              |    CAST(sum(len) AS BIGINT) AS sl
              |  FROM x GROUP BY 1, 2)
              |SELECT CAST(bsz AS BIGINT) AS batch_size,
              |  CAST(count(*) AS BIGINT) AS n_batches,
              |  CAST(sum(nd * mx - sl) AS BIGINT) AS pad_waste,
              |  CAST(sum(sl) AS BIGINT) AS sum_len,
              |  (1000 * CAST(sum(nd * mx - sl) AS BIGINT)) //
              |    (CAST(sum(nd * mx - sl) AS BIGINT)
              |     + CAST(sum(sl) AS BIGINT)) AS waste_milli
              |FROM b GROUP BY bsz""".stripMargin)),

    // Dedup-cluster source purity: for each near-dup cluster, how many
    // distinct sources its members span — cross-source duplication is
    // the licensing/provenance signal a dedup review reads (a cluster
    // spanning 'web' and 'news' is syndication; within one source it
    // is re-crawl). Clusters come from the adaptive connected
    // components over the LSH pair graph (q69's machinery); the
    // rollup joins members to their source ONCE and aggregates twice.
    QDef("q195_cluster_purity",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = graft.ops.Dedup.nearDupMinhashArtifact(docs,
          "doc_id", "text", fpKey = s"$dir#documents#id_text")
        graft.ops.ConnectedComponents.run(pairs, "doc_a", "doc_b")
          .join(docs.select(col("doc_id").as("node"), col("source")),
            "node")
          .groupBy("component")
          .agg(count(lit(1)).as("cluster_size"),
            count_distinct(col("source")).as("n_sources"))
          .groupBy("cluster_size", "n_sources")
          .agg(count(lit(1)).as("n_clusters"))
      },
      Some(s"""WITH RECURSIVE t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |s AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS sh
              |  FROM t),
              |p AS (
              |  SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM s a JOIN s b ON a.doc_id < b.doc_id
              |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
              |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
              |      (len(a.sh) + len(b.sh)
              |        - len(list_intersect(a.sh, b.sh))) >= 0.8),
              |e AS (SELECT da AS a, db AS b FROM p
              |      UNION SELECT db, da FROM p),
              |reach(a, b) AS (
              |  SELECT a, b FROM e
              |  UNION
              |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
              |cl AS (SELECT a AS node, least(a, min(b)) AS cid
              |  FROM reach GROUP BY a),
              |cj AS (SELECT cl.cid, d.source
              |  FROM cl JOIN documents d ON d.doc_id = cl.node),
              |cs AS (SELECT cid, CAST(count(*) AS BIGINT) AS cluster_size,
              |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources
              |  FROM cj GROUP BY 1)
              |SELECT cluster_size, n_sources,
              |  CAST(count(*) AS BIGINT) AS n_clusters
              |FROM cs GROUP BY 1, 2""".stripMargin)),

    // WordPiece APPLY — the missing half of q163 (train), mirroring
    // what q119 is to q99: tokenize the corpus under the trained
    // likelihood-scored merges and report per-doc compression. The
    // trained list replays through BpeTrainer.applyMerges (WordPiece
    // merges satisfy the same halves-exist-before-their-round
    // property, so the ascending sweep == sequential replays; the
    // chain/kernel dispatch and its spec carry over unchanged). The
    // oracle extends the q163 unrolled train chain per-doc — train
    // AND apply replay end to end.
    QDef("q196_wordpiece_apply",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val wp = graft.ops.WordPieceTrainer.trainArtifact(docs, "text",
          k = 4, fpKey = s"$dir#documents#text")
        val merges = wp.map(m =>
          graft.ops.BpeTrainer.Merge(m.iter, m.pair, m.cnt, m.merged))
        docs.select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens_raw"),
            graft.ops.BpeTrainer.applyMerges(col("toks"), merges).as("wt"))
          .select(col("doc_id"), col("n_tokens_raw"),
            size(col("wt")).cast("long").as("n_tokens_wp"))
          .withColumn("compress_milli",
            expr("(1000 * n_tokens_wp) div greatest(n_tokens_raw, 1)"))
      },
      Some(wordpieceApplyOracleSql(4))),

    // kNN label-agreement audit (Confident-Learning-style mislabel
    // screen): for every vector, do its 3 nearest neighbors share its
    // label? Candidates are bounded to the vector's k-means cell (the
    // SemDeDup/q121 join shape — Σ cell², never n²); per-label rollup
    // reports the agreement rate and the count of zero-agreement
    // suspects (the rows a labeling review should open first).
    // Centroids are bit-deterministic (distributed Lloyd, integer
    // micro-unit sums), so the oracle replays assignment, neighbor
    // ranking and the rollup from centroid literals.
    QDef("q197_label_knn_agreement",
      (s, dir) => {
        import graft.ops.VectorSearch._
        val emb = Tables.embeddings(s, dir)
        val init = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 256, seed = 99),
          k = 8, iters = 0, seed = 99)
        val cents = lloydRoundsDistributed(emb, "vec_id", "embedding",
          init, rounds = 2)
        AgreeOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, label,
             |    list_transform(embedding, x -> x::DOUBLE) AS v
             |  FROM embeddings),
             |a AS (SELECT vec_id, label, v,
             |    list_reverse_sort(${cellsSqlV(cents)})[1].cell AS cell
             |  FROM e),
             |c AS (SELECT x.vec_id, x.label,
             |    ${cosSqlV("x.v", "y.v")} AS sim,
             |    y.vec_id AS nb, y.label AS nbl
             |  FROM a x JOIN a y
             |    ON x.cell = y.cell AND x.vec_id <> y.vec_id),
             |g AS (SELECT vec_id, label,
             |    list_sort(list({'ns': -sim, 'nb': nb, 'nbl': nbl}))[1:3]
             |      AS top3
             |  FROM c GROUP BY 1, 2),
             |t AS (SELECT label,
             |    len(list_filter(top3, t -> t.nbl = label)) AS agree,
             |    len(top3) AS kn
             |  FROM g)
             |SELECT CAST(label AS BIGINT) AS label,
             |  CAST(count(*) AS BIGINT) AS n_vecs,
             |  (1000 * CAST(sum(agree) AS BIGINT)) //
             |    greatest(CAST(sum(kn) AS BIGINT), 1) AS agree_milli,
             |  CAST(sum(CASE WHEN agree = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_suspect
             |FROM t GROUP BY 1""".stripMargin)
        val e = emb.select(col("vec_id").as("id"),
            toDouble(col("embedding")).as("v"),
            col("label").cast("long").as("label"))
          .withColumn("nrm", norm(col("v")))
          .withColumn("cell", assignBest(col("v"), cents).getField("cell"))
          .localCheckpoint() // probe side + neighbor side share it
        val nbr = e.select(col("cell"), col("id").as("nb"),
          col("v").as("vb"), col("nrm").as("nbn"),
          col("label").as("nbl"))
        e.join(nbr, Seq("cell"))
          .filter(col("id") =!= col("nb"))
          .withColumn("sim",
            dot(col("v"), col("vb")) / (col("nrm") * col("nbn")))
          .groupBy("id", "label")
          .agg(slice(array_sort(collect_list(struct((-col("sim")).as("ns"),
            col("nb"), col("nbl")))), 1, 3).as("top3"))
          .withColumn("agree", size(filter(col("top3"),
            t => t.getField("nbl") === col("label"))).cast("long"))
          .withColumn("kn", size(col("top3")).cast("long"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"), sum("agree").as("sa"),
            sum("kn").as("sk"),
            sum(when(col("agree") === 0, 1L).otherwise(0L))
              .as("n_suspect"))
          .select(col("label"), col("n_vecs"),
            expr("(1000 * sa) div greatest(sk, 1)").as("agree_milli"),
            col("n_suspect"))
      },
      None,
      Some(() => AgreeOracle.sql))
  )

  /** q197's late-bound oracle (trained-centroid literals). */
  private object AgreeOracle { @volatile var sql: Option[String] = None }

  private def dotSqlV(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSqlV(a: String): String = VectorOracleSql.norm(a)
  private def cosSqlV(a: String, b: String): String =
    VectorOracleSql.cos(a, b)

  private def cellsSqlV(centroids: Array[Array[Double]]): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSqlV("v", vlit(c))} / (${normSqlV("v")} * $n), " +
        s"'cell': $i}"
    }.mkString("[", ",\n", "]")
  }

  /** The q163 wordpiece train chain carried per-doc so the FINAL
    * corpus state is the output (the bpeApplyOracleSql construction
    * with likelihood-scored picks). Kept in lockstep with
    * PipelineQueries11.wordpieceOracleSql.
    */
  private def wordpieceApplyOracleSql(k: Int): String = {
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
         |m$i AS (SELECT pair,
         |        (1000000000 * cnt) // (ua.c * ub.c) AS score_nano
         |        FROM c$i
         |        JOIN u$i ua ON ua.tok = split_part(pair, ' ', 1)
         |        JOIN u$i ub ON ub.tok = split_part(pair, ' ', 2)
         |        ORDER BY score_nano DESC, pair ASC LIMIT 1),
         |t$i AS (SELECT doc_id, n_raw, replace(p,
         |    ' ' || (SELECT replace(pair, ' ', '  ') FROM m$i) || ' ',
         |    ' ' || (SELECT replace(pair, ' ', chr(31)) FROM m$i) || ' ')
         |    AS p
         |  FROM t${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH t0 AS (SELECT doc_id,
       |  CAST(len($toksSql) AS BIGINT) AS n_raw,
       |  ' ' || array_to_string($toksSql, '  ') || ' ' AS p
       |  FROM documents),
       |$stages
       |SELECT doc_id, n_raw AS n_tokens_raw,
       |  CAST(len($toksFrag) AS BIGINT) AS n_tokens_wp,
       |  (1000 * CAST(len($toksFrag) AS BIGINT)) //
       |    greatest(n_raw, 1) AS compress_milli
       |FROM t$k""".stripMargin
  }
}
