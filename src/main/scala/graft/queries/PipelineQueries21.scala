package graft.queries

import graft.Tables
import graft.fixtures.FixtureGen
import graft.functions.TextAnalysis._
import graft.ops.{Hits, Sketches, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-first pipeline group — fuzzy decontamination, a trained
  * lang-ID baseline, sample-sketch quantiles, and directed domain
  * authority:
  *
  *  - q208: edit-distance decontamination. 8-gram overlap (q70) and
  *    winnowing (q92) only catch verbatim contamination; eval-set
  *    leaks survive trivial paraphrase (a re-typed title, one changed
  *    word). This operator fuzzy-matches eval "titles" (first 8
  *    tokens) against the training split under Levenshtein ≤ 2 using
  *    the classic q-gram machinery (Gravano et al., VLDB 2001): the
  *    candidate set is a positional-3-gram PREFIX join — each title
  *    emits its k·q+1 = 7 globally-rarest grams (df-ranked, the q118
  *    discipline), and any pair within distance 2 with ≥ 9 chars must
  *    collide on one (pigeonhole over the ≤ 6 grams an edit can
  *    touch) — then exact `levenshtein` verifies candidates only.
  *    Never all-pairs; the 3-gram df table is bounded by |charset|³
  *    and broadcast. The oracle replays candidate generation
  *    identically (the q140 lesson), so banding recall can never
  *    desynchronize the gate. Titles under 9 chars carry too few
  *    grams for the bound and are excluded by both engines
  *    (documented recall boundary, not a silent drop — they'd need
  *    the exact-match path q24 already provides).
  *  - q209: Naive Bayes language ID, trained in-engine on a 90% hash
  *    split and scored on the 10% held-out — the TRAINED baseline
  *    against q23's closed-form heuristic (confusion matrix vs q172's
  *    same-shape audit). Add-one smoothing; scores are per-token
  *    integer milli-nats (floor(1000·ln(c+1)) − ntok·floor(1000·
  *    ln(n_l+V)) + floor(1000·ln(nd_l))), so argmax is exact integer
  *    comparison with lang tie-break — bit-identical across engines.
  *    Scale shape: the (lang, tok) model is vocabulary-sized and
  *    broadcast; the corpus pass is one explode + broadcast join +
  *    map-side-combined aggregation; the langs×docs cross join
  *    multiplies doc-LEVEL rows by |langs|, never tokens.
  *  - q210: bottom-K-sample quantile audit. The mergeable O(K)
  *    quantile sketch: the K=256 docs with the smallest salted
  *    60-bit hash are a uniform corpus sample (bottom-K state merges
  *    by union+truncate — shard-local sketches combine exactly, the
  *    KMV/q185 property), and sample order statistics estimate corpus
  *    quantiles. The audit reports sketch vs EXACT quantiles (value-
  *    histogram + cumulative window over O(distinct values) rows, the
  *    q164/q189 construction — never a corpus sort) at p ∈ {.25, .5,
  *    .75, .9}. Both sides deterministic: ceil-rank definitions in
  *    integer arithmetic, hash ties broken by doc_id.
  *  - q211: HITS hubs/authorities over the DIRECTED domain citation
  *    graph (doc's own host → hosts cited in its text). PageRank
  *    (q129) scores the undirected co-citation neighborhood; HITS
  *    separates "links to good content" from "is linked as good
  *    content", which is the crawl-frontier signal (hub scores rank
  *    seed lists, authority scores rank fetch priority). Plan gated
  *    in [[graft.ops.Hits]] exactly like q129: broadcast vectors
  *    under the node gate, double-resident edge layout above it.
  *    Integer micro-unit L1 normalization each half-step keeps 3
  *    iterations bit-identical across engines.
  *
  * Determinism: every cross-row aggregate is an integer; per-row
  * floats are single floor(1000·ln(integer)) terms (the q162 rule);
  * `div`/`//` run on non-negative ground except q208's best-match
  * composite, which is non-negative by construction (dist ≤ 2,
  * doc_id ≥ 0).
  */
object PipelineQueries21 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  /** q208's per-title gram-prefix size: edit distance k = 2 touches at
    * most k·q = 6 positional q-grams, so two titles within distance 2
    * sharing NO gram among their 7 rarest would contradict the count
    * bound |G∩| ≥ max(|a|,|b|) − q + 1 − k·q ≥ 1 (needs len ≥ 9).
    */
  private val FzPrefix = 7
  private val FzMaxDist = 2

  /** best-match composite packing: dist·2^40 + doc_id (doc ids stay
    * far below 2^40 at every tested scale; the pack keeps argmin one
    * integer MIN in both engines).
    */
  private val FzPack = 1099511627776L

  val defs: Seq[QDef] = Seq(

    QDef("q208_fuzzy_decon",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"),
            (tokenHash(concat(lit("fz:"), col("doc_id").cast("string")))
              % 20).as("b"),
            tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 1)
          .select(col("doc_id"), col("b"),
            array_join(slice(col("toks"), 1, 8), " ").as("title"))
          .withColumn("len", length(col("title")))
          .filter(col("len") >= 9)
          .localCheckpoint() // grams, ev titles, tr titles share it
        val grams = base.select(col("doc_id"), col("b"),
            explode(transform(sequence(lit(1), col("len") - 2),
              i => struct(col("title").substr(i, lit(3)).as("g"),
                i.as("pos")))).as("gp"))
          .select(col("doc_id"), col("b"), col("gp.g").as("g"),
            col("gp.pos").as("pos"))
          .localCheckpoint() // df + the ranked-prefix pass share it
        // 3-gram universe is charset-bounded -> genuinely broadcastable
        // at ANY corpus size
        val dfg = grams.groupBy("g").agg(count(lit(1)).as("df"))
        val pre = grams.join(broadcast(dfg), "g")
          .withColumn("rk", row_number().over(Window
            .partitionBy("doc_id")
            .orderBy(col("df"), col("g"), col("pos")))) // ≤ len-2 rows/doc
          .filter(col("rk") <= FzPrefix)
        val cand = pre.filter(col("b") === 19)
          .select(col("doc_id").as("ev"), col("g"))
          .join(pre.filter(col("b") < 19)
            .select(col("doc_id").as("tr"), col("g")), "g")
          .select("ev", "tr").distinct()
        val evT = base.filter(col("b") === 19)
          .select(col("doc_id").as("ev"), col("title").as("ta"),
            col("len").as("la"))
        val trT = base.filter(col("b") < 19)
          .select(col("doc_id").as("tr"), col("title").as("tb"),
            col("len").as("lb"))
        val agg = cand.join(evT, "ev").join(trT, "tr")
          .withColumn("dist", levenshtein(col("ta"), col("tb")).cast("long"))
          .withColumn("m", abs(col("la") - col("lb")) <= FzMaxDist &&
            col("dist") <= FzMaxDist)
          .groupBy("ev")
          .agg(count(lit(1)).as("n_cand"),
            sum(when(col("m"), 1L).otherwise(0L)).as("n_match"),
            min(when(col("m"),
              col("dist") * FzPack + col("tr"))).as("best"))
        evT.select(col("ev").as("doc_id"))
          .join(agg.withColumnRenamed("ev", "doc_id"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_cand"), lit(0L)).as("n_cand"),
            coalesce(col("n_match"), lit(0L)).as("n_match"),
            expr(s"best div $FzPack").as("best_dist"),
            expr(s"best % $FzPack").as("best_train"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
              |    ${hashSql("'fz:' || CAST(doc_id AS VARCHAR)")} % 20 AS b,
              |    $toksSql AS toks FROM documents
              |  WHERE len($toksSql) >= 1),
              |bt AS (SELECT doc_id, b,
              |    array_to_string(list_slice(toks, 1, 8), ' ') AS title,
              |    len(array_to_string(list_slice(toks, 1, 8), ' ')) AS l
              |  FROM t
              |  WHERE len(array_to_string(list_slice(toks, 1, 8), ' ')) >= 9),
              |gp AS (SELECT doc_id, b, substr(title, pos, 3) AS g, pos
              |  FROM (SELECT doc_id, b, title,
              |      unnest(generate_series(1, l - 2)) AS pos FROM bt) z),
              |dfg AS (SELECT g, count(*) AS df FROM gp GROUP BY 1),
              |pre AS (SELECT doc_id, b, g FROM (
              |    SELECT gp.doc_id, gp.b, gp.g, row_number() OVER (
              |        PARTITION BY gp.doc_id
              |        ORDER BY dfg.df, gp.g, gp.pos) AS rk
              |      FROM gp JOIN dfg USING (g)) r
              |  WHERE rk <= $FzPrefix),
              |cand AS (SELECT DISTINCT e.doc_id AS ev, t2.doc_id AS tr
              |  FROM pre e JOIN pre t2 USING (g)
              |  WHERE e.b = 19 AND t2.b < 19),
              |sc AS (SELECT cand.ev,
              |    CAST(levenshtein(a.title, b2.title) AS BIGINT) AS dist,
              |    abs(a.l - b2.l) <= $FzMaxDist AND
              |      levenshtein(a.title, b2.title) <= $FzMaxDist AS m,
              |    cand.tr
              |  FROM cand JOIN bt a ON cand.ev = a.doc_id
              |            JOIN bt b2 ON cand.tr = b2.doc_id),
              |ag AS (SELECT ev, count(*) AS n_cand,
              |    sum(CASE WHEN m THEN 1 ELSE 0 END) AS n_match,
              |    min(CASE WHEN m THEN dist * $FzPack + tr END) AS best
              |  FROM sc GROUP BY 1)
              |SELECT e.doc_id, CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand,
              |  CAST(coalesce(n_match, 0) AS BIGINT) AS n_match,
              |  CAST(best // $FzPack AS BIGINT) AS best_dist,
              |  CAST(best % $FzPack AS BIGINT) AS best_train
              |FROM (SELECT doc_id FROM bt WHERE b = 19) e
              |LEFT JOIN ag ON e.doc_id = ag.ev""".stripMargin)),

    QDef("q209_nb_langid",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"),
            (tokenHash(concat(lit("nb:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .filter(size(col("toks")) >= 1)
          .localCheckpoint() // train counts + val probe share it
        val tr = t.filter(col("b") < 18)
        val counts = tr.select(col("lang"), explode(col("toks")).as("tok"))
          .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
          .localCheckpoint() // vocab total, lang totals, weights share it
        val vTot = counts.select("tok").distinct()
          .agg(count(lit(1)).as("v"))
        val langs = tr.groupBy("lang").agg(count(lit(1)).as("nd"))
          .join(counts.groupBy("lang").agg(sum("c").as("nl")), "lang")
          .crossJoin(broadcast(vTot))
          .select(col("lang").as("plang"),
            floor(lit(1000.0) * log(col("nd").cast("double")))
              .cast("long").as("prior"),
            floor(lit(1000.0) * log((col("nl") + col("v")).cast("double")))
              .cast("long").as("norm"))
        val w = counts.select(col("lang").as("plang"), col("tok"),
          floor(lit(1000.0) * log((col("c") + lit(1)).cast("double")))
            .cast("long").as("w"))
        val va = t.filter(col("b") >= 18)
          .select(col("doc_id"), col("lang").as("actual"), col("toks"),
            size(col("toks")).cast("long").as("ntok"))
          .localCheckpoint() // token probe + doc-level cross share it
        // vocabulary-sized model broadcast; ONE corpus token pass
        val sw = va.select(col("doc_id"), explode(col("toks")).as("tok"))
          .join(broadcast(w), "tok")
          .groupBy("doc_id", "plang").agg(sum("w").as("sw"))
        va.select("doc_id", "actual", "ntok")
          .crossJoin(broadcast(langs))
          .join(sw, Seq("doc_id", "plang"), "left")
          .withColumn("score", col("prior") - col("ntok") * col("norm") +
            coalesce(col("sw"), lit(0L)))
          .groupBy("doc_id", "actual")
          .agg(max(struct(col("score"), col("plang"))).as("m"))
          .groupBy(col("actual").as("lang_actual"),
            col("m.plang").as("lang_pred"))
          .agg(count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH t AS (SELECT doc_id, lang, $toksSql AS toks,
              |    ${hashSql("'nb:' || CAST(doc_id AS VARCHAR)")} % 20 AS b
              |  FROM documents WHERE len($toksSql) >= 1),
              |tr AS (SELECT lang, toks FROM t WHERE b < 18),
              |c AS (SELECT lang, tok, count(*) AS c FROM (
              |    SELECT lang, unnest(toks) AS tok FROM tr) z GROUP BY 1, 2),
              |v AS (SELECT count(DISTINCT tok) AS v FROM c),
              |l AS (SELECT a.lang AS plang,
              |    CAST(floor(1000.0 * ln(nd::DOUBLE)) AS BIGINT) AS prior,
              |    CAST(floor(1000.0 * ln((nl + v.v)::DOUBLE)) AS BIGINT)
              |      AS norm
              |  FROM (SELECT lang, count(*) AS nd FROM tr GROUP BY 1) a
              |  JOIN (SELECT lang, sum(c) AS nl FROM c GROUP BY 1) b2
              |    ON a.lang = b2.lang, v),
              |w AS (SELECT lang AS plang, tok,
              |    CAST(floor(1000.0 * ln((c + 1)::DOUBLE)) AS BIGINT) AS w
              |  FROM c),
              |va AS (SELECT doc_id, lang AS actual, toks,
              |    CAST(len(toks) AS BIGINT) AS ntok FROM t WHERE b >= 18),
              |sw AS (SELECT doc_id, plang, sum(w) AS sw FROM (
              |    SELECT doc_id, unnest(toks) AS tok FROM va) z
              |  JOIN w USING (tok) GROUP BY 1, 2),
              |sc AS (SELECT va.doc_id, va.actual, l.plang,
              |    l.prior - va.ntok * l.norm + coalesce(sw.sw, 0) AS score
              |  FROM va CROSS JOIN l
              |  LEFT JOIN sw ON sw.doc_id = va.doc_id AND sw.plang = l.plang),
              |p AS (SELECT doc_id, actual,
              |    max({'score': score, 'plang': plang}) AS m
              |  FROM sc GROUP BY 1, 2)
              |SELECT actual AS lang_actual, m.plang AS lang_pred,
              |  CAST(count(*) AS BIGINT) AS n_docs
              |FROM p GROUP BY 1, 2""".stripMargin)),

    QDef("q210_sample_quantiles",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars"),
            Sketches.hash60(concat(lit("sq:"),
              col("doc_id").cast("string"))).as("h"))
          .localCheckpoint() // exact histogram + sample share the scan
        val n = docs.agg(count(lit(1)).as("n"))
        // mergeable bottom-K sample via the partial/final TopK shape
        val sample = TopK.perGroup(docs.withColumn("g", lit(1L)), "g",
            struct(col("h"), col("doc_id"), col("n_chars")), 256)
          .select(col("key.n_chars").as("v"), col("key.doc_id").as("d"))
          .localCheckpoint() // K rows; rank + count share it
        val kc = sample.agg(count(lit(1)).as("kk"))
        val sv = sample
          .withColumn("rv", row_number().over(
            Window.orderBy(col("v"), col("d")))) // ≤ K = 256 rows
        val ps = typedLit(Seq(250L, 500L, 750L, 900L))
        val sq = sv.crossJoin(broadcast(kc))
          .select(explode(ps).as("p"), col("rv"), col("v"), col("kk"))
          .filter(col("rv") === expr("(p * kk + 999) div 1000"))
          .select(col("p"), col("v").as("sample_v"))
        val ex = docs.groupBy("n_chars").agg(count(lit(1)).as("c"))
          .withColumn("cum", sum("c").over(Window.orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .crossJoin(broadcast(n)) // O(distinct values) rows
          .select(explode(ps).as("p"), col("n_chars"), col("cum"), col("n"))
          .filter(col("cum") >= expr("(p * n + 999) div 1000"))
          .groupBy("p").agg(min("n_chars").as("exact_v"))
        ex.join(sq, "p")
          .select(col("p").as("p_milli"), col("exact_v"), col("sample_v"),
            (col("sample_v") - col("exact_v")).as("err"))
      },
      Some(s"""WITH d AS (SELECT doc_id, n_chars,
              |    ${hash60Sql("'sq:' || CAST(doc_id AS VARCHAR)")} AS h
              |  FROM documents),
              |s AS (SELECT doc_id, n_chars FROM d
              |  ORDER BY h, doc_id LIMIT 256),
              |k AS (SELECT count(*) AS kk FROM s),
              |sv AS (SELECT n_chars AS v, row_number() OVER (
              |    ORDER BY n_chars, doc_id) AS rv FROM s),
              |ps AS (SELECT unnest([250, 500, 750, 900]) AS p),
              |sq AS (SELECT ps.p, sv.v AS sample_v FROM ps, sv, k
              |  WHERE sv.rv = (ps.p * k.kk + 999) // 1000),
              |h AS (SELECT n_chars, count(*) AS c FROM d GROUP BY 1),
              |ch AS (SELECT n_chars,
              |    sum(c) OVER (ORDER BY n_chars) AS cum FROM h),
              |n AS (SELECT count(*) AS n FROM d),
              |ex AS (SELECT ps.p, min(ch.n_chars) AS exact_v FROM ps, ch, n
              |  WHERE ch.cum >= (ps.p * n.n + 999) // 1000 GROUP BY 1)
              |SELECT CAST(ex.p AS BIGINT) AS p_milli,
              |  CAST(exact_v AS BIGINT) AS exact_v,
              |  CAST(sample_v AS BIGINT) AS sample_v,
              |  CAST(sample_v - exact_v AS BIGINT) AS err
              |FROM ex JOIN sq ON ex.p = sq.p""".stripMargin)),

    QDef("q211_domain_hits",
      (s, _) => {
        val raw = s.read.parquet(s"${FixtureGen.FixtureDir}/raw_docs.parquet")
        val perDoc = raw
          .select(
            regexp_extract(lower(col("url")),
              "^https?://([a-z0-9.-]+)", 1).as("src"),
            array_distinct(regexp_extract_all(col("text"),
              lit("https?://([a-z0-9.-]+)/"), lit(1))).as("ds"))
          .filter(col("src") =!= "" && size(col("ds")) > 0)
        val edges = perDoc
          .select(col("src"), explode(col("ds")).as("dst"))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint() // nodes + both Hits layouts read it
        val nodes = edges.select(col("src").as("domain"))
          .union(edges.select(col("dst").as("domain"))).distinct()
        Hits.domainHits(nodes, edges, iters = 3)
      },
      Some {
        val rawPq =
          s"read_parquet('${FixtureGen.FixtureDir}/raw_docs.parquet/*.parquet')"
        val iters = (1 to 3).map { i =>
          s"""a${i}r AS (SELECT e.dst AS domain, SUM(h${i - 1}.h) AS ar
             |  FROM e JOIN h${i - 1} ON e.src = h${i - 1}.domain GROUP BY 1),
             |a$i AS (SELECT n.domain, CAST(coalesce((ar * 1000000) //
             |    greatest((SELECT SUM(ar) FROM a${i}r), 1), 0) AS BIGINT) AS a
             |  FROM n LEFT JOIN a${i}r USING (domain)),
             |h${i}r AS (SELECT e.src AS domain, SUM(a$i.a) AS hr
             |  FROM e JOIN a$i ON e.dst = a$i.domain GROUP BY 1),
             |h$i AS (SELECT n.domain, CAST(coalesce((hr * 1000000) //
             |    greatest((SELECT SUM(hr) FROM h${i}r), 1), 0) AS BIGINT) AS h
             |  FROM n LEFT JOIN h${i}r USING (domain))""".stripMargin
        }.mkString(",\n")
        s"""WITH pd AS (SELECT
           |    regexp_extract(lower(url), '^https?://([a-z0-9.-]+)', 1)
           |      AS src,
           |    unnest(list_distinct(regexp_extract_all(text,
           |      'https?://([a-z0-9.-]+)/', 1))) AS dst
           |  FROM $rawPq),
           |e AS (SELECT DISTINCT src, dst FROM pd
           |  WHERE src <> '' AND src <> dst),
           |n AS (SELECT src AS domain FROM e
           |  UNION SELECT dst AS domain FROM e),
           |h0 AS (SELECT domain, CAST(1000000 AS BIGINT) AS h FROM n),
           |$iters
           |SELECT n.domain, CAST(coalesce(i.indeg, 0) AS BIGINT) AS indeg,
           |  CAST(coalesce(o.outdeg, 0) AS BIGINT) AS outdeg,
           |  a3.a AS auth_micro, h3.h AS hub_micro
           |FROM n
           |LEFT JOIN (SELECT dst AS domain, count(*) AS indeg FROM e
           |  GROUP BY 1) i USING (domain)
           |LEFT JOIN (SELECT src AS domain, count(*) AS outdeg FROM e
           |  GROUP BY 1) o USING (domain)
           |JOIN a3 USING (domain) JOIN h3 USING (domain)""".stripMargin
      })
  )
}
