package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twentieth pipeline group — order/composition audits and the
  * headline dedup funnel:
  *
  *  - q198: curriculum audit — mean quality signal (char entropy) by
  *    training-order decile under q75's deterministic shuffle. Decile
  *    = hash-RANGE bucket (h·10 div 2^32): the shuffle order IS hash
  *    order, so range deciles need no rank pass at all — one scan,
  *    one aggregation, identical semantics in both engines.
  *  - q199: sessionization gap sweep — session counts at 10/30/60 min
  *    idle thresholds from ONE per-user lag pass (the q166 window
  *    contract: partitions bounded by one user's events). The
  *    "choose the session gap" planning table behind q18's fixed
  *    setting.
  *  - q200: dedup mass funnel — documents and token mass surviving
  *    raw → exact-hash → near-dup-canonical, then the residual
  *    sub-document redundancy (distinct CDC-chunk mass) of the
  *    survivors. The q134 funnel idea applied to the dedup family:
  *    one table that says what each stage actually removes.
  */
object PipelineQueries20 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  val defs: Seq[QDef] = Seq(

    QDef("q198_curriculum_audit",
      (s, dir) => {
        val h = tokenHash(concat(lit("ord:"), col("doc_id").cast("string")))
        // per-doc entropy terms via the shared q160 kernel wrapper;
        // Σ of per-doc quantized entropies, then one division —
        // exact integers end to end (the q160 entropy identity)
        PipelineQueries11.charEnt(Tables.documents(s, dir))
          .withColumn("h10", (h * 10).cast("long"))
          .select(expr("h10 div 4294967296").as("decile"),
            col("n"), col("sterm"))
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"), sum("n").as("sum_chars"),
            sum(PipelineQueries11.entMilli("n", "sterm")).as("se"))
          .select(col("decile"), col("n_docs"), col("sum_chars"),
            expr("se div n_docs").as("mean_ent_milli"))
      },
      Some(s"""WITH ${PipelineQueries11.charCtes},
              |d AS (SELECT ce.doc_id, n, sterm,
              |    (${hashSql("'ord:' || CAST(ce.doc_id AS VARCHAR)")}
              |      * 10) // 4294967296 AS decile
              |  FROM ce)
              |SELECT CAST(decile AS BIGINT) AS decile,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n) AS BIGINT) AS sum_chars,
              |  CAST(sum(${PipelineQueries11.entSql("n", "sterm")})
              |    AS BIGINT) // count(*) AS mean_ent_milli
              |FROM d GROUP BY 1""".stripMargin)),

    QDef("q199_session_gap_sweep",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy("tus", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("gap", col("tus") - lag("tus", 1).over(w))
          .select(col("gap"),
            explode(typedLit(Seq(600L, 1800L, 3600L))).as("gap_s"))
          .groupBy("gap_s")
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("gap").isNull ||
              col("gap") > col("gap_s") * 1000000L, 1L).otherwise(0L))
              .as("n_sessions"))
          .select(col("gap_s"), col("n_events"), col("n_sessions"),
            expr("(1000 * n_events) div greatest(n_sessions, 1)")
              .as("events_per_session_milli"))
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |    epoch_us(ts) AS tus FROM events),
             |g AS (SELECT user_id, tus - lag(tus) OVER (
             |      PARTITION BY user_id ORDER BY tus, event_id) AS gap
             |  FROM e),
             |x AS (SELECT gap,
             |    CAST(unnest([600, 1800, 3600]) AS BIGINT) AS gap_s
             |  FROM g)
             |SELECT CAST(gap_s AS BIGINT) AS gap_s,
             |  CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN gap IS NULL
             |    OR gap > gap_s * 1000000 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_sessions,
             |  (1000 * CAST(count(*) AS BIGINT)) //
             |    greatest(CAST(sum(CASE WHEN gap IS NULL
             |      OR gap > gap_s * 1000000 THEN 1 ELSE 0 END)
             |      AS BIGINT), 1) AS events_per_session_milli
             |FROM x GROUP BY 1""".stripMargin)),

    // Funnel: CC labels are min-reachable ids, so "cluster canonical"
    // is simply component == doc_id (or no component at all) — no
    // second argmax pass. Chunk-unique mass counts each distinct
    // chunk content once (chunk_len is a function of the chunk hash,
    // so min() is just "pick the one value").
    QDef("q200_dedup_mass_funnel",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("text"),
            size(tokens(col("text"))).cast("long").as("n_toks"),
            tokenHash(col("text")).as("th"))
          .localCheckpoint() // every stage reads it
        def stage(name: String, d: org.apache.spark.sql.DataFrame) =
          d.agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"))
            .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
        val exactKeep = docs.groupBy("th").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val s1 = docs.join(exactKeep, "doc_id").localCheckpoint()
        val pairs = graft.ops.Dedup.nearDupMinhash(
          s1.select(col("doc_id"), col("text")), "doc_id", "text",
          threshold = 0.8)
        val comp = graft.ops.ConnectedComponents.run(pairs, "doc_a", "doc_b")
        val s2 = s1.join(
            comp.select(col("node").as("doc_id"), col("component")),
            Seq("doc_id"), "left")
          .filter(col("component").isNull ||
            col("component") === col("doc_id"))
          .localCheckpoint() // counted + chunked
        val chunkMass = graft.ops.CdcChunks
          .chunks(s2.select(col("doc_id"), col("text")), "doc_id", "text")
          .groupBy("ch").agg(min("chunk_len").as("cl"))
          .agg(sum("cl").as("n_tokens"), count(lit(1)).as("n_docs"))
          .select(lit("chunk_unique").as("stage"), col("n_docs"),
            col("n_tokens"))
        stage("raw", docs)
          .unionAll(stage("exact", s1))
          .unionAll(stage("neardup", s2))
          .unionAll(chunkMass)
      },
      Some(s"""WITH RECURSIVE d AS (SELECT doc_id, text,
              |    CAST(len($toksSql) AS BIGINT) AS n_toks,
              |    ${hashSql("text")} AS th
              |  FROM documents),
              |k1 AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY th),
              |s1 AS (SELECT d.* FROM d JOIN k1 USING (doc_id)),
              |t AS (SELECT doc_id, $toksSql AS toks
              |  FROM s1),
              |sg AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS sh
              |  FROM t),
              |p AS (SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
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
              |s2 AS (SELECT s1.* FROM s1
              |  LEFT JOIN cl ON cl.node = s1.doc_id
              |  WHERE cl.cid IS NULL OR cl.cid = s1.doc_id),
              |tp AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
              |    CASE WHEN ${hashSql("toks[i]")} % 16 = 0
              |      THEN 1 ELSE 0 END AS cut
              |  FROM (SELECT doc_id, toks,
              |      unnest(generate_series(1, len(toks))) AS i
              |    FROM (SELECT doc_id, $toksSql AS toks FROM s2) y) z),
              |tc AS (SELECT doc_id, pos, tok,
              |    sum(cut) OVER (PARTITION BY doc_id ORDER BY pos)
              |      AS chunk_no
              |  FROM tp),
              |chk AS (SELECT doc_id, chunk_no,
              |    cast('0x' || substr(md5(string_agg(tok, ' '
              |      ORDER BY pos)), 1, 15) as bigint) AS ch,
              |    count(*) AS cl
              |  FROM tc GROUP BY 1, 2),
              |cu AS (SELECT ch, min(cl) AS cl FROM chk GROUP BY 1)
              |SELECT 'raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM d
              |UNION ALL
              |SELECT 'exact', CAST(count(*) AS BIGINT),
              |  CAST(sum(n_toks) AS BIGINT) FROM s1
              |UNION ALL
              |SELECT 'neardup', CAST(count(*) AS BIGINT),
              |  CAST(sum(n_toks) AS BIGINT) FROM s2
              |UNION ALL
              |SELECT 'chunk_unique', CAST(count(*) AS BIGINT),
              |  CAST(sum(cl) AS BIGINT) FROM cu""".stripMargin)),

    // Chunk-level syndication matrix: for each source pair, how many
    // distinct chunk CONTENTS they share — q195's provenance signal
    // at sub-document granularity (two sources can share zero whole
    // documents yet syndicate the same paragraphs). The incidence
    // frame is (chunk, source) DISTINCT, so the per-chunk pair
    // fan-out is bounded by #sources², never by how many documents
    // carry the chunk — the q137 source-overlap rationale.
    QDef("q201_chunk_syndication",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val cs = graft.ops.CdcChunks
          .chunks(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id")
          .select(col("ch"), col("source")).distinct()
          .localCheckpoint() // both sides of the pair join read it
        cs.as("a").join(cs.as("b"),
            col("a.ch") === col("b.ch") &&
              col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"),
            col("b.source").as("src_b"))
          .agg(count(lit(1)).as("n_shared_chunks"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |p AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok,
              |    CASE WHEN ${hashSql("toks[i]")} % 16 = 0
              |      THEN 1 ELSE 0 END AS cut
              |  FROM (SELECT doc_id, toks,
              |      unnest(generate_series(1, len(toks))) AS i FROM t) z),
              |c AS (SELECT doc_id, pos, tok,
              |    sum(cut) OVER (PARTITION BY doc_id ORDER BY pos)
              |      AS chunk_no
              |  FROM p),
              |chk AS (SELECT doc_id, chunk_no,
              |    cast('0x' || substr(md5(string_agg(tok, ' '
              |      ORDER BY pos)), 1, 15) as bigint) AS ch
              |  FROM c GROUP BY 1, 2),
              |cs AS (SELECT DISTINCT ch, d.source
              |  FROM chk JOIN documents d USING (doc_id))
              |SELECT a.source AS src_a, b.source AS src_b,
              |  CAST(count(*) AS BIGINT) AS n_shared_chunks
              |FROM cs a JOIN cs b
              |  ON a.ch = b.ch AND a.source < b.source
              |GROUP BY 1, 2""".stripMargin)),

    // Train→eval n-gram coverage at n = 1/2/3 — the generalization-gap
    // table (q130's OOV rate is the n=1 token-level row; bigram and
    // trigram coverage say how much of the eval set's local CONTEXT
    // the train split has seen). One unioned gram stream feeds all
    // three n's; the coverage probe is a semi-join of the (distinct)
    // eval gram set against the (distinct) train gram set on the
    // (n, gram-hash) key — at 100 TB the distinct gram tables are the
    // shuffle, and only 8-byte hashes move.
    QDef("q202_ngram_coverage",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"),
            (tokenHash(concat(lit("cov:"), col("doc_id").cast("string")))
              % 20).as("b"))
          .localCheckpoint() // both splits' gram streams share it
        def grams(d: DataFrame): DataFrame =
          Seq(1, 2, 3).map { n =>
            d.select(lit(n.toLong).as("n"),
              explode(ngramHashes(col("toks"), n)).as("g"))
          }.reduce(_ unionAll _).distinct()
        val train = grams(t.filter(col("b") < 18))
        val eval = grams(t.filter(col("b") === 18))
          .localCheckpoint() // counted + probed
        val covered = eval.join(train, Seq("n", "g"), "left_semi")
          .groupBy("n").agg(count(lit(1)).as("n_covered"))
        eval.groupBy("n").agg(count(lit(1)).as("n_eval_grams"))
          .join(broadcast(covered), Seq("n"), "left")
          .select(col("n"), col("n_eval_grams"),
            coalesce(col("n_covered"), lit(0L)).as("n_covered"))
          .withColumn("coverage_milli",
            expr("(1000 * n_covered) div greatest(n_eval_grams, 1)"))
      },
      Some {
        def gramFrag(n: Int): String =
          if (n == 1) "toks[i]"
          else (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
        val streams = Seq(1, 2, 3).map { n =>
          s"""SELECT b, $n AS n, ${hashSql(gramFrag(n))} AS g
             |  FROM (SELECT b, toks,
             |      unnest(generate_series(1, len(toks) - ${n - 1})) AS i
             |    FROM t WHERE len(toks) >= $n) x$n""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH t AS (SELECT $toksSql AS toks,
           |    ${hashSql("'cov:' || CAST(doc_id AS VARCHAR)")} % 20 AS b
           |  FROM documents),
           |g AS ($streams),
           |tr AS (SELECT DISTINCT n, g FROM g WHERE b < 18),
           |ev AS (SELECT DISTINCT n, g FROM g WHERE b = 18),
           |cv AS (SELECT ev.n, CAST(count(*) AS BIGINT) AS n_covered
           |  FROM ev JOIN tr ON tr.n = ev.n AND tr.g = ev.g
           |  GROUP BY 1),
           |te AS (SELECT n, CAST(count(*) AS BIGINT) AS n_eval_grams
           |  FROM ev GROUP BY 1)
           |SELECT CAST(te.n AS BIGINT) AS n, te.n_eval_grams,
           |  coalesce(cv.n_covered, 0) AS n_covered,
           |  (1000 * coalesce(cv.n_covered, 0)) //
           |    greatest(te.n_eval_grams, 1) AS coverage_milli
           |FROM te LEFT JOIN cv ON cv.n = te.n""".stripMargin
      }),

    // Pipeline-order sensitivity: filter∘dedup vs dedup∘filter. The
    // orders disagree exactly when a duplicate cluster's canonical
    // (min id) FAILS the quality gate while another member passes:
    // gate-first keeps that member's content, dedup-first discards
    // the whole content. The audit quantifies the gap — the number a
    // pipeline-ordering debate should be had over, instead of vibes.
    QDef("q203_dedup_order_sensitivity",
      (s, dir) => {
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), tokenHash(col("text")).as("th"),
            size(tokens(col("text"))).cast("long").as("n_toks"),
            graft.ops.QualityGates.heuristicPass(col("text"),
              col("n_chars"), tokens(col("text"))).as("pass"))
          .localCheckpoint() // both orders read it
        // order A: gate first, then canonical per content among passers
        val a = base.filter(col("pass"))
          .groupBy("th").agg(min("doc_id").as("doc_id"),
            min("n_toks").as("n_toks"))
        // order B: canonical per content first, gate the canonical
        val b = base
          .groupBy("th").agg(min(struct(col("doc_id"), col("pass"),
            col("n_toks"))).as("c"))
          .filter(col("c.pass"))
          .select(col("th"), col("c.doc_id").as("doc_id"),
            col("c.n_toks").as("n_toks"))
        val sa = a.agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"))
          .select(lit("gate_then_dedup").as("order"), col("n_docs"),
            col("n_tokens"))
        val sb = b.agg(count(lit(1)).as("n_docs"),
          sum("n_toks").as("n_tokens"))
          .select(lit("dedup_then_gate").as("order"), col("n_docs"),
            col("n_tokens"))
        sa.unionAll(sb)
      },
      Some {
        val gate = """(len(toks) >= 5 AND len(toks) <= 100000
          | AND list_sum(list_transform(toks, x -> length(x)))::DOUBLE
          |   / len(toks) >= 2.0
          | AND list_sum(list_transform(toks, x -> length(x)))::DOUBLE
          |   / len(toks) <= 12.0
          | AND length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g'))::DOUBLE
          |   / n_chars < 0.3
          | AND length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE
          |   / n_chars < 0.3
          | AND len(list_distinct(toks))::DOUBLE / len(toks) > 0.2)"""
          .stripMargin.replace("\n", "")
        s"""WITH b0 AS (SELECT doc_id, text, n_chars,
           |    ${hashSql("text")} AS th, $toksSql AS toks
           |  FROM documents),
           |base AS (SELECT doc_id, th,
           |    CAST(len(toks) AS BIGINT) AS n_toks, $gate AS pass
           |  FROM b0),
           |a AS (SELECT th, min(doc_id) AS doc_id, min(n_toks) AS n_toks
           |  FROM base WHERE pass GROUP BY th),
           |b AS (SELECT th, min(doc_id) AS doc_id,
           |    arg_min(pass, doc_id) AS pass,
           |    arg_min(n_toks, doc_id) AS n_toks
           |  FROM base GROUP BY th)
           |SELECT 'gate_then_dedup' AS "order",
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(n_toks) AS BIGINT) AS n_tokens FROM a
           |UNION ALL
           |SELECT 'dedup_then_gate',
           |  CAST(count(*) AS BIGINT), CAST(sum(n_toks) AS BIGINT)
           |FROM b WHERE pass""".stripMargin
      }),

    // Join-key skew audit — the decision table behind "salt or not":
    // per candidate shuffle key, total rows, distinct keys, the
    // heaviest key's row share, and the max/mean skew factor. AQE
    // splits skewed JOIN partitions at runtime, but window/groupBy
    // hot keys (the q72-class killers) need design-time salting —
    // this is the number that decision reads. Each key audits in two
    // map-side-combined aggregations (per-key counts, then the
    // 4-number rollup); the three audited keys union O(1) rows.
    QDef("q204_key_skew_audit",
      (s, dir) => {
        def audit(df: DataFrame, keyName: String, key: org.apache.spark.sql.Column): DataFrame =
          df.groupBy(key.cast("string").as("k"))
            .agg(count(lit(1)).as("c"))
            .agg(count(lit(1)).as("n_keys"), sum("c").as("n_rows"),
              max("c").as("max_c"))
            .select(lit(keyName).as("key"), col("n_rows"), col("n_keys"),
              col("max_c").as("max_key_rows"),
              expr("(1000 * max_c) div n_rows").as("top_share_milli"),
              // skew = max / mean = max·n_keys / n_rows, in milli
              expr("(1000 * max_c * n_keys) div n_rows")
                .as("skew_milli"))
        audit(Tables.lineitem(s, dir), "lineitem.l_orderkey",
          col("l_orderkey"))
          .unionAll(audit(Tables.events(s, dir), "events.user_id",
            col("user_id")))
          .unionAll(audit(Tables.documents(s, dir), "documents.source",
            col("source")))
      },
      Some("""WITH a1 AS (SELECT count(*) AS c
             |  FROM lineitem GROUP BY CAST(l_orderkey AS VARCHAR)),
             |a2 AS (SELECT count(*) AS c
             |  FROM events GROUP BY CAST(user_id AS VARCHAR)),
             |a3 AS (SELECT count(*) AS c
             |  FROM documents GROUP BY source)
             |SELECT 'lineitem.l_orderkey' AS key,
             |  CAST(sum(c) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(max(c) AS BIGINT) AS max_key_rows,
             |  (1000 * CAST(max(c) AS BIGINT)) // CAST(sum(c) AS BIGINT)
             |    AS top_share_milli,
             |  (1000 * CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT))
             |    // CAST(sum(c) AS BIGINT) AS skew_milli
             |FROM a1
             |UNION ALL
             |SELECT 'events.user_id', CAST(sum(c) AS BIGINT),
             |  CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
             |  (1000 * CAST(max(c) AS BIGINT)) // CAST(sum(c) AS BIGINT),
             |  (1000 * CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT))
             |    // CAST(sum(c) AS BIGINT)
             |FROM a2
             |UNION ALL
             |SELECT 'documents.source', CAST(sum(c) AS BIGINT),
             |  CAST(count(*) AS BIGINT), CAST(max(c) AS BIGINT),
             |  (1000 * CAST(max(c) AS BIGINT)) // CAST(sum(c) AS BIGINT),
             |  (1000 * CAST(max(c) AS BIGINT) * CAST(count(*) AS BIGINT))
             |    // CAST(sum(c) AS BIGINT)
             |FROM a3""".stripMargin)),

    // Stop-shingle audit — the planning table behind PLANS.md's q118
    // mitigation (df-cap the prefix-filter index on dense corpora):
    // shingle document-frequency histogram in log-ish bands, with the
    // POSTING mass each band contributes. A heavy high-df band means
    // prefix-filter candidates go ~N² (the measured q118 sf1 case)
    // and the standard stop-shingle rule (drop df > bound) pays; a
    // hapax-dominated table means the rarest-first prefix is already
    // df-O(1). One distinct + one aggregation + an O(4)-row rollup.
    QDef("q205_stop_shingle_audit",
      (s, dir) => {
        val df = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(shingleHashes(col("toks"))).as("h"))
          .distinct()
          .groupBy("h").agg(count(lit(1)).as("df"))
        val band = when(col("df") === 1, "df=1")
          .when(col("df") <= 10, "df=2-10")
          .when(col("df") <= 100, "df=11-100")
          .otherwise("df>100")
        val wAll = Window
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        df.groupBy(band.as("band"))
          .agg(count(lit(1)).as("n_shingles"), sum("df").as("postings"))
          .withColumn("total_postings", sum("postings").over(wAll))
          .select(col("band"), col("n_shingles"), col("postings"),
            expr("(1000 * postings) div total_postings")
              .as("posting_share_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT DISTINCT doc_id, h FROM (
              |  SELECT doc_id, unnest(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_distinct(list_transform(
              |        generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS h FROM t) z),
              |d AS (SELECT h, count(*) AS df FROM g GROUP BY h),
              |b AS (SELECT CASE WHEN df = 1 THEN 'df=1'
              |      WHEN df <= 10 THEN 'df=2-10'
              |      WHEN df <= 100 THEN 'df=11-100'
              |      ELSE 'df>100' END AS band,
              |    CAST(count(*) AS BIGINT) AS n_shingles,
              |    CAST(sum(df) AS BIGINT) AS postings
              |  FROM d GROUP BY 1),
              |tt AS (SELECT CAST(sum(postings) AS BIGINT) AS tp FROM b)
              |SELECT band, n_shingles, postings,
              |  (1000 * postings) // tt.tp AS posting_share_milli
              |FROM b CROSS JOIN tt""".stripMargin)),

    // MinHash signature-width sweep: estimator error (MAE + signed
    // bias, milli) at widths 8/16/24 over the SAME verified pair set
    // — q140 calibrates the shipped 24-hash geometry; this is the
    // "how much does halving the signature cost" table (signature
    // bytes are the dominant dedup state at corpus scale). ONE
    // signature table feeds the band join, both verify sides, and
    // all three width estimates; the sweep is an explode over the
    // PAIR frame. Oracle replays band candidates (the q140 lesson)
    // and every width's prefix estimate.
    QDef("q206_minhash_width_sweep",
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
        val a = sig.select(col("doc_id").as("doc_a"),
          col("hs").as("hs_a"), col("mh").as("mh_a"))
        val b = sig.select(col("doc_id").as("doc_b"),
          col("hs").as("hs_b"), col("mh").as("mh_b"))
        cand.join(a, "doc_a").join(b, "doc_b")
          .withColumn("inter",
            size(array_intersect(col("hs_a"), col("hs_b"))).cast("long"))
          .withColumn("uni", size(col("hs_a")).cast("long") +
            size(col("hs_b")).cast("long") - col("inter"))
          .filter(col("inter").cast("double") / col("uni").cast("double")
            >= 0.8)
          .withColumn("exact_milli", expr("(1000 * inter) div uni"))
          .select(col("exact_milli"),
            explode(typedLit(Seq(8, 16, 24))).as("w"),
            col("mh_a"), col("mh_b"))
          .withColumn("est_milli", expr("(1000 * size(filter(" +
            "zip_with(slice(mh_a, 1, w), slice(mh_b, 1, w), " +
            "(x, y) -> x = y), v -> v))) div w"))
          .groupBy("w")
          .agg(count(lit(1)).as("n_pairs"),
            sum(abs(col("est_milli") - col("exact_milli"))).as("sae"),
            sum(col("est_milli") - col("exact_milli")).as("sbias"))
          .select(col("w").cast("long").as("w"), col("n_pairs"),
            expr("sae div n_pairs").as("mae_milli"),
            // bias can be negative: floor-div is fine, both engines
            // floor identically on negatives (// and div agree ≥ 0;
            // shift keeps the numerator non-negative)
            expr("((sbias + 1000000 * n_pairs) div n_pairs) - 1000000")
              .as("bias_milli"))
      },
      Some {
        val mins = (0 until 24).map { j =>
          val (a, b) = affineParam(j)
          s"list_min(list_transform(sh, h -> (h * $a + $b) % " +
            s"$MinhashPrime))"
        }.mkString("[", ",\n  ", "]")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |s AS (SELECT doc_id, list_distinct(list_transform(
           |    CASE WHEN len(toks) >= 3 THEN
           |      list_transform(generate_series(1, len(toks) - 2),
           |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           |      ELSE [] END,
           |    g -> ${hashSql("g")})) AS sh
           |  FROM t WHERE len(toks) >= 3),
           |m AS (SELECT doc_id, sh, $mins AS sig FROM s),
           |p AS (SELECT len(list_intersect(a.sh, b.sh)) AS inter,
           |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
           |      AS uni,
           |    a.sig AS sa, b.sig AS sb
           |  FROM m a JOIN m b ON a.doc_id < b.doc_id
           |  WHERE len(list_filter(generate_series(1, 12), k ->
           |      a.sig[2*k-1] = b.sig[2*k-1] AND a.sig[2*k] = b.sig[2*k]))
           |    > 0
           |    AND len(list_intersect(a.sh, b.sh))::DOUBLE /
           |    (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
           |    >= 0.8),
           |x AS (SELECT (1000 * inter) // uni AS exact_milli,
           |    CAST(unnest([8, 16, 24]) AS INT) AS w, sa, sb
           |  FROM p),
           |e AS (SELECT w, exact_milli,
           |    (1000 * len(list_filter(list_zip(
           |      list_slice(sa, 1, w), list_slice(sb, 1, w)),
           |      z -> z[1] = z[2]))) // w AS est_milli
           |  FROM x)
           |SELECT CAST(w AS BIGINT) AS w,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(abs(est_milli - exact_milli)) AS BIGINT)
           |    // count(*) AS mae_milli,
           |  ((CAST(sum(est_milli - exact_milli) AS BIGINT)
           |    + 1000000 * count(*)) // count(*)) - 1000000
           |    AS bias_milli
           |FROM e GROUP BY 1""".stripMargin
      }),

    // Per-source dedup rates — q200's funnel broken out by source:
    // which sources lose the most mass to exact and near-dup removal
    // (the number that moves a source's mixing weight when its
    // apparent volume is mostly re-crawls). Same machinery as q200
    // (hash canonical, CC min-label canonical), one extra source
    // dimension in the rollups.
    QDef("q207_source_dedup_rate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"),
            tokenHash(col("text")).as("th"))
          .localCheckpoint() // all three rollups read it
        val exactKeep = docs.groupBy("th").agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val s1 = docs.join(exactKeep, "doc_id").localCheckpoint()
        val pairs = graft.ops.Dedup.nearDupMinhash(
          s1.select(col("doc_id"), col("text")), "doc_id", "text",
          threshold = 0.8)
        val comp = graft.ops.ConnectedComponents.run(pairs, "doc_a", "doc_b")
        val s2 = s1.join(
            comp.select(col("node").as("doc_id"), col("component")),
            Seq("doc_id"), "left")
          .filter(col("component").isNull ||
            col("component") === col("doc_id"))
        val total = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
        val e1 = s1.groupBy("source").agg(count(lit(1)).as("n_exact"))
        val e2 = s2.groupBy("source").agg(count(lit(1)).as("n_neardup"))
        total.join(broadcast(e1), "source").join(broadcast(e2), "source")
          .select(col("source"), col("n_docs"), col("n_exact"),
            col("n_neardup"),
            expr("(1000 * (n_docs - n_neardup)) div n_docs")
              .as("removed_milli"))
      },
      Some(s"""WITH RECURSIVE d AS (SELECT doc_id, source,
              |    ${hashSql("text")} AS th, $toksSql AS toks
              |  FROM documents),
              |k1 AS (SELECT min(doc_id) AS doc_id FROM d GROUP BY th),
              |s1 AS (SELECT d.* FROM d JOIN k1 USING (doc_id)),
              |sg AS (SELECT doc_id, list_distinct(list_transform(
              |    CASE WHEN len(toks) >= 3 THEN
              |      list_transform(generate_series(1, len(toks) - 2),
              |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              |      ELSE [] END,
              |    g -> ${hashSql("g")})) AS sh
              |  FROM s1),
              |p AS (SELECT a.doc_id AS da, b.doc_id AS db
              |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
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
              |s2 AS (SELECT s1.* FROM s1
              |  LEFT JOIN cl ON cl.node = s1.doc_id
              |  WHERE cl.cid IS NULL OR cl.cid = s1.doc_id),
              |t0 AS (SELECT source, count(*) AS n_docs
              |  FROM d GROUP BY 1),
              |t1 AS (SELECT source, count(*) AS n_exact
              |  FROM s1 GROUP BY 1),
              |t2 AS (SELECT source, count(*) AS n_neardup
              |  FROM s2 GROUP BY 1)
              |SELECT t0.source, CAST(t0.n_docs AS BIGINT) AS n_docs,
              |  CAST(t1.n_exact AS BIGINT) AS n_exact,
              |  CAST(t2.n_neardup AS BIGINT) AS n_neardup,
              |  (1000 * CAST(t0.n_docs - t2.n_neardup AS BIGINT)) //
              |    CAST(t0.n_docs AS BIGINT) AS removed_milli
              |FROM t0 JOIN t1 USING (source) JOIN t2 USING (source)"""
        .stripMargin))
  )
}
