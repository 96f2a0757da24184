package graft.queries

import graft.Tables
import graft.functions.TextAnalysis.{affineParam, tokens, tokenHash, MinhashPrime}
import graft.ops.{Dedup, KCore, Sketches}
import org.apache.spark.sql.functions._

/** Twenty-sixth pipeline group — dataset governance audits:
  *
  *  - q224: readability grade per source via the FORCAST formula
  *    (grade = 20 − monosyllables-per-150-words / 10), the classic
  *    readability measure that needs NO sentence boundaries — the
  *    right variant for boilerplate-stripped / punctuation-free
  *    training text. Syllables are vowel groups (`[aeiou]+`), a
  *    heuristic both regex engines evaluate identically; all
  *    arithmetic is integer milli-grades so the cross-engine hash is
  *    exact. Plan: one token explode with map-side partial
  *    aggregation to per-doc rows, then a per-source rollup — the
  *    q104 two-level shape.
  *  - q225: column completeness/cardinality profile of `documents` —
  *    per column: null count, EXACT distinct count, min/max (as
  *    strings, binary collation in both engines). One corpus pass;
  *    the multi-distinct aggregation plans as one Expand (×5 rows
  *    map-side, combined before the single exchange). At 100 TB the
  *    same query swaps `count_distinct` for HLL (q111) — the exact
  *    form is the oracle-checkable contract.
  *  - q226: k-anonymity risk audit over the quasi-identifier
  *    (lang, source, n_chars div 100): for k ∈ {2, 5, 10}, how many
  *    QI groups have fewer than k members and how much document mass
  *    sits in them — the re-identification exposure measure privacy
  *    reviews ask of published training corpora. The corpus collapses
  *    to one bounded group-size frame in a single shuffle; the k
  *    sweep fans out over that tiny frame, never the corpus.
  */
object PipelineQueries26 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** Profiled columns of `documents`, in output order. */
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  /** (source, doc_id, h): 60-bit hashes of 32-token/stride-16 sliding
    * passages (full windows only) — one definition serves q227 and
    * q230 so the chunking geometry can never desynchronize between
    * the dup audit and the deletion audit. Tokens materialize as
    * their own projection (the lambda-reevaluation rule); the explode
    * rides an expression child (exempt from InferFiltersFromGenerate
    * inlining, the q92 shape).
    */
  private def passageHashes(s: org.apache.spark.sql.SparkSession,
                            dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 32)
      .select(col("source"), col("doc_id"),
        explode(expr("transform(sequence(1, size(toks) - 31, 16), " +
          "i -> array_join(slice(toks, i, 32), ' '))")).as("passage"))
      .select(col("source"), col("doc_id"),
        Sketches.hash60(col("passage")).as("h"))

  /** DuckDB twin of [[passageHashes]], as a `ph(source, doc_id, h)`
    * CTE body (caller supplies `WITH`).
    */
  private val passagesCte: String =
    s"""pt AS (SELECT source, doc_id, $toksSql AS toks FROM documents),
       |pp AS (SELECT source, doc_id, unnest(list_transform(
       |        generate_series(1, len(toks) - 31, 16),
       |        i -> array_to_string(list_slice(toks, i, i + 31), ' ')))
       |        AS passage
       |      FROM pt WHERE len(toks) >= 32),
       |ph AS (SELECT source, doc_id,
       |        cast('0x' || substr(md5(passage), 1, 15) as bigint) AS h
       |      FROM pp)""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q224_readability",
      (s, dir) => {
        val perDoc = Tables.documents(s, dir)
          .select(col("source"), col("doc_id"),
            explode(tokens(col("text"))).as("tok"))
          .select(col("source"), col("doc_id"),
            (regexp_count(col("tok"), lit("[aeiou]+")) === 1)
              .cast("long").as("mono"))
          .groupBy("source", "doc_id")
          .agg(sum("mono").as("mono"), count(lit(1)).as("n"))
          .filter(col("n") > 0)
          // FORCAST in milli-grades: 20000 − ((150·mono/n)/10)·1000
          .select(col("source"),
            expr("20000L - (15000L * mono) div n").as("grade_milli"))
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum("grade_milli").as("sg"))
          .select(col("source"), col("n_docs"),
            expr("sg div n_docs").as("mean_grade_milli"))
      },
      Some(s"""WITH t AS (SELECT source, doc_id, unnest($toksSql) AS tok
              |           FROM documents),
              |p AS (SELECT source, doc_id,
              |    CAST(sum(CASE WHEN len(regexp_extract_all(tok, '[aeiou]+')) = 1
              |             THEN 1 ELSE 0 END) AS BIGINT) AS mono,
              |    CAST(count(*) AS BIGINT) AS n
              |  FROM t GROUP BY 1, 2),
              |g AS (SELECT source, 20000 - (15000 * mono) // n AS grade
              |      FROM p WHERE n > 0)
              |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(CAST(sum(grade) AS BIGINT) // count(*) AS BIGINT)
              |    AS mean_grade_milli
              |FROM g GROUP BY source""".stripMargin)),

    QDef("q225_column_profile",
      (s, dir) => {
        val d = Tables.documents(s, dir)
        val aggs = ProfileCols.flatMap(c => Seq(
          sum(col(c).isNull.cast("long")).as(s"nn_$c"),
          count_distinct(col(c)).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mi_$c"),
          max(col(c)).cast("string").as(s"ma_$c")))
        d.agg(aggs.head, aggs.tail: _*)
          .select(explode(array(ProfileCols.map(c =>
            struct(lit(c).as("col_name"),
              col(s"nn_$c").as("n_null"),
              col(s"nd_$c").as("n_distinct"),
              col(s"mi_$c").as("min_value"),
              col(s"ma_$c").as("max_value"))): _*)).as("p"))
          .select(col("p.col_name"), col("p.n_null"), col("p.n_distinct"),
            col("p.min_value"), col("p.max_value"))
      },
      Some(ProfileCols.map(c =>
        s"""SELECT '$c' AS col_name,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  min($c)::VARCHAR AS min_value,
           |  max($c)::VARCHAR AS max_value
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n"))),

    QDef("q226_k_anonymity",
      (s, dir) => {
        val sizes = Tables.documents(s, dir)
          .groupBy(col("lang"), col("source"),
            expr("n_chars div 100").as("len_bucket"))
          .agg(count(lit(1)).as("sz"))
        sizes
          .select(explode(array(lit(2L), lit(5L), lit(10L))).as("k"),
            col("sz"))
          .groupBy("k")
          .agg(
            sum(when(col("sz") < col("k"), 1L).otherwise(0L))
              .as("n_risky_groups"),
            sum(when(col("sz") < col("k"), col("sz")).otherwise(0L))
              .as("n_risky_docs"),
            sum(col("sz")).as("nd"))
          .select(col("k"), col("n_risky_groups"), col("n_risky_docs"),
            expr("(1000 * n_risky_docs) div nd").as("risky_milli"))
      },
      Some("""WITH g AS (SELECT lang, source, n_chars // 100 AS len_bucket,
             |             CAST(count(*) AS BIGINT) AS sz
             |           FROM documents GROUP BY 1, 2, 3),
             |x AS (SELECT k, sz FROM g CROSS JOIN
             |        (SELECT unnest([2, 5, 10]) AS k))
             |SELECT CAST(k AS BIGINT) AS k,
             |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_risky_groups,
             |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
             |    AS n_risky_docs,
             |  CAST((1000 * CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END)
             |    AS BIGINT)) // CAST(sum(sz) AS BIGINT) AS BIGINT)
             |    AS risky_milli
             |FROM x GROUP BY k""".stripMargin)),

    // Sliding-window passage chunking — the RAG indexing prep: 32-token
    // windows at stride 16 (full windows only, documented), passage
    // identity an 8-byte 60-bit hash (the CdcChunks collision lesson —
    // a 32-bit id birthday-collides near 77k distinct chunks), and the
    // per-source duplicate-passage mass that decides whether passage-
    // level dedup is worth a pass. Plan: tokens materialized once, the
    // window transform explodes OVER AN EXPRESSION (non-attribute
    // child — exempt from the InferFiltersFromGenerate inlining trap,
    // the q92 shape), then one aggregation; shuffle rows carry
    // (source, long), never passage strings.
    QDef("q227_passage_chunks",
      (s, dir) =>
        passageHashes(s, dir)
          .groupBy("source")
          .agg(count(lit(1)).as("n_passages"),
            count_distinct(col("h")).as("n_distinct"))
          .select(col("source"), col("n_passages"), col("n_distinct"),
            expr("(1000 * (n_passages - n_distinct)) div n_passages")
              .as("dup_milli")),
      Some(s"""WITH $passagesCte
              |SELECT source, CAST(count(*) AS BIGINT) AS n_passages,
              |  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
              |  CAST((1000 * (count(*) - count(DISTINCT h))) // count(*)
              |    AS BIGINT) AS dup_milli
              |FROM ph GROUP BY source""".stripMargin)),

    // Split-leakage audit: does the 'bo:' hash split (train = buckets
    // 0-17, the protocol q162/q168/q170/q186 all evaluate under)
    // leak near-duplicate TRAIN content into its held-out buckets?
    // Pairs come from the q25 LSH geometry (12×2 bands, exact-Jaccard
    // ≥ 0.8 verify) run CROSS-split — candidate volume scales with
    // the 10% eval mass, the incremental-crawl shape of q112. Output
    // is the per-bucket leak rate; a nonzero row is the number every
    // eval score on this split must be discounted by. The oracle
    // replays band-candidate generation (the q140 lesson) so both
    // engines define the pair set identically rather than resting on
    // banding recall.
    QDef("q228_split_leakage",
      (s, dir) => {
        val withB = Tables.documents(s, dir)
          .withColumn("b",
            tokenHash(concat(lit("bo:"), col("doc_id").cast("string")))
              % 20)
        val train = withB.filter(col("b") < 18)
        val ev = withB.filter(col("b") >= 18)
        val leaked = Dedup
          .nearDupMinhashCross(ev, train, "doc_id", "text",
            numBands = 12, rowsPerBand = 2, threshold = 0.8)
          .select(col("doc_new").as("doc_id")).distinct()
          .withColumn("leak", lit(1L))
        ev.select(col("doc_id"), col("b"))
          .join(broadcast(leaked), Seq("doc_id"), "left")
          .groupBy("b")
          .agg(count(lit(1)).as("n_docs"),
            sum(coalesce(col("leak"), lit(0L))).as("n_leaked"))
          .select(col("b").as("bucket"), col("n_docs"), col("n_leaked"),
            expr("(1000 * n_leaked) div n_docs").as("leak_milli"))
      },
      Some {
        val mins = (0 until 24).map { j =>
          val (a, b) = affineParam(j)
          s"list_min(list_transform(sh, h -> (h * $a + $b) % " +
            s"$MinhashPrime))"
        }.mkString("[", ",\n  ", "]")
        val splitSql =
          "cast('0x' || substr(md5('bo:' || CAST(doc_id AS VARCHAR)), " +
            "1, 8) as bigint) % 20"
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks, $splitSql AS b
           |           FROM documents),
           |s AS (SELECT doc_id, b, list_distinct(list_transform(
           |    list_transform(generate_series(1, len(toks) - 2),
           |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
           |    g -> cast('0x' || substr(md5(g), 1, 8) as bigint))) AS sh
           |  FROM t WHERE len(toks) >= 3),
           |m AS (SELECT doc_id, b, sh, $mins AS sig FROM s),
           |p AS (SELECT a.doc_id AS doc_id
           |  FROM m a JOIN m tr ON a.b >= 18 AND tr.b < 18
           |  WHERE len(list_filter(generate_series(1, 12), k ->
           |      a.sig[2*k-1] = tr.sig[2*k-1] AND a.sig[2*k] = tr.sig[2*k]))
           |    > 0
           |    AND len(list_intersect(a.sh, tr.sh))::DOUBLE /
           |    (len(a.sh) + len(tr.sh) - len(list_intersect(a.sh, tr.sh)))
           |    >= 0.8),
           |lk AS (SELECT DISTINCT doc_id FROM p),
           |ev AS (SELECT doc_id, b FROM t WHERE b >= 18)
           |SELECT b AS bucket, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(count(lk.doc_id) AS BIGINT) AS n_leaked,
           |  CAST((1000 * count(lk.doc_id)) // count(*) AS BIGINT)
           |    AS leak_milli
           |FROM ev LEFT JOIN lk USING (doc_id) GROUP BY b""".stripMargin
      }),

    // k-core decomposition of the near-dup graph (q25 pairs): the
    // 2-core separates dup CHAINS from isolated pairs, the 3-core
    // finds the densely-mutual clusters (boilerplate families, spam
    // farms) that CC's component view cannot distinguish from long
    // chains. Synchronized peel (ops/KCore) — order-free, so both
    // engines land on the unique k-core; the round count becomes a
    // plan-time constant and the oracle replays exactly that many
    // peel stages (the q99 unroll pattern, late-bound like q30's
    // centroids because rounds are data-dependent).
    QDef("q229_kcore",
      (s, dir) => {
        val pairs = Dedup
          .nearDupMinhashArtifact(Tables.documents(s, dir), "doc_id",
            "text", fpKey = s"$dir#documents#id_text")
          .select(col("doc_a"), col("doc_b"))
          .localCheckpoint() // both k-core peels start from it
        val perK = Seq(2, 3).map { k =>
          val (core, rounds) = KCore.kCore(pairs, "doc_a", "doc_b", k)
          KCoreState.rounds(k) = rounds
          val nodes = core.select(col("a").as("n"))
            .unionAll(core.select(col("b").as("n")))
          core.agg(count(lit(1)).as("n_edges"))
            .crossJoin(nodes.agg(count_distinct(col("n")).as("n_nodes")))
            .select(lit(k.toLong).as("k"), col("n_nodes"),
              col("n_edges"), lit(rounds.toLong).as("rounds"))
        }
        perK.reduce(_ unionAll _)
      },
      oracle = None,
      oracleLate = Some(() =>
        for (r2 <- KCoreState.rounds.get(2); r3 <- KCoreState.rounds.get(3))
          yield kcoreOracleSql(Map(2 -> r2, 3 -> r3)))),

    // Deletion-propagation audit — the "right to be forgotten" check a
    // governed corpus runs before attesting a takedown: delete-list =
    // ~2% of docs by hash; for each derived artifact, how many of the
    // deleted docs' content units ESCAPE deletion because a kept doc
    // carries identical content. Rows: doc_content (exact-dup text
    // copies surviving among kept docs — dropping the row does not
    // drop the content), passages (32/16 sliding chunks of deleted
    // docs still present verbatim in kept docs — partial-copy
    // escape), shards_touched (how many of q97's output shards
    // contain a deleted doc and must be rewritten — reuses q97's
    // QDef fn and oracle SQL verbatim, the q219 nesting pattern, so
    // the audit can never drift from the real assignment). Every
    // probe frame is tiny (distinct deleted-unit hashes) and
    // broadcasts; the corpus is scanned, never self-joined.
    QDef("q230_deletion_audit",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), md5(col("text")).as("ch"),
            (tokenHash(concat(lit("del:"), col("doc_id").cast("string")))
              % 50 === 0).as("deleted"))
          .localCheckpoint() // content + passage + shard probes share it
        val delHashes = docs.filter(col("deleted"))
          .select(col("ch")).distinct()
        val escContent = docs.filter(!col("deleted"))
          .join(broadcast(delHashes), Seq("ch"), "left_semi")
          .select(col("ch")).distinct()
        val pass = passageHashes(s, dir)
          .join(docs.select(col("doc_id"), col("deleted")), "doc_id")
        val delPass = pass.filter(col("deleted")).select(col("h")).distinct()
          .localCheckpoint() // unit count + escape probe share it
        val escPass = pass.filter(!col("deleted"))
          .join(broadcast(delPass), Seq("h"), "left_semi")
          .select(col("h")).distinct()
        val shards = PipelineQueries4.defs
          .find(_.name == "q97_shard_assign").get.fn(s, dir)
          .select(col("doc_id"), col("shard_id"))
          .join(docs.select(col("doc_id"), col("deleted")), "doc_id")
          .localCheckpoint() // total + touched share one assignment run
        def row(name: String, units: org.apache.spark.sql.DataFrame,
                escaped: org.apache.spark.sql.DataFrame) =
          units.agg(count(lit(1)).as("n_units"))
            .crossJoin(escaped.agg(count(lit(1)).as("n_escaped")))
            .select(lit(name).as("artifact"), col("n_units"),
              col("n_escaped"),
              expr("(1000 * n_escaped) div greatest(n_units, 1L)")
                .as("escaped_milli"))
        row("doc_content", delHashes, escContent)
          .unionAll(row("passages", delPass, escPass))
          .unionAll(row("shards_touched",
            shards.select(col("shard_id")).distinct(),
            shards.filter(col("deleted"))
              .select(col("shard_id")).distinct()))
      },
      Some {
        val q97Sql = PipelineQueries4.defs
          .find(_.name == "q97_shard_assign").get.oracle.get
        val delSql = "cast('0x' || substr(md5('del:' || " +
          "CAST(doc_id AS VARCHAR)), 1, 8) as bigint) % 50 = 0"
        s"""WITH d AS (SELECT doc_id, md5(text) AS ch, $delSql AS deleted
           |           FROM documents),
           |delh AS (SELECT DISTINCT ch FROM d WHERE deleted),
           |esch AS (SELECT DISTINCT d.ch FROM d
           |         JOIN delh USING (ch) WHERE NOT deleted),
           |$passagesCte,
           |pd AS (SELECT DISTINCT h FROM ph JOIN d USING (doc_id)
           |       WHERE deleted),
           |pe AS (SELECT DISTINCT ph.h FROM ph JOIN d USING (doc_id)
           |       JOIN pd ON ph.h = pd.h WHERE NOT deleted),
           |sa AS (SELECT doc_id, shard_id FROM ($q97Sql)),
           |su AS (SELECT DISTINCT shard_id FROM sa),
           |st AS (SELECT DISTINCT shard_id FROM sa JOIN d USING (doc_id)
           |       WHERE deleted),
           |m AS (
           |  SELECT 'doc_content' AS artifact,
           |    (SELECT count(*) FROM delh) AS n_units,
           |    (SELECT count(*) FROM esch) AS n_escaped
           |  UNION ALL
           |  SELECT 'passages',
           |    (SELECT count(*) FROM pd), (SELECT count(*) FROM pe)
           |  UNION ALL
           |  SELECT 'shards_touched',
           |    (SELECT count(*) FROM su), (SELECT count(*) FROM st))
           |SELECT artifact, CAST(n_units AS BIGINT) AS n_units,
           |  CAST(n_escaped AS BIGINT) AS n_escaped,
           |  CAST((1000 * n_escaped) // greatest(n_units, 1) AS BIGINT)
           |    AS escaped_milli
           |FROM m""".stripMargin
      }),

    // DoReMi-flavored domain reweighting: train the q78 unigram LM on
    // the 90% 'bo:' split, score each source's HELD-OUT tokens, and
    // up-weight sources by excess NLL over the easiest source —
    // excess held-out loss marks under-represented/harder domains
    // (the DoReMi intuition) with a deterministic integer proxy in
    // place of the reference-model loop: weight ∝ train-share ×
    // (1000 + excess_milli), normalized to milli. Scale shape: the
    // corpus is touched twice (train counts, eval probe) over one
    // checkpointed token stream; everything after is arithmetic on
    // O(#sources) rows, with the vocab broadcast (the q78 contract).
    QDef("q232_domain_reweight",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("source"),
            (tokenHash(concat(lit("bo:"), col("doc_id").cast("string")))
              % 20).as("b"),
            explode(tokens(col("text"))).as("tok"))
          .localCheckpoint() // train counts + shares + eval probe
        val train = t.filter(col("b") < 18)
        val freq = train.groupBy("tok").agg(count(lit(1)).as("cnt"))
        val totalDf = freq.agg(sum("cnt").as("total"))
        val vocab = freq.orderBy(col("cnt").desc, col("tok")).limit(50000)
        val shares = train.groupBy("source")
          .agg(count(lit(1)).as("n_train"))
          .localCheckpoint() // join + total read it
        val p = when(col("cnt").isNotNull,
          col("total").cast("double") / col("cnt").cast("double"))
          .otherwise(col("total").cast("double") * 2.0)
        val ev = t.filter(col("b") >= 18)
          .join(broadcast(vocab), Seq("tok"), "left")
          .crossJoin(broadcast(totalDf))
          .withColumn("mnat", floor(lit(1000.0) * log(p)).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_eval_tokens"), sum("mnat").as("snll"))
          .select(col("source"), col("n_eval_tokens"),
            expr("snll div n_eval_tokens").as("nll_milli"))
          .localCheckpoint() // min probe + weight rows read it
        // NOT checkpointed: j's lineage starts at the two checkpoints
        // above, so its double execution (rows + normalization total)
        // re-runs only O(#sources) arithmetic — and the plan contract
        // keeps the joins visible (the q214 checkpoint-blindness trap)
        val j = ev.join(broadcast(shares), "source")
          .crossJoin(broadcast(ev.agg(min("nll_milli").as("mn"))))
          .crossJoin(broadcast(shares.agg(sum("n_train").as("nt"))))
          .withColumn("excess_milli", col("nll_milli") - col("mn"))
          .withColumn("w_raw",
            expr("((1000 * n_train) div nt) * (1000 + excess_milli)"))
        j.crossJoin(broadcast(j.agg(sum("w_raw").as("tw"))))
          .select(col("source"), col("n_eval_tokens"), col("nll_milli"),
            col("excess_milli"),
            expr("(1000 * w_raw) div tw").as("weight_milli"))
      },
      Some {
        val splitSql = "cast('0x' || substr(md5('bo:' || " +
          "CAST(doc_id AS VARCHAR)), 1, 8) as bigint) % 20"
        s"""WITH t AS (SELECT source, $splitSql AS b, $toksSql AS toks
           |           FROM documents),
           |e AS (SELECT source, b, unnest(toks) AS tok FROM t),
           |tr AS (SELECT * FROM e WHERE b < 18),
           |f AS (SELECT tok, count(*) AS cnt FROM tr GROUP BY tok),
           |tot AS (SELECT sum(cnt) AS total FROM f),
           |v AS (SELECT tok, cnt FROM f ORDER BY cnt DESC, tok
           |      LIMIT 50000),
           |sh AS (SELECT source, CAST(count(*) AS BIGINT) AS n_train
           |       FROM tr GROUP BY source),
           |nt AS (SELECT CAST(sum(n_train) AS BIGINT) AS nt FROM sh),
           |ev AS (SELECT e.source,
           |    CAST(count(*) AS BIGINT) AS n_eval_tokens,
           |    CAST(sum(CAST(floor(1000.0 * ln(CASE
           |      WHEN v.cnt IS NOT NULL THEN tot.total::DOUBLE / v.cnt
           |      ELSE tot.total::DOUBLE * 2.0 END)) AS BIGINT))
           |      AS BIGINT) AS snll
           |  FROM e LEFT JOIN v USING (tok) CROSS JOIN tot
           |  WHERE e.b >= 18 GROUP BY e.source),
           |ev2 AS (SELECT source, n_eval_tokens,
           |    snll // n_eval_tokens AS nll_milli FROM ev),
           |mn AS (SELECT min(nll_milli) AS mn FROM ev2),
           |j AS (SELECT ev2.source, n_eval_tokens, nll_milli,
           |    nll_milli - mn.mn AS excess_milli,
           |    ((1000 * sh.n_train) // nt.nt) *
           |      (1000 + nll_milli - mn.mn) AS w_raw
           |  FROM ev2 JOIN sh USING (source) CROSS JOIN mn CROSS JOIN nt),
           |tw AS (SELECT CAST(sum(w_raw) AS BIGINT) AS tw FROM j)
           |SELECT source, n_eval_tokens,
           |  CAST(nll_milli AS BIGINT) AS nll_milli,
           |  CAST(excess_milli AS BIGINT) AS excess_milli,
           |  CAST((1000 * w_raw) // tw.tw AS BIGINT) AS weight_milli
           |FROM j CROSS JOIN tw""".stripMargin
      })
  )

  /** Peel round counts recorded by the q229 run, read by its late
    * oracle (the IvfOracle pattern).
    */
  private object KCoreState {
    val rounds = scala.collection.concurrent.TrieMap[Int, Int]()
  }

  /** Unrolls the synchronized peel: `rounds(k)` MATERIALIZED stages
    * per k, each stage = degree filter + both-endpoint semi join of
    * the previous edge set (DuckDB default CTEs inline — the q212
    * "Too many open files" lesson makes MATERIALIZED load-bearing).
    */
  private def kcoreOracleSql(rounds: Map[Int, Int]): String = {
    val stages = new StringBuilder
    val finals = rounds.toSeq.sortBy(_._1).map { case (k, r) =>
      stages.append(
        s"e${k}_0 AS MATERIALIZED (SELECT da AS a, db AS b FROM pr),\n")
      for (i <- 1 to r) {
        val prev = s"e${k}_${i - 1}"
        stages.append(
          s"""k${k}_$i AS MATERIALIZED (SELECT node FROM
             |  (SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev)
             |  GROUP BY node HAVING count(*) >= $k),
             |e${k}_$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
             |  JOIN k${k}_$i ka ON e.a = ka.node
             |  JOIN k${k}_$i kb ON e.b = kb.node),
             |""".stripMargin)
      }
      s"""SELECT CAST($k AS BIGINT) AS k,
         |  (SELECT CAST(count(*) AS BIGINT) FROM
         |    (SELECT a AS n FROM e${k}_$r UNION SELECT b FROM e${k}_$r))
         |    AS n_nodes,
         |  (SELECT CAST(count(*) AS BIGINT) FROM e${k}_$r) AS n_edges,
         |  CAST($r AS BIGINT) AS rounds""".stripMargin
    }
    s"""WITH ${PipelineQueries.pairCtes(0.8, materialized = true)},
       |${stages.toString}
       |dummy AS (SELECT 1)
       |${finals.mkString("\nUNION ALL\n")}""".stripMargin
  }
}
