package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.ops.{Decontaminate, Sketches}
import graft.streaming.{StreamMinhashIndex, StreamWinnowIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Eighty-first pipeline group — the CURATE-ON-ARRIVAL composite and
  * the full curate → shard → manifest chain over maintained state.
  *
  *  - q400: the three maintained-state curation gates a 100 TB
  *    training-data pipeline applies to every arriving crawl slice,
  *    composed end-to-end and audited per-document by both engines:
  *    QUALITY (a replayable token-count floor — the cheap map-side
  *    gate; the richer scorers are q16/q68's standalone surface),
  *    DEDUP-ON-ARRIVAL (q394's contract — each slice checks the
  *    MAINTAINED MinHash index state before posting itself, so a doc
  *    is a dup iff a ≥0.8-Jaccard partner arrived in an EARLIER
  *    slice; q25's full-recall-at-(12,2) argument), and DECON
  *    (fingerprint overlap against the MAINTAINED winnow index of a
  *    protected eval set, doc_id % 10 = 7 — the q93 answer served
  *    from standing state). Output is one row per arriving doc with
  *    all three verdicts and the composed accept bit — the audit
  *    frame a curation run ships with its output.
  *  - q406 (r15 verdict #3): the chain the whole §8 surface exists
  *    for — "arriving crawl slice → training shards with audit
  *    trail" as ONE oracle-checked composite: q400's accepted set
  *    flows into q97's token-balanced shard assignment and q122's
  *    manifest emission (per shard: doc count, token count,
  *    order-free bit_xor content checksum). The oracle replays ALL
  *    of it from the raw corpus — gate verdicts, prefix-sum shard
  *    assignment, manifest checksums — so the maintained stores only
  *    ever ACCELERATE the chain, never change its output.
  *
  * CONCURRENCY SCOPE: drives fixed `target/` store paths — correct
  * under the strictly-single-threaded driver contract (see
  * [[PipelineQueries75]]'s scope note).
  */
object PipelineQueries81 {

  /** Shared DuckDB fragments, kept in lockstep with TextAnalysis. */
  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "cast('0x' || substr(md5(__T__), 1, 8) as bigint)"

  private val NB = 12
  private val R = 2
  private val MinTokens = 5

  /** The curate-on-arrival measurement — ONE copy for q400 (which
    * emits the audit frame) and q406 (which chains the accepted set
    * into shards): three arrival rounds against a maintained MinHash
    * index (check THEN insert, the q394 loop), decon against the
    * served winnow index of the protected eval set, the cheap quality
    * floor. Returns the per-doc audit frame. */
  private def curateOnArrival(s: SparkSession, dir: String,
                              dedupStore: String,
                              evalStore: String): DataFrame = {
    Seq(dedupStore, evalStore).foreach(graft.ops.Fs.wipe)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("text"))
    // the protected eval set's maintained winnow index — standing
    // corpus-side state, built once, served part-addressed
    val eval = docs.where(pmod(col("doc_id"), lit(10)) === 7)
    // the eval-index build (its own store) and the dedup arrival loop
    // (ordered rounds against the other store) are independent — run
    // them concurrently; each task keeps its own internal order
    // (guide §2.6, the q397/q407 fan-out idiom)
    val legs = graft.ops.Par.run(Seq("eval", "arrival"), 2) {
      case "eval" =>
        Seq(0, 1).foreach { b =>
          StreamWinnowIndex.applyBatch(
            eval.where(pmod(col("doc_id"), lit(2)) === b), b.toLong,
            "doc_id", "text", evalStore)
        }
        StreamWinnowIndex.servedFps(s, evalStore,
            StreamWinnowIndex.K, StreamWinnowIndex.W)
          .select(col("fp")).distinct()
          .localCheckpoint() // joined by the decon gate below
      case _ =>
        // dedup-on-arrival rounds (q394's loop, verbatim contract);
        // the round's band keys derive ONCE (checkpointed) and feed
        // both the candidate join and the store commit — the apply
        // used to re-run tokenize → shingle-md5 → minhash per round
        (0 until 3).map { b =>
          val batch = docs.where(pmod(col("doc_id"), lit(3)) === b)
          val keys = StreamMinhashIndex
            .batchKeys(batch, "doc_id", "text", NB, R).localCheckpoint()
          val cand =
            if (StreamMinhashIndex.appliedBid(dedupStore) < 0) None
            else {
              val idx = StreamMinhashIndex.servedKeys(s, dedupStore,
                NB, R)
              // materialized NOW (the q394 lesson): the next round's
              // serve vacuums this round's superseded part-artifacts
              Some(keys.as("x")
                .join(idx.as("y"), col("x.bk") === col("y.bk"))
                .select(col("x.doc_id").as("doc_new"),
                  col("y.doc_id").as("doc_prior"))
                .distinct()
                .localCheckpoint())
            }
          StreamMinhashIndex.applyKeys(keys, b.toLong, NB, R, dedupStore)
          if (b == 1) StreamMinhashIndex.compact(s, dedupStore)
          cand
        }.flatten.reduce(_ unionAll _)
    }
    val (evalFps, hits) = (legs(0), legs(1))
    val corpus = PipelineQueries77.corpusShingles(s, dir)
    val dupIds = PipelineQueries77
      .verifyPairs(hits, corpus, "doc_new", "doc_prior", 0.8)
      .select(col("doc_new").as("doc_id")).distinct()
    // decon gate: arrival fingerprints vs the SERVED eval index
    val deconIds = Decontaminate
      .fingerprints(docs, "doc_id", "text",
        StreamWinnowIndex.K, StreamWinnowIndex.W)
      .join(evalFps, "fp")
      .select(col("doc_id")).distinct()
    docs
      .select(col("doc_id"),
        (size(TextAnalysis.tokens(col("text"))) >= MinTokens)
          .as("qb"))
      .join(dupIds.withColumn("db", lit(true)), Seq("doc_id"), "left")
      .join(deconIds.withColumn("cb", lit(true)), Seq("doc_id"),
        "left")
      .select(col("doc_id"),
        col("qb").cast("long").as("q_ok"),
        coalesce(col("db"), lit(false)).cast("long").as("is_dup"),
        coalesce(col("cb"), lit(false)).cast("long").as("is_decon"),
        (col("qb") && !coalesce(col("db"), lit(false)) &&
          !coalesce(col("cb"), lit(false))).cast("long")
          .as("accepted"))
  }

  /** [[curateOnArrival]] behind the [[graft.ops.ArtifactStore]]: the
    * audit frame is a deterministic function of the corpus (integer
    * gates, hash-keyed dedup/decon), and BOTH q400 and q406 need
    * exactly it — the first of the two in a sweep drives its arrival
    * lifecycle and commits the frame, the second reads parquet instead
    * of re-driving an identical lifecycle against its own store dirs.
    * No artifact root → the inline lifecycle, the spec shape. */
  private def curateAudit(s: SparkSession, dir: String,
                          dedupStore: String,
                          evalStore: String): DataFrame =
    if (graft.ops.ArtifactStore.root(s).isEmpty)
      curateOnArrival(s, dir, dedupStore, evalStore)
    else graft.ops.ArtifactStore.buildOrServe(s, "curate_audit",
      graft.ops.ArtifactStore.fingerprint(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        s"$dir#documents#id_text"),
      s"nb=$NB,r=$R,minTok=$MinTokens", s"$dir#documents#curate")(
      curateOnArrival(s, dir, dedupStore, evalStore))

  /** The gate CTEs — ONE copy for the q400 and q406 oracles: winnow
    * index tables (t/g/f), cross-slice dup pairs, eval fingerprints,
    * decon ids. Everything derives from the raw corpus. */
  private val gateCtesSql: String =
    s"""${PipelineQueries4.winnowIndexCtesSql},
       |sh AS (
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
       |    len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))
       |      AS uni
       |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
       |    AND (a.doc_id % 3) != (b.doc_id % 3)),
       |dup AS (SELECT DISTINCT
       |    CASE WHEN doc_a % 3 > doc_b % 3 THEN doc_a
       |      ELSE doc_b END AS doc_id
       |  FROM p WHERE inter::DOUBLE / uni >= 0.8),
       |ev AS (SELECT DISTINCT fp FROM f WHERE doc_id % 10 = 7),
       |dec AS (SELECT DISTINCT f.doc_id FROM f
       |  JOIN ev USING (fp))""".stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q400_curate_on_arrival",
      (s, dir) => curateAudit(s, dir,
        new java.io.File("target/curate_arrival_minhash").getAbsolutePath,
        new java.io.File("target/curate_arrival_winnow").getAbsolutePath),
      Some(s"""WITH $gateCtesSql
              |SELECT t.doc_id,
              |  CAST(len(t.toks) >= $MinTokens AS BIGINT) AS q_ok,
              |  CAST(t.doc_id IN (SELECT doc_id FROM dup) AS BIGINT)
              |    AS is_dup,
              |  CAST(t.doc_id IN (SELECT doc_id FROM dec) AS BIGINT)
              |    AS is_decon,
              |  CAST(len(t.toks) >= $MinTokens
              |    AND t.doc_id NOT IN (SELECT doc_id FROM dup)
              |    AND t.doc_id NOT IN (SELECT doc_id FROM dec)
              |    AS BIGINT) AS accepted
              |FROM t""".stripMargin)),

    QDef("q406_curate_shard_manifest",
      (s, dir) => {
        val audit = curateAudit(s, dir,
          new java.io.File("target/chain_minhash").getAbsolutePath,
          new java.io.File("target/chain_winnow").getAbsolutePath)
        val accepted = audit.filter(col("accepted") === 1L)
          .select(col("doc_id"))
        // q97's token-balanced assignment over the ACCEPTED set (same
        // code path, left-semi restriction), with q122's manifest
        // hash riding the assignment's own scan
        graft.ops.ShardAssign
          .tokenBalanced(
            Tables.documents(s, dir).join(accepted, Seq("doc_id"),
              "left_semi"),
            nShards = 16,
            extra = Seq("h60" -> Sketches.hash60(col("text"))))
          .groupBy("shard_id")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            expr("bit_xor(h60)").as("checksum"))
          .select(col("shard_id"), col("n_docs"), col("n_tokens"),
            col("checksum"))
      },
      Some(s"""WITH $gateCtesSql,
              |acc AS (SELECT t.doc_id FROM t
              |  WHERE len(t.toks) >= $MinTokens
              |    AND t.doc_id NOT IN (SELECT doc_id FROM dup)
              |    AND t.doc_id NOT IN (SELECT doc_id FROM dec)),
              |st AS (SELECT d.doc_id,
              |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
              |  ${tokenHashSql.replace("__T__",
                   "'shard:' || CAST(d.doc_id AS VARCHAR)")} AS h,
              |  cast('0x' || substr(md5(text), 1, 15) as bigint) AS h60
              |  FROM documents d JOIN acc USING (doc_id)),
              |tot AS (SELECT sum(n_tokens) AS total FROM st),
              |c AS (SELECT doc_id, n_tokens, h60,
              |  coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              |    AS prev_tokens
              |  FROM st),
              |a AS (SELECT n_tokens, h60,
              |  prev_tokens // greatest(tot.total // 16, 1) AS shard_id
              |  FROM c CROSS JOIN tot)
              |SELECT CAST(shard_id AS BIGINT) AS shard_id,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
              |  CAST(bit_xor(h60) AS BIGINT) AS checksum
              |FROM a GROUP BY shard_id""".stripMargin)))
}
