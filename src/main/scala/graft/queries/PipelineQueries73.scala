package graft.queries

import graft.Tables
import graft.functions.TextAnalysis.tokens
import graft.ops.{ArtifactStore, TopK, VectorSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-third pipeline group — delta-rebuild artifacts and
  * multi-probe ANN.
  *
  *  - q375: DELTA-maintained per-source token-count artifact — the r14
  *    step past write-time fingerprints: once staleness is known per
  *    part ([[graft.ops.ArtifactStore.readFpParts]]), rebuild should be
  *    per part too ([[graft.ops.ArtifactStore.buildOrServeParts]]).
  *    The query drives the lifecycle end to end: build the
  *    (source, token) counts artifact in 4 source-bucket parts, then
  *    APPEND a deterministic batch to exactly one source (the min —
  *    the corpus change), update the part map in O(delta) — the sum
  *    fingerprint COMPOSES, so the touched bucket's identity is
  *    old ⊕ partFingerprint(appended rows); no second corpus scan
  *    (a managed store's sidecars make even the first scan free) —
  *    and serve: only the touched bucket rebuilds, every other
  *    part serves its first build
  *    (ArtifactStoreSpec pins the one-part-rebuild count; this query
  *    pins that the SERVED union equals the recomputed truth). The
  *    same decomposition instinct as the reference's per-block ledger
  *    folds (src/be_db_follower.erl): never recompute the world to
  *    absorb a delta. Top-5 tokens per source ranked by the
  *    bounded-state [[graft.ops.TopK.perGroup]] (O(k) fold buffers —
  *    vocab-sized groups never materialize in one buffer).
  *
  *  - q377: sidecar-addressed per-shard artifact over the REAL
  *    [[graft.ops.ShardWriter]] sink — the managed-store end of the
  *    delta protocol. q375 derives its part map with a grouped scan
  *    (the raw-parquet fallback); here the sink already recorded each
  *    shard's content identity at write time (`shards/_fp/`), so the
  *    per-shard stats artifact addresses, staleness-checks, AND
  *    rebuilds with ZERO corpus scans — `readFpParts` is an O(#shards)
  *    metadata read and each `buildPart` touches one shard directory.
  *    The oracle recomputes the stats from the same shard files
  *    (read_parquet + hive partitioning), auditing store and artifact
  *    together.
  *
  *  - q376: MULTI-PROBE sign-LSH ANN (Lv et al., VLDB 2007) — q31's
  *    index, better recall, zero extra storage: the corpus still
  *    writes ONE key per band; only the query fans out, probing each
  *    band's base bucket plus the buckets reached by flipping its two
  *    lowest-|margin| bits (the bits a true neighbor most likely
  *    disagrees on). At 100 TB this is the right trade: extra probes
  *    cost broadcast-join lookups, extra tables cost another corpus
  *    copy. The candidate set is a SUPERSET of q31's by construction
  *    (base keys included — Pipeline73Spec pins it); the oracle
  *    replays margin sort, bit flips, probe join, and exact re-rank
  *    literally in SQL (the q31 hyperplane formula, one level up).
  */
/** Shared DuckDB fragments for the sign-LSH oracle family (q31's
  * hyperplane formula + the multi-probe margin machinery) — used by
  * q376's exact replay and q379's recall curve. */
private[queries] object LshSql {

  def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)

  def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  /** SIGNED projection of v onto hyperplane p — the md5-derived plane
    * formula shared with q31 (and with
    * [[graft.ops.VectorSearch.planeVector]], bit-identically). */
  def projSql(v: String, p: Int): String = VectorOracleSql.proj(v, p)

  def baseKeySql(v: String, band: Int, bits: Int): String =
    (0 until bits).map(i =>
      s"(CASE WHEN ${projSql(v, band * bits + i)} > 0 " +
        s"THEN ${1 << i} ELSE 0 END)")
      .mkString("(", " + ", ")")

  /** The band's probe list — base key + the `nFlips` lowest-|margin|
    * single-bit flips, exactly [[graft.ops.VectorSearch
    * .multiProbeKeys]]'s arithmetic. */
  def probeListSql(v: String, band: Int, bits: Int,
                   nFlips: Int = 2): String = {
    val base = s"CAST(${baseKeySql(v, band, bits)} AS BIGINT)"
    val margins = (0 until bits)
      .map(i => s"{'a': abs(${projSql(v, band * bits + i)}), 'i': $i}")
      .mkString("list_sort([", ", ", "])")
    val flips = (1 to nFlips).map(j =>
      s"xor($base, 1::BIGINT << ($margins)[$j].i)")
    (base +: flips).mkString("[", ", ", "]")
  }

  /** q376's full oracle — multi-probe candidate join + exact-cosine
    * re-rank top-5. Also the contract for the MAINTAINED-index serve
    * (q386): however the corpus index is stored, the multi-probe
    * answer must equal this single-shot replay. */
  lazy val multiProbeTop5Sql: String = {
    val bandKeys = (0 until 4).map(b =>
      s"CAST(${baseKeySql("v", b, 4)} AS BIGINT) AS k$b")
      .mkString(", ")
    val ek = (0 until 4).map(b =>
      s"SELECT vec_id, $b AS band, k$b AS key FROM e WHERE vec_id <> 0")
      .mkString("\n  UNION ALL ")
    val qk = (0 until 4).map(b =>
      s"SELECT $b AS band, unnest(${probeListSql("q.v", b, 4)}) AS key FROM q")
      .mkString("\n  UNION ALL ")
    s"""WITH e AS (
       |  SELECT vec_id, v, $bandKeys FROM (
       |    SELECT vec_id, $vSql AS v FROM embeddings) t),
       |q AS (SELECT * FROM e WHERE vec_id = 0),
       |qk AS (
       |  $qk),
       |ek AS (
       |  $ek),
       |cand AS (
       |  SELECT DISTINCT ek.vec_id FROM ek JOIN qk USING (band, key)),
       |s AS (SELECT c.vec_id, round(${cosSql("e.v", "q.v")}, 6) AS sim
       |      FROM cand c JOIN e ON e.vec_id = c.vec_id, q)
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM s ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin
  }
}

object PipelineQueries73 {
  import LshSql._

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** q377's late-bound oracle (embeds the shard-store path). */
  private object ShardStatsOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q375_delta_token_counts",
      (s, dir) => {
        // dedicated root (the q371 rule): wiped first so the lifecycle
        // is deterministic under Verify, Bench, and bare specs alike
        val deltaRoot = new java.io.File(
          "target/artifacts_delta").getAbsolutePath
        graft.ops.Fs.wipe(deltaRoot)
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        val served =
          try {
            s.conf.set(ArtifactStore.RootConf, deltaRoot)
            val docs = Tables.documents(s, dir)
              .select(col("doc_id"), col("text"), col("source"))
            val key = s"$dir#documents#delta"
            // part = source-hash bucket (house md5 — 4 buckets bound
            // the per-sweep build count; at 100 TB the part grain is
            // the store's physical partition, not the logical source)
            def bucketOf = pmod(
              graft.functions.TextAnalysis.tokenHash(col("source")),
              lit(4))
            // (bucket → (sum, count)), ONE grouped scan — a managed
            // store answers this from `_fp` sidecars instead (q377 is
            // that end of the protocol)
            val rawParts = ArtifactStore.partFingerprints(
              docs.withColumn("bucket", bucketOf), "bucket")
            def fold(ps: Seq[(String, (BigInt, Long))])
                : Seq[(String, String)] =
              ps.map { case (pid, fp) =>
                pid.stripPrefix("bucket=") ->
                  ArtifactStore.combineParts(Seq(fp)) }
            // the decomposable build: counts over ONE bucket's slice
            // (filter pushed to the scan; on a bucket-partitioned
            // store this is partition pruning)
            def counts(df: DataFrame)(bkt: String): DataFrame =
              df.where(bucketOf === bkt.toInt)
                .select(col("source"),
                  explode(tokens(col("text"))).as("token"))
                .groupBy("source", "token")
                .agg(count(lit(1)).as("n"))
            // initial state: every part builds once
            ArtifactStore.buildOrServeParts(s, "delta_tokcounts",
              fold(rawParts), "tok=v1", key)(counts(docs))
            // the corpus change: the min source's docs arrive again
            // (deterministic append); ONLY that part's address moves —
            // and the NEW part map costs O(delta), not a second corpus
            // scan: the sum fingerprint COMPOSES, so the touched
            // bucket's (sum, count) is old ⊕ partFingerprint(appended)
            val minSrc = docs.agg(min("source")).head().getString(0)
            val appended = docs.where(col("source") === minSrc)
            val docs2 = docs.unionByName(appended)
            val touched = (graft.functions.TextAnalysis
              .md5Hex8(minSrc) % 4).toString
            val appFp = ArtifactStore.partFingerprint(
              appended.withColumn("bucket", bucketOf))
            val rawParts2 = rawParts.map { case (pid, fp) =>
              if (pid.stripPrefix("bucket=") == touched)
                pid -> (fp._1 + appFp._1, fp._2 + appFp._2)
              else pid -> fp
            }
            ArtifactStore.buildOrServeParts(s, "delta_tokcounts",
              fold(rawParts2), "tok=v1", key)(counts(docs2))
          } finally prev match {
            case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
            case None => s.conf.unset(ArtifactStore.RootConf)
          }
        TopK.perGroup(served, "source",
            struct((-col("n")).as("nn"), col("token")), 5)
          .select(col("source"), col("key.token").as("token"),
            (-col("key.nn")).as("n"), (col("rank") + 1).as("rk"))
      },
      Some(s"""WITH d AS (
              |  SELECT source, text FROM documents
              |  UNION ALL
              |  SELECT source, text FROM documents
              |  WHERE source = (SELECT min(source) FROM documents)),
              |t AS (SELECT source, unnest($toksSql) AS token FROM d),
              |c AS (SELECT source, token, count(*) AS n
              |      FROM t GROUP BY 1, 2),
              |r AS (SELECT source, token, n, row_number() OVER (
              |        PARTITION BY source ORDER BY n DESC, token) AS rk
              |      FROM c)
              |SELECT source, token, CAST(n AS BIGINT) AS n,
              |  CAST(rk AS BIGINT) AS rk
              |FROM r WHERE rk <= 5""".stripMargin)),

    QDef("q377_shard_delta_stats",
      (s, dir) => {
        val out = new java.io.File("target/shards_delta").getAbsolutePath
        graft.ops.Fs.wipe(out)
        graft.ops.ShardWriter.write(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          nShards = 8, out)
        ShardStatsOracle.sql = Some(
          s"""WITH sh AS (
             |  SELECT CAST(shard_id AS BIGINT) AS shard_id, text
             |  FROM read_parquet('$out/shards/*/*.parquet',
             |                    hive_partitioning = true)),
             |base AS (
             |  SELECT shard_id, count(*) AS n_docs,
             |    CAST(sum(len($toksSql)) AS BIGINT) AS total_tokens
             |  FROM sh GROUP BY 1),
             |dt AS (
             |  SELECT shard_id, CAST(count(DISTINCT token) AS BIGINT)
             |    AS n_distinct_tokens
             |  FROM (SELECT shard_id, unnest($toksSql) AS token FROM sh) t
             |  GROUP BY 1)
             |SELECT shard_id, n_docs, total_tokens, n_distinct_tokens
             |FROM base JOIN dt USING (shard_id)""".stripMargin)
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        try {
          s.conf.set(ArtifactStore.RootConf,
            new java.io.File("target/artifacts_delta_sh").getAbsolutePath)
          // the part map comes from the sink's write-time sidecars —
          // an O(#shards) metadata read, NO data scan anywhere in the
          // staleness path
          val parts = ArtifactStore.readFpParts(s"$out/shards").map {
            case (pid, fp) => pid -> ArtifactStore.combineParts(Seq(fp))
          }
          ArtifactStore.buildOrServeParts(s, "shard_stats", parts,
            "stats=v1", s"$out#shards") { pid =>
            // ONE pass over the shard directory (basePath keeps the
            // partition column visible): explode_outer keeps zero-token
            // docs in the doc count, count(token) counts only real
            // tokens, countDistinct(token) ignores the null
            s.read.option("basePath", s"$out/shards")
              .parquet(s"$out/shards/$pid")
              .select(col("shard_id").cast("long").as("shard_id"),
                col("doc_id"),
                explode_outer(tokens(col("text"))).as("token"))
              .groupBy("shard_id")
              .agg(countDistinct(col("doc_id")).as("n_docs"),
                count(col("token")).as("total_tokens"),
                countDistinct(col("token")).as("n_distinct_tokens"))
          }
        } finally prev match {
          case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
          case None => s.conf.unset(ArtifactStore.RootConf)
        }
      },
      None,
      Some(() => ShardStatsOracle.sql)),

    QDef("q376_ann_lsh_multiprobe",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val e = emb.select(col("vec_id"),
          VectorSearch.toDouble(col("embedding")).as("v"))
        // corpus side: UNCHANGED q31 index — one key per band
        val buckets = VectorSearch.lshCandidates(emb, "vec_id",
          "embedding", bands = 4, bitsPerBand = 4, dims = 64)
        // query side: base + 2 lowest-margin flips per band = 12 probes
        val qProbe = e.filter(col("vec_id") === 0)
          .select(explode(VectorSearch.multiProbeKeys(col("v"),
            bands = 4, bitsPerBand = 4, dims = 64, extraProbes = 2))
            .as("pk"))
          .select(col("pk.band").as("band"),
            col("pk.key").cast("long").as("key"))
        val candIds = buckets.filter(col("id") =!= 0)
          .withColumn("key", col("key").cast("long"))
          .join(broadcast(qProbe), Seq("band", "key"))
          .select(col("id").as("vec_id")).distinct()
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        candIds.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(VectorSearch.cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some(multiProbeTop5Sql))
  )
}
