package graft.queries

import graft.Tables
import graft.ops.{ArtifactStore, VectorSearch}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seventy-fourth pipeline group — governance and measurement for the
  * round's two new mechanisms.
  *
  *  - q378: part-manifest inventory — q371's retention audit extended
  *    to the PART-ADDRESSED layout ([[graft.ops.ArtifactStore
  *    .buildOrServeParts]]). Drives the full part lifecycle against a
  *    dedicated root (build 5 region parts → serve-hit → one-part
  *    corpus change that re-addresses ONE part and vacuums its
  *    superseded fingerprint → a change that both rebuilds a part and
  *    REMOVES another from the part set, proving the departed-part
  *    vacuum), then reads the per-part `manifest.json` commit records
  *    back as rows. The oracle reads the SAME files via DuckDB's
  *    read_json_auto — two engines audit the store independently. What
  *    the rows prove queryable: exactly one live fingerprint per
  *    partId, the departed part absent, rebuilt parts carrying their
  *    new content address.
  *
  *  - q379: multi-probe recall curve — the MEASUREMENT leg of q376
  *    (the q206/q236 instinct: a knob you cannot measure is a knob you
  *    cannot set). For probes = base, base+1 flip, base+2 flips per
  *    band: candidate-pool size and candidate recall against the exact
  *    cosine top-10 — the curve an operator reads before spending
  *    probe budget at 100 TB (each probe is one more broadcast-join
  *    lookup; the index never grows). Oracle replays every regime
  *    literally: the T-flip probe lists, the bucket joins, and the
  *    exact top-10, all from the shared q31 hyperplane formulas.
  */
object PipelineQueries74 {
  import LshSql._

  /** q378's late-bound oracle (embeds the governance-root path). */
  private object PartsGovOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q378_artifact_parts_inventory",
      (s, dir) => {
        val govRoot = new java.io.File(
          "target/artifacts_gov_parts").getAbsolutePath
        graft.ops.Fs.wipe(govRoot)
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        try {
          s.conf.set(ArtifactStore.RootConf, govRoot)
          val nat = Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
          val key = s"$dir#nation#govparts"
          def partsOf(df: DataFrame): Seq[(String, String)] =
            ArtifactStore.partFingerprints(df, "n_regionkey").map {
              case (pid, fp) => pid.stripPrefix("n_regionkey=") ->
                ArtifactStore.combineParts(Seq(fp))
            }
          def build(df: DataFrame)(pid: String): DataFrame =
            df.where(col("n_regionkey") === pid.toInt)
          // 1. initial build: one part per region; 2. serve-hit (same
          // addresses — must not rebuild)
          ArtifactStore.buildOrServeParts(s, "gov_parts",
            partsOf(nat), "p=1", key)(build(nat))
          ArtifactStore.buildOrServeParts(s, "gov_parts",
            partsOf(nat), "p=1", key)(build(nat))
          // 3. one-part corpus change: region 0 loses nation 0 — ONE
          // part re-addresses, its superseded fingerprint vacuums
          val nat2 = nat.filter(col("n_nationkey") =!= 0)
          ArtifactStore.buildOrServeParts(s, "gov_parts",
            partsOf(nat2), "p=1", key)(build(nat2))
          // 4. rebuild + departure in one step: region 1 changes (the
          // commit) and region 4 leaves the part set (the committing
          // serve vacuums its whole part dir)
          val nat3 = nat2.filter(col("n_nationkey") =!= 1)
            .filter(col("n_regionkey") =!= 4)
          ArtifactStore.buildOrServeParts(s, "gov_parts",
            partsOf(nat3), "p=1", key)(build(nat3))
        } finally prev match {
          case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
          case None => s.conf.unset(ArtifactStore.RootConf)
        }
        PartsGovOracle.sql = Some(
          s"""SELECT name, params, fingerprint,
             |  count(*) OVER (PARTITION BY name) AS n_live
             |FROM read_json_auto(
             |  '$govRoot/*/*/parts/*/*/manifest.json')""".stripMargin)
        s.read
          .schema("name STRING, fingerprint STRING, params STRING, " +
            "payload STRING")
          .json(s"$govRoot/*/*/parts/*/*/manifest.json")
          .select(col("name"), col("params"), col("fingerprint"),
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("name"))).as("n_live"))
      },
      None,
      Some(() => PartsGovOracle.sql)),

    // q380: the streaming count store under an ORACLE — the batch
    // lanes (q375/q377) check the delta-artifact layer; this drives
    // the STREAMING leg's semantics end to end: three interleaved
    // arrival slices + a mid-life compaction (rows merge), and the
    // folded view must still equal the single-shot corpus counts —
    // additivity is what makes an incremental materialized view a
    // view and not an approximation. Output: per-source vocabulary
    // size, token mass, and the top token (ties broken high).
    QDef("q380_stream_counts_audit",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_counts_gov").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), col("text"))
        (0 until 3).foreach { b =>
          graft.streaming.StreamTokenCounts.applyBatch(
            docs.where(pmod(col("doc_id"), lit(3)) === b), b.toLong,
            "source", "text", store)
        }
        // merge-compaction mid-audit: the fold must not notice
        graft.streaming.StreamTokenCounts.compact(s, store)
        graft.streaming.StreamTokenCounts.counts(s, store)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_distinct_tokens"),
            sum(col("n")).as("total_tokens"),
            max_by(col("token"), struct(col("n"), col("token")))
              .as("top_token"))
      },
      Some(s"""WITH t AS (
              |  SELECT source, unnest(
              |    list_filter(string_split(text, ' '), x -> x != ''))
              |    AS token
              |  FROM documents),
              |c AS (SELECT source, token, count(*) AS n
              |      FROM t GROUP BY 1, 2),
              |top AS (SELECT source, token AS top_token, row_number()
              |          OVER (PARTITION BY source
              |                ORDER BY n DESC, token DESC) AS rk
              |        FROM c)
              |SELECT c.source,
              |  CAST(count(*) AS BIGINT) AS n_distinct_tokens,
              |  CAST(sum(n) AS BIGINT) AS total_tokens,
              |  any_value(top.top_token) AS top_token
              |FROM c JOIN top ON c.source = top.source AND top.rk = 1
              |GROUP BY 1""".stripMargin)),

    QDef("q379_multiprobe_recall_curve",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val e = emb.select(col("vec_id"),
          VectorSearch.toDouble(col("embedding")).as("v"))
          .localCheckpoint()
        val buckets = VectorSearch.lshCandidates(emb, "vec_id",
          "embedding", bands = 4, bitsPerBand = 4, dims = 64)
          .localCheckpoint() // probed three times, built once
        val qv = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val exact10 = e.filter(col("vec_id") =!= 0)
          .crossJoin(qv)
          .select(col("vec_id"),
            round(VectorSearch.cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
          .select(col("vec_id"))
          .localCheckpoint()
        val curve = (0 to 2).map { t =>
          val qk = e.filter(col("vec_id") === 0)
            .select(explode(VectorSearch.multiProbeKeys(col("v"),
              bands = 4, bitsPerBand = 4, dims = 64, extraProbes = t))
              .as("pk"))
            .select(col("pk.band").as("band"), col("pk.key").as("key"))
          val cand = buckets.filter(col("id") =!= 0)
            .join(broadcast(qk), Seq("band", "key"))
            .select(col("id")).distinct()
            .localCheckpoint() // counted twice (pool size + hits)
          cand.agg(count(lit(1)).as("n_cand"))
            .crossJoin(cand.join(exact10, cand("id") === exact10("vec_id"))
              .agg(count(lit(1)).as("hits10")))
            .select(lit(t).as("probes"), col("n_cand"), col("hits10"))
        }
        curve.reduce(_.unionByName(_))
      },
      Some {
        val bandKeys = (0 until 4).map(b =>
          s"CAST(${baseKeySql("v", b, 4)} AS BIGINT) AS k$b")
          .mkString(", ")
        val ek = (0 until 4).map(b =>
          s"SELECT vec_id, $b AS band, k$b AS key FROM e WHERE vec_id <> 0")
          .mkString("\n  UNION ALL ")
        def qk(t: Int) = (0 until 4).map(b =>
          s"SELECT $b AS band, " +
            s"unnest(${probeListSql("q.v", b, 4, nFlips = t)}) AS key FROM q")
          .mkString("\n  UNION ALL ")
        val cands = (0 to 2).map(t =>
          s"""qk$t AS (
             |  ${qk(t)}),
             |c$t AS (
             |  SELECT DISTINCT ek.vec_id FROM ek JOIN qk$t USING (band, key))"""
            .stripMargin).mkString(",\n")
        val rows = (0 to 2).map(t =>
          s"""SELECT $t AS probes,
             |  (SELECT count(*) FROM c$t) AS n_cand,
             |  (SELECT count(*) FROM c$t JOIN ex USING (vec_id)) AS hits10"""
            .stripMargin).mkString("\nUNION ALL ")
        s"""WITH e AS (
           |  SELECT vec_id, v, $bandKeys FROM (
           |    SELECT vec_id, $vSql AS v FROM embeddings) t),
           |q AS (SELECT * FROM e WHERE vec_id = 0),
           |ex AS (
           |  SELECT e.vec_id FROM e, q WHERE e.vec_id <> 0
           |  ORDER BY round(${cosSql("e.v", "q.v")}, 6) DESC, e.vec_id ASC
           |  LIMIT 10),
           |ek AS (
           |  $ek),
           |$cands
           |$rows""".stripMargin
      })
  )
}
