package graft.queries

import graft.Tables
import graft.ops.ArtifactStore
import org.apache.spark.sql.functions._

/** Seventy-second pipeline group — artifact-store governance (r13
  * verdict frontier (a)): the write-once artifact layer gained
  * build/serve/rebuild/vacuum mechanics in r13; this group makes the
  * store's state OBSERVABLE as a queryable table, the way the
  * reference surfaces its operational state as inspectable rows
  * (migrations/1594860323-stats.sql materializes follower progress as
  * a stats table rather than burying it in process state).
  *
  *  - q371: live-artifact inventory — the retention audit. Drives a
  *    deterministic lifecycle against a dedicated governance root
  *    (build → serve-hit → params variant → corpus-change rebuild
  *    that VACUUMS the superseded fingerprint → second artifact
  *    name), then reads the store's own `manifest.json` commit
  *    records back as a DataFrame. What the audit proves queryable:
  *    exactly one live fingerprint per (name, source, params) scope,
  *    the superseded corpus absent (vacuumed), coexisting params
  *    variants and artifact names present. The ORACLE reads the SAME
  *    manifest files with DuckDB's `read_json_auto` — the two
  *    engines audit the store independently, sharing only the files
  *    on disk (late-bound SQL: the root path is embedded at run
  *    time).
  */
object PipelineQueries72 {

  /** q371's late-bound oracle (embeds the governance-root path). */
  private object GovOracle { @volatile var sql: Option[String] = None }

  val defs: Seq[QDef] = Seq(

    QDef("q371_artifact_inventory",
      (s, dir) => {
        // dedicated governance root: the shared sweep root's contents
        // depend on which queries ran before this one, so the audit
        // drives its OWN deterministic lifecycle (wiped first —
        // repeatable under Verify, Bench, and bare specs alike)
        val govRoot = new java.io.File(
          "target/artifacts_gov").getAbsolutePath
        graft.ops.Fs.wipe(govRoot)
        val prev = s.conf.getOption(ArtifactStore.RootConf)
        try {
          s.conf.set(ArtifactStore.RootConf, govRoot)
          val nat = Tables.nation(s, dir)
            .select(col("n_nationkey"), col("n_name"))
          val key = s"$dir#nation#gov"
          val fpA = ArtifactStore.fingerprint(nat, s"$key#a")
          // build; serve-hit (same address — must not rebuild);
          // params variant (new scope, coexists)
          ArtifactStore.buildOrServe(s, "gov_demo", fpA, "p=1", key)(nat)
          ArtifactStore.buildOrServe(s, "gov_demo", fpA, "p=1", key)(nat)
          ArtifactStore.buildOrServe(s, "gov_demo", fpA, "p=2", key)(nat)
          // corpus change: new fingerprint rebuilds and VACUUMS the
          // superseded fpA within the (name, source, p=1) scope
          val nat2 = nat.filter(col("n_nationkey") =!= 0)
          val fpB = ArtifactStore.fingerprint(nat2, s"$key#b")
          ArtifactStore.buildOrServe(s, "gov_demo", fpB, "p=1", key)(nat2)
          // a second artifact name shares the root untouched
          ArtifactStore.buildOrServe(s, "gov_demo2", fpA, "p=1", key)(nat)
        } finally prev match {
          case Some(r) => s.conf.set(ArtifactStore.RootConf, r)
          case None => s.conf.unset(ArtifactStore.RootConf)
        }
        GovOracle.sql = Some(
          s"""SELECT name, params, fingerprint,
             |  count(*) OVER (PARTITION BY name) AS n_live
             |FROM read_json_auto(
             |  '$govRoot/*/*/*/manifest.json')""".stripMargin)
        // the engine-side audit: the store's commit records ARE rows
        s.read
          .schema("name STRING, fingerprint STRING, params STRING, " +
            "payload STRING")
          .json(s"$govRoot/*/*/*/manifest.json")
          .select(col("name"), col("params"), col("fingerprint"),
            count(lit(1)).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("name"))).as("n_live"))
      },
      None,
      Some(() => GovOracle.sql)),

    // q373: shard-store fingerprint audit — the managed-store
    // protocol's governance twin (q371 audits the artifact root; this
    // audits a SINK's write-time content identity). ShardWriter
    // commits per-shard `_fp` sidecars alongside its manifest; a
    // reader deciding whether a downstream artifact is stale trusts
    // the sidecars INSTEAD of re-scanning the shards — so the audit
    // that cross-checks sidecar row counts against the independently
    // aggregated manifest (and both against each other per shard) is
    // the integrity gate of the whole O(#shards) staleness path. Both
    // engines read the same files: Spark joins the manifest parquet
    // to the sidecar JSON; DuckDB replays with read_parquet +
    // read_json_auto.
    QDef("q373_shard_fp_audit",
      (s, dir) => {
        val out = new java.io.File("target/shards_gov").getAbsolutePath
        graft.ops.Fs.wipe(out)
        graft.ops.ShardWriter.write(
          Tables.documents(s, dir).select(col("doc_id"), col("text")),
          nShards = 8, out)
        ShardFpOracle.sql = Some(
          s"""WITH m AS (SELECT shard_id, n_docs
             |  FROM read_parquet('$out/manifest/*.parquet')),
             |f AS (SELECT CAST(replace(part, 'shard_id=', '')
             |    AS BIGINT) AS shard_id, n AS sidecar_n
             |  FROM read_json_auto('$out/shards/_fp/*.json'))
             |SELECT m.shard_id, m.n_docs, f.sidecar_n,
             |  m.n_docs = f.sidecar_n AS agree
             |FROM m JOIN f USING (shard_id)""".stripMargin)
        val manifest = s.read.parquet(s"$out/manifest")
        val fp = s.read.schema("part STRING, sum STRING, n LONG")
          .json(s"$out/shards/_fp/*.json")
          .select(regexp_replace(col("part"), "shard_id=", "")
            .cast("long").as("shard_id"), col("n").as("sidecar_n"))
        manifest.select(col("shard_id"), col("n_docs"))
          .join(fp, "shard_id")
          .select(col("shard_id"), col("n_docs"), col("sidecar_n"),
            (col("n_docs") === col("sidecar_n")).as("agree"))
      },
      None,
      Some(() => ShardFpOracle.sql))
  )

  /** q373's late-bound oracle (embeds the shard-store path). */
  private object ShardFpOracle { @volatile var sql: Option[String] = None }
}
