package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private[graft] val allDefs: Seq[QDef] =
    Relational.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      DomainQueries.defs ++ DomainQueries2.defs ++ DomainQueries3.defs ++
      DomainQueries4.defs ++ MediaQueries.defs ++ PipelineQueries.defs ++
      PipelineQueries2.defs ++ PipelineQueries3.defs ++
      PipelineQueries4.defs ++ PipelineQueries5.defs ++
      PipelineQueries6.defs ++ PipelineQueries7.defs ++
      PipelineQueries8.defs ++ PipelineQueries9.defs ++
      PipelineQueries10.defs ++ PipelineQueries11.defs ++
      PipelineQueries12.defs ++ PipelineQueries13.defs ++
      PipelineQueries14.defs ++ PipelineQueries15.defs ++
      PipelineQueries16.defs ++ PipelineQueries17.defs ++
      PipelineQueries18.defs ++ PipelineQueries19.defs ++
      PipelineQueries20.defs ++ PipelineQueries21.defs ++
      PipelineQueries22.defs ++ PipelineQueries23.defs ++
      PipelineQueries24.defs ++ PipelineQueries25.defs ++
      PipelineQueries26.defs ++ PipelineQueries27.defs ++
      PipelineQueries28.defs ++ PipelineQueries29.defs ++
      PipelineQueries30.defs ++ PipelineQueries31.defs ++
      PipelineQueries32.defs ++ PipelineQueries33.defs ++
      PipelineQueries34.defs ++ PipelineQueries35.defs ++
      PipelineQueries36.defs ++ PipelineQueries37.defs ++
      PipelineQueries38.defs ++ PipelineQueries39.defs ++
      PipelineQueries40.defs ++ PipelineQueries41.defs ++ PipelineQueries42.defs ++
      PipelineQueries43.defs ++ PipelineQueries44.defs ++
      PipelineQueries45.defs ++ PipelineQueries46.defs ++
      PipelineQueries47.defs ++ PipelineQueries48.defs ++
      PipelineQueries49.defs ++ PipelineQueries50.defs ++
      PipelineQueries51.defs ++ PipelineQueries52.defs ++
      PipelineQueries53.defs ++ PipelineQueries54.defs ++
      PipelineQueries55.defs ++ PipelineQueries56.defs ++
      PipelineQueries57.defs ++ PipelineQueries58.defs ++
      PipelineQueries59.defs ++ PipelineQueries60.defs ++
      PipelineQueries61.defs ++ PipelineQueries62.defs ++
      PipelineQueries63.defs ++ PipelineQueries64.defs ++
      PipelineQueries65.defs ++ PipelineQueries66.defs ++
      PipelineQueries67.defs ++ PipelineQueries68.defs ++
      PipelineQueries69.defs ++ PipelineQueries70.defs ++
      PipelineQueries71.defs ++ PipelineQueries72.defs ++
      PipelineQueries73.defs ++ PipelineQueries74.defs ++
      PipelineQueries75.defs ++ PipelineQueries76.defs ++
      PipelineQueries77.defs ++ PipelineQueries78.defs ++
      PipelineQueries79.defs ++ PipelineQueries80.defs ++
      PipelineQueries81.defs ++ PipelineQueries82.defs ++
      PipelineQueries83.defs ++
      VectorQueries2.defs

  private val qMap = allDefs.map(d => d.name -> d.fn).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qMap("q1_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = qMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * Resolved at call time so late-bound oracles (q30's run-computed
    * centroid literals) are visible — Verify dumps this AFTER running
    * the queries. */
  def oracleSql: Map[String, String] = QDef.oracleMap(allDefs)

  /** Queries whose ANSWER passes through a cardinality gate or salt
    * cap — the capped-verify lane (r13 verdict #3, the q145 lesson
    * generalized): the sf0.01 oracle gate cannot see a recall change
    * that only binds above a cap, so these re-verify at sf0.1 with
    * the caps FORCED TO BIND via conf (`scripts/verify_capped.sh`:
    * `spark.graft.nsw.blockCap=32`,
    * `spark.graft.neardup.exactMaxRows=500`) and the oracle replaying
    * the bound cap literally (the q361 pattern). Verify expands the
    * filter token `@capped` to this list. */
  val cappedQueries: Seq[String] = Seq(
    "q29_embed_neardup",        // neardup exact-pairs gate
    "q79_embed_clusters",       //   (cell-bounded reroute above it)
    "q145_session_copresence",  // blocked interval overlap (exact op)
    "q361_copresence_sampled",  // salt-capped sampling, replayed
    "q257_ann_nsw",             // NSW blockCap family: the salt
    "q259_ann_nsw_batch",       //   binds and the oracle replays it
    "q358_ann_nsw_served",
    "q392_ann_nsw_seeded",       //   (seeded entries walk the same
    "q362_ann_hnsw",             //    capped graph)
    "q372_ann_nsw_pq_served",   //   (the PQ-served traversal too —
    "q335_dbscan_clusters",     //    its beam walks the capped graph)
    "q359_dbscan_served")
}
