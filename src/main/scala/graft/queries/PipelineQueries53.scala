package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-third pipeline group — survey-sampling design and lakehouse
  * maintenance planning:
  *
  *  - q321: Neyman optimal stratified allocation. Proportional
  *    sampling allocates a fixed label/QA budget by stratum SIZE;
  *    Neyman (1934) allocation ∝ N_h·S_h is the variance-minimizing
  *    split, and the two disagree exactly where strata differ in
  *    spread. The algebra collapses nicely in integers:
  *    N_h·S_h = √(N_h·Σx² − (Σx)²) — ONE mirrored IEEE sqrt per
  *    stratum over an exact integer radicand (the q146/q176 rule:
  *    integer moments, one mirrored libm call, floor to long).
  *    Output compares both allocations of a 1000-unit budget.
  *  - q322: shard compaction plan. Small-file proliferation is THE
  *    operational lakehouse disease; the planner groups consecutive
  *    shards into merge groups of ~total/8 bytes via a cumulative
  *    quota (group = exclusive-prefix-bytes div target) — one window
  *    over the ≤32 shard rows, deterministic, and trivially
  *    replayable. Consecutive (not first-fit) grouping is the
  *    practical choice: it preserves shard-id range locality, so a
  *    merge touches adjacent id ranges only (the q286 Z-order
  *    argument).
  */
object PipelineQueries53 {

  private val NShards = 32

  val defs: Seq[QDef] = Seq(

    QDef("q321_neyman_allocation",
      (s, dir) => {
        val st = Tables.documents(s, dir)
          .groupBy("lang")
          .agg(count(lit(1)).as("nh"),
            sum("n_chars").as("sx"),
            sum(col("n_chars") * col("n_chars")).as("sxx"))
          .withColumn("w",
            floor(sqrt((col("nh") * col("sxx") -
              col("sx") * col("sx")).cast("double"))).cast("long"))
        val tot = st.agg(sum("nh").as("nn"), sum("w").as("ww"))
        st.crossJoin(broadcast(tot))
          .select(col("lang"), col("nh").as("n_docs"),
            col("w").as("nh_sh_scaled"),
            expr("nh * 1000L div nn").as("prop_alloc"),
            expr("w * 1000L div ww").as("neyman_alloc"))
      },
      Some("""WITH st AS (SELECT lang,
             |    CAST(count(*) AS BIGINT) AS nh,
             |    CAST(sum(n_chars) AS BIGINT) AS sx,
             |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
             |  FROM documents GROUP BY 1),
             |w AS (SELECT lang, nh,
             |    CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE)))
             |      AS BIGINT) AS w
             |  FROM st),
             |t AS (SELECT CAST(sum(nh) AS BIGINT) AS nn,
             |    CAST(sum(w) AS BIGINT) AS ww FROM w)
             |SELECT lang, nh AS n_docs, w AS nh_sh_scaled,
             |  nh * 1000 // nn AS prop_alloc,
             |  w * 1000 // ww AS neyman_alloc
             |FROM w, t""".stripMargin)),

    QDef("q322_compaction_plan",
      (s, dir) => {
        val shards = Tables.documents(s, dir)
          .select(pmod(graft.functions.TextAnalysis.tokenHash(
            concat(lit("cp:"), col("doc_id").cast("string"))),
            lit(NShards.toLong)).as("shard"),
            col("n_chars"))
          .groupBy("shard")
          .agg(sum("n_chars").as("bytes"), count(lit(1)).as("n_docs"))
        val total = shards.agg(sum("bytes").as("tb"))
        val w = Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)
        // ≤ NShards rows: the global window frame is bounded.
        val planned = shards.crossJoin(broadcast(total))
          .withColumn("cumx", coalesce(sum("bytes").over(w), lit(0L)))
          .withColumn("grp",
            expr("cumx div greatest(1L, tb div 8)"))
        val groups = planned.groupBy("grp")
          .agg(sum("bytes").as("grp_bytes"),
            count(lit(1)).as("n_merged"))
        planned.join(groups, "grp")
          .select(col("shard"), col("bytes"), col("n_docs"),
            col("grp").as("merge_group"), col("grp_bytes"),
            col("n_merged"))
      },
      Some(s"""WITH sh AS (SELECT
              |    CAST('0x' || substr(md5('cp:' ||
              |      CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              |      % $NShards AS shard,
              |    n_chars
              |  FROM documents),
              |ag AS (SELECT shard, CAST(sum(n_chars) AS BIGINT)
              |      AS bytes,
              |    CAST(count(*) AS BIGINT) AS n_docs
              |  FROM sh GROUP BY 1),
              |t AS (SELECT CAST(sum(bytes) AS BIGINT) AS tb FROM ag),
              |pl AS (SELECT shard, bytes, n_docs,
              |    coalesce(CAST(sum(bytes) OVER (ORDER BY shard
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              |      AS BIGINT), 0) AS cumx, tb
              |  FROM ag, t),
              |pg AS (SELECT shard, bytes, n_docs,
              |    cumx // greatest(1, tb // 8) AS grp
              |  FROM pl),
              |gr AS (SELECT grp, CAST(sum(bytes) AS BIGINT)
              |      AS grp_bytes,
              |    CAST(count(*) AS BIGINT) AS n_merged
              |  FROM pg GROUP BY 1)
              |SELECT shard, bytes, n_docs, grp AS merge_group,
              |  grp_bytes, n_merged
              |FROM pg JOIN gr USING (grp)""".stripMargin))
  )
}
