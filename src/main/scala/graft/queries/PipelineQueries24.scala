package graft.queries

import graft.Tables
import graft.functions.TextAnalysis.tokenHash
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-fourth pipeline group — classic event-funnel and cohort
  * analytics over the events table:
  *
  *  - q217: ORDERED conversion funnel (view → click → purchase): a
  *    click only counts with a strictly earlier view, a purchase only
  *    with a strictly earlier qualified click. The whole funnel is
  *    TWO running-min window passes over the SAME (user, ts) spec —
  *    Spark plans one exchange + one sort for both — then one
  *    per-user aggregation; no self-joins, no per-stage re-scans
  *    (the naive construction joins events to events once per stage).
  *    Per-user partitions are bounded by a user's event count (the
  *    q166/q199 window contract).
  *  - q218: cohort retention — users grouped by first-active day,
  *    re-activity measured at day offsets 0/1/7/14. One distinct
  *    (user, day) projection feeds both the cohort assignment and the
  *    offset matrix; output is O(#days · #offsets).
  *
  * Determinism: tie-breaks on event_id inside the window order;
  * conversion/retention are integer milli ratios with greatest(·,1)
  * guards mirrored in both engines.
  */
object PipelineQueries24 {

  /** THE ordered-funnel staged frame — one definition for q217's
    * conversion counts, q249's cohort conversion, and q255's latency
    * quantiles (the QualityGates rule: a funnel-semantics tweak must
    * not be hand-applied to three sites). Input: events at `(s, dir)`;
    * output adds `tus` (epoch micros), `pv` (earliest strictly-prior
    * view), `cav`/`pcav` (qualified click / its running min), `pav`
    * (qualified purchase time).
    */
  private[queries] def funnelStaged(
      s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tus", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("pv",
        min(when(col("event_type") === "view", col("tus"))).over(w))
      .withColumn("cav", when(col("event_type") === "click" &&
        col("pv").isNotNull, col("tus")))
      .withColumn("pcav", min(col("cav")).over(w))
      .withColumn("pav", when(col("event_type") === "purchase" &&
        col("pcav").isNotNull, col("tus")))
  }

  /** DuckDB twin of [[funnelStaged]]: `e, p1..p4` CTE bodies (caller
    * supplies `WITH`; final frame is `p4`).
    */
  private[queries] val funnelCtes: String =
    """e AS (SELECT user_id, event_id, event_type,
      |    epoch_us(ts) AS tus FROM events),
      |p1 AS (SELECT *, min(CASE WHEN event_type = 'view'
      |      THEN tus END) OVER (PARTITION BY user_id
      |      ORDER BY tus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    AS pv FROM e),
      |p2 AS (SELECT *, CASE WHEN event_type = 'click'
      |    AND pv IS NOT NULL THEN tus END AS cav FROM p1),
      |p3 AS (SELECT *, min(cav) OVER (PARTITION BY user_id
      |      ORDER BY tus, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |    AS pcav FROM p2),
      |p4 AS (SELECT *, CASE WHEN event_type = 'purchase'
      |    AND pcav IS NOT NULL THEN tus END AS pav FROM p3)"""
      .stripMargin

  val defs: Seq[QDef] = Seq(

    QDef("q217_event_funnel",
      (s, dir) => {
        val staged = funnelStaged(s, dir)
        val tot = staged.groupBy("user_id")
          .agg(max(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("s1"),
            max(when(col("cav").isNotNull, 1L).otherwise(0L)).as("s2"),
            max(when(col("pav").isNotNull, 1L).otherwise(0L)).as("s3"))
          .agg(count(lit(1)).as("n0"), sum("s1").as("n1"),
            sum("s2").as("n2"), sum("s3").as("n3"))
        tot.select(explode(array(
            struct(lit("all").as("stage"), col("n0").as("n_users"),
              lit(1000L).as("conv_milli")),
            struct(lit("view").as("stage"), col("n1").as("n_users"),
              expr("(1000 * n1) div greatest(n0, 1)").as("conv_milli")),
            struct(lit("view_click").as("stage"), col("n2").as("n_users"),
              expr("(1000 * n2) div greatest(n1, 1)").as("conv_milli")),
            struct(lit("view_click_purchase").as("stage"),
              col("n3").as("n_users"),
              expr("(1000 * n3) div greatest(n2, 1)").as("conv_milli"))))
            .as("r"))
          .select(col("r.stage").as("stage"), col("r.n_users"),
            col("r.conv_milli"))
      },
      Some(s"""WITH $funnelCtes,
             |u AS (SELECT user_id,
             |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      AS s1,
             |    max(CASE WHEN cav IS NOT NULL THEN 1 ELSE 0 END) AS s2,
             |    max(CASE WHEN pav IS NOT NULL THEN 1 ELSE 0 END) AS s3
             |  FROM p4 GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n0,
             |    CAST(sum(s1) AS BIGINT) AS n1,
             |    CAST(sum(s2) AS BIGINT) AS n2,
             |    CAST(sum(s3) AS BIGINT) AS n3 FROM u)
             |SELECT 'all' AS stage, n0 AS n_users,
             |  CAST(1000 AS BIGINT) AS conv_milli FROM t
             |UNION ALL SELECT 'view', n1,
             |  (1000 * n1) // greatest(n0, 1) FROM t
             |UNION ALL SELECT 'view_click', n2,
             |  (1000 * n2) // greatest(n1, 1) FROM t
             |UNION ALL SELECT 'view_click_purchase', n3,
             |  (1000 * n3) // greatest(n2, 1) FROM t""".stripMargin)),

    QDef("q218_cohort_retention",
      (s, dir) => {
        val days = Tables.events(s, dir)
          .select(col("user_id"),
            expr("unix_micros(ts) div 86400000000").as("day"))
          .distinct()
          .localCheckpoint() // cohort assignment + offsets share it
        val first = days.groupBy("user_id").agg(min("day").as("d0"))
        val offsets = days.join(first, "user_id")
          .select(col("d0"), (col("day") - col("d0")).as("off"))
          .filter(col("off").isin(0L, 1L, 7L, 14L))
          .groupBy("d0", "off").agg(count(lit(1)).as("n_active"))
        val size = offsets.filter(col("off") === 0)
          .select(col("d0"), col("n_active").as("csize"))
        offsets.join(broadcast(size), "d0") // O(#days) dimension
          .select(col("d0").as("cohort_day"),
            col("off").as("day_offset"), col("n_active"),
            expr("(1000 * n_active) div csize").as("retention_milli"))
      },
      Some("""WITH d AS (SELECT DISTINCT user_id,
             |    epoch_us(ts) // 86400000000 AS day FROM events),
             |f AS (SELECT user_id, min(day) AS d0 FROM d GROUP BY 1),
             |o AS (SELECT f.d0, d.day - f.d0 AS off
             |  FROM d JOIN f USING (user_id)
             |  WHERE d.day - f.d0 IN (0, 1, 7, 14)),
             |a AS (SELECT d0, off, count(*) AS n_active FROM o
             |  GROUP BY 1, 2),
             |s AS (SELECT d0, n_active AS csize FROM a WHERE off = 0)
             |SELECT CAST(a.d0 AS BIGINT) AS cohort_day,
             |  CAST(a.off AS BIGINT) AS day_offset,
             |  CAST(a.n_active AS BIGINT) AS n_active,
             |  (1000 * a.n_active) // csize AS retention_milli
             |FROM a JOIN s USING (d0)""".stripMargin)),

    // Re-shard movement audit: when a corpus grows from 16 to 17 (or
    // 32) shards, what fraction of documents MOVE under mod-hash vs
    // range-bucket assignment? Measured (sf0.01): mod +1 moves 93%,
    // mod doubling 54%, range +1 moves 49% — the floors shift across
    // the WHOLE keyspace, refuting the naive "range moves only
    // boundary slivers" intuition — and only range DOUBLING is
    // zero-move (every bucket splits in place). The planning lesson:
    // grow shard counts by powers of two under range assignment, or
    // pay a near-full reshuffle; anything else needs true consistent
    // hashing. One scan + one aggregation over four strategy rows.
    QDef("q222_reshard_movement",
      (s, dir) => {
        val hc = col("h")
        val strategies = array(
          struct(lit("mod_16_17").as("strategy"),
            (hc % 16 =!= hc % 17).cast("long").as("moved")),
          struct(lit("mod_16_32").as("strategy"),
            (hc % 16 =!= hc % 32).cast("long").as("moved")),
          struct(lit("range_16_17").as("strategy"),
            (expr("(h * 16) div 4294967296") =!=
              expr("(h * 17) div 4294967296")).cast("long").as("moved")),
          struct(lit("range_16_32").as("strategy"),
            (expr("(h * 16) div 4294967296") =!=
              expr("((h * 32) div 4294967296) div 2")).cast("long")
              .as("moved")))
        Tables.documents(s, dir)
          .select(tokenHash(concat(lit("rs:"),
            col("doc_id").cast("string"))).as("h"))
          .select(explode(strategies).as("r"))
          .groupBy(col("r.strategy").as("strategy"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("r.moved")).as("n_moved"))
          .select(col("strategy"), col("n_docs"), col("n_moved"),
            expr("(1000 * n_moved) div n_docs").as("moved_milli"))
      },
      Some("""WITH h AS (SELECT cast('0x' || substr(md5(
             |      'rs:' || CAST(doc_id AS VARCHAR)), 1, 8) as bigint)
             |    AS h FROM documents),
             |r AS (
             |  SELECT 'mod_16_17' AS strategy,
             |    CASE WHEN h % 16 <> h % 17 THEN 1 ELSE 0 END AS moved
             |  FROM h
             |  UNION ALL SELECT 'mod_16_32',
             |    CASE WHEN h % 16 <> h % 32 THEN 1 ELSE 0 END FROM h
             |  UNION ALL SELECT 'range_16_17',
             |    CASE WHEN (h * 16) // 4294967296 <>
             |      (h * 17) // 4294967296 THEN 1 ELSE 0 END FROM h
             |  UNION ALL SELECT 'range_16_32',
             |    CASE WHEN (h * 16) // 4294967296 <>
             |      ((h * 32) // 4294967296) // 2 THEN 1 ELSE 0 END
             |  FROM h)
             |SELECT strategy, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(moved) AS BIGINT) AS n_moved,
             |  (1000 * CAST(sum(moved) AS BIGINT)) //
             |    CAST(count(*) AS BIGINT) AS moved_milli
             |FROM r GROUP BY 1""".stripMargin))
  )
}
