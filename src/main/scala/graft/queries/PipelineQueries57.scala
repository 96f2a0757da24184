package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fifty-seventh pipeline group — dedup-aware budgeting and
  * cross-source distribution alignment:
  *
  *  - q328: dedup-adjusted token budget per source. Mixture design
  *    (q232 DoReMi, q247 epoch schedules) weights sources by RAW
  *    token mass — but a source that is 40% internal duplicates
  *    contributes far fewer EFFECTIVE tokens. Per source: raw tokens,
  *    effective tokens (counting each exact-duplicate content once,
  *    via the q24 canonical = min doc_id per content hash), and the
  *    dedup discount in micro. One content-hash aggregation + one
  *    semi join; no near-dup machinery needed for the budget number
  *    (near-dup adjustment is q323's audit).
  *  - q329: quantile normalization of document length across sources
  *    (the batch-effect correction genomics normalizes arrays with):
  *    each document's length is replaced by the GLOBAL length at the
  *    same within-source quantile, so every source's corrected
  *    distribution matches the corpus. Ranks come from per-source
  *    value HISTOGRAMS (cumulative over distinct lengths — the q149
  *    discipline, never a corpus sort); the quantile match is
  *    cross-multiplied (cum_g·n_s ≥ rank·N picks the global value) —
  *    an as-of-style join on the bounded (source × distinct-length)
  *    frame, all integers.
  */
object PipelineQueries57 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  val defs: Seq[QDef] = Seq(

    QDef("q328_dedup_token_budget",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(tokens(col("text"))).cast("long").as("ntok"),
            md5(col("text")).as("ch"))
          .localCheckpoint() // raw mass + canonical set share it
        val canon = docs.groupBy("ch")
          .agg(min("doc_id").as("doc_id"))
        val eff = docs.join(canon, Seq("ch", "doc_id"), "left_semi")
          .groupBy("source")
          .agg(sum("ntok").as("effective_tokens"),
            count(lit(1)).as("n_canonical"))
        val raw = docs.groupBy("source")
          .agg(sum("ntok").as("raw_tokens"), count(lit(1)).as("n_docs"))
        raw.join(eff, "source")
          .select(col("source"), col("n_docs"), col("n_canonical"),
            col("raw_tokens"), col("effective_tokens"),
            expr("(raw_tokens - effective_tokens) * 1000000L " +
              "div raw_tokens").as("discount_micro"))
      },
      Some(s"""WITH d AS MATERIALIZED (SELECT doc_id, source,
              |    CAST(len($toksSql) AS BIGINT) AS ntok,
              |    md5(text) AS ch
              |  FROM documents),
              |c AS (SELECT ch, min(doc_id) AS doc_id FROM d
              |  GROUP BY 1),
              |e AS (SELECT source,
              |    CAST(sum(ntok) AS BIGINT) AS effective_tokens,
              |    CAST(count(*) AS BIGINT) AS n_canonical
              |  FROM d SEMI JOIN c USING (ch, doc_id)
              |  GROUP BY 1),
              |r AS (SELECT source, CAST(sum(ntok) AS BIGINT)
              |      AS raw_tokens,
              |    CAST(count(*) AS BIGINT) AS n_docs
              |  FROM d GROUP BY 1)
              |SELECT source, n_docs, n_canonical, raw_tokens,
              |  effective_tokens,
              |  (raw_tokens - effective_tokens) * 1000000
              |    // raw_tokens AS discount_micro
              |FROM r JOIN e USING (source)""".stripMargin)),

    QDef("q329_quantile_normalization",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("x"))
        // per-source value histogram + cumulative rank (distinct
        // lengths ≤ value domain — bounded, the q149 shape)
        val sh = docs.groupBy("source", "x")
          .agg(count(lit(1)).as("c"))
        val ws = Window.partitionBy("source").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, 0)
        val sCum = sh.withColumn("cum", sum("c").over(ws))
        val sTot = sh.groupBy("source").agg(sum("c").as("ns"))
        // global histogram + cumulative
        val gh = docs.groupBy(col("x").as("gx"))
          .agg(count(lit(1)).as("gc"))
        val wg = Window.orderBy("gx")
          .rowsBetween(Window.unboundedPreceding, 0)
        val gCum = gh.withColumn("gcum", sum("gc").over(wg))
          .crossJoin(broadcast(docs.agg(count(lit(1)).as("nn"))))
        // match: normalized value = min global x with gcum·ns ≥ cum·N
        // — a bounded (distinct-lengths × distinct-lengths) range
        // match per source, resolved as min-over-qualifying (as-of
        // shape), never a corpus join.
        val matched = sCum.join(sTot, "source")
          .join(gCum,
            col("gcum") * col("ns") >= col("cum") * col("nn"))
          .groupBy(col("source"), col("x"), col("cum"))
          .agg(min(col("gx")).as("x_norm"))
        docs.join(matched, Seq("source", "x"))
          .select(col("doc_id"), col("source"), col("x"),
            col("x_norm"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |    CAST(n_chars AS BIGINT) AS x FROM documents),
             |sh AS (SELECT source, x, CAST(count(*) AS BIGINT) AS c
             |  FROM d GROUP BY 1, 2),
             |sc AS (SELECT source, x, c,
             |    CAST(sum(c) OVER (PARTITION BY source ORDER BY x)
             |      AS BIGINT) AS cum
             |  FROM sh),
             |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns
             |  FROM sh GROUP BY 1),
             |gh AS (SELECT x, CAST(count(*) AS BIGINT) AS c
             |  FROM d GROUP BY 1),
             |gc AS (SELECT x, CAST(sum(c) OVER (ORDER BY x)
             |    AS BIGINT) AS gcum FROM gh),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM d),
             |mt AS (SELECT sc.source, sc.x, sc.cum,
             |    min(gc.x) AS x_norm
             |  FROM sc JOIN st USING (source), gc, nn
             |  WHERE gc.gcum * st.ns >= sc.cum * nn.nn
             |  GROUP BY 1, 2, 3)
             |SELECT d.doc_id, d.source, d.x, mt.x_norm
             |FROM d JOIN mt ON d.source = mt.source AND d.x = mt.x"""
        .stripMargin))
  )
}
