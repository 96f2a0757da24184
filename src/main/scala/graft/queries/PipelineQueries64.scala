package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.ops.Sketches
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-fourth pipeline group — sketch set operations, path mining,
  * and packing economics:
  *
  *  - q343: KMV (bottom-K) set-operation sketch with its error audit.
  *    q334 proved bottom-K merges losslessly; this is the payoff:
  *    Jaccard between two sources estimated from K-hash sketches —
  *    matches-in-merged-bottom-K / K, the classic KMV/MinHash set-ops
  *    estimator (Beyer et al. 2007) — against the EXACT q291-style
  *    vocabulary Jaccard, per source pair. At 100 TB each source
  *    ships K hashes; the pairwise table costs O(S²·K), never a
  *    vocabulary cross join.
  *  - q344: top event paths — the most common 3-step (event_type)
  *    sequences across user journeys: per-user lead windows (bounded
  *    partitions, the pinned (ts, event_id) order), one global count,
  *    bounded top-20.
  *  - q345: sequence-packing efficiency audit at L=512: padding waste
  *    and utilization under (a) one-doc-per-sequence, (b) boundary-
  *    free stream concatenation — the two ends of the packing
  *    spectrum — and (c) big-with-small pairing (rank i with rank
  *    n+1−i, both ends of the sorted order; pairs that don't fit
  *    split back to singles). All three reduce to the length
  *    histogram + rank windows over it; no per-sequence state.
  */
object PipelineQueries64 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  private val KmvK = 128
  private val SeqLen = 512L

  val defs: Seq[QDef] = Seq(

    QDef("q343_kmv_set_ops",
      (s, dir) => {
        // distinct (source, token-hash) — the only corpus-sized pass
        val th = Tables.documents(s, dir)
          .select(col("source"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
          .select(col("source"),
            Sketches.hash60(concat(lit("kmv:"), col("tok"))).as("h"))
          .distinct()
          .localCheckpoint() // exact sizes + exact inter + sketches
        val sizes = th.groupBy("source").agg(count(lit(1)).as("v"))
        val inter = th.as("a").join(th.as("b"),
            col("a.h") === col("b.h") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("source_a"),
            col("b.source").as("source_b"))
          .agg(count(lit(1)).as("inter"))
        val pairs = sizes.as("x").join(sizes.as("y"),
            col("x.source") < col("y.source"))
          .select(col("x.source").as("source_a"), col("x.v").as("va"),
            col("y.source").as("source_b"), col("y.v").as("vb"))
          .join(inter, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"), col("va"), col("vb"),
            coalesce(col("inter"), lit(0L)).as("inter"))
          .localCheckpoint() // exact side; sketch side joins back
        // per-source bottom-K sketch via the mergeable partial/final
        // TopK (a per-source rank WINDOW would sort the whole
        // vocabulary partition — the q282 anti-pattern)
        val sk = graft.ops.TopK.perGroup(th, "source",
            struct(col("h")), KmvK)
          .select(col("source"), col("key.h").as("h"))
          .localCheckpoint() // both pair sides + the match probe
        val pairSketch = pairs.select(col("source_a"), col("source_b"))
          .join(sk.withColumnRenamed("source", "source_a"), "source_a")
          .unionByName(pairs.select(col("source_a"), col("source_b"))
            .join(sk.withColumnRenamed("source", "source_b"), "source_b")
            .select(col("source_a"), col("source_b"), col("h")))
          .distinct()
          .withColumn("r", row_number().over(
            Window.partitionBy("source_a", "source_b").orderBy("h")))
          .filter(col("r") <= KmvK)
        val matches = pairSketch
          .join(sk.select(col("source").as("source_a"), col("h")),
            Seq("source_a", "h"), "left_semi")
          .join(sk.select(col("source").as("source_b"), col("h")),
            Seq("source_b", "h"), "left_semi")
          .groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("m"))
        val kk = pairSketch.groupBy("source_a", "source_b")
          .agg(count(lit(1)).as("kk"))
        pairs
          .join(kk, Seq("source_a", "source_b"))
          .join(matches, Seq("source_a", "source_b"), "left")
          .select(col("source_a"), col("source_b"),
            expr("coalesce(m, 0L) * 1000000L div kk")
              .as("kmv_jaccard_micro"),
            expr("inter * 1000000L div (va + vb - inter)")
              .as("exact_jaccard_micro"))
          .withColumn("err_micro",
            abs(col("kmv_jaccard_micro") - col("exact_jaccard_micro")))
      },
      Some(s"""WITH th AS MATERIALIZED (
              |  SELECT DISTINCT source,
              |    ${hash60Sql("'kmv:' || tok")} AS h
              |  FROM (SELECT source, unnest($toksSql) AS tok
              |        FROM documents)),
              |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS v
              |  FROM th GROUP BY 1),
              |inter AS (SELECT a.source AS source_a, b.source AS source_b,
              |    CAST(count(*) AS BIGINT) AS inter
              |  FROM th a JOIN th b ON a.h = b.h AND a.source < b.source
              |  GROUP BY 1, 2),
              |p AS (SELECT x.source AS source_a, x.v AS va,
              |    y.source AS source_b, y.v AS vb,
              |    coalesce(inter.inter, 0) AS inter
              |  FROM sz x JOIN sz y ON x.source < y.source
              |  LEFT JOIN inter ON inter.source_a = x.source
              |    AND inter.source_b = y.source),
              |sk AS MATERIALIZED (SELECT source, h FROM (
              |    SELECT source, h, row_number() OVER (
              |      PARTITION BY source ORDER BY h) AS r FROM th) z
              |  WHERE r <= $KmvK),
              |psd AS (SELECT DISTINCT p.source_a, p.source_b, sk.h
              |  FROM p JOIN sk ON sk.source = p.source_a
              |    OR sk.source = p.source_b),
              |ps AS (SELECT source_a, source_b, h FROM (
              |    SELECT source_a, source_b, h,
              |      row_number() OVER (PARTITION BY source_a,
              |        source_b ORDER BY h) AS r
              |    FROM psd) z
              |  WHERE r <= $KmvK),
              |kk AS (SELECT source_a, source_b,
              |    CAST(count(*) AS BIGINT) AS kk
              |  FROM ps GROUP BY 1, 2),
              |m AS (SELECT ps.source_a, ps.source_b,
              |    CAST(count(*) AS BIGINT) AS m
              |  FROM ps
              |  JOIN sk a ON a.source = ps.source_a AND a.h = ps.h
              |  JOIN sk b ON b.source = ps.source_b AND b.h = ps.h
              |  GROUP BY 1, 2)
              |SELECT p.source_a, p.source_b,
              |  coalesce(m.m, 0) * 1000000 // kk.kk AS kmv_jaccard_micro,
              |  inter * 1000000 // (va + vb - inter)
              |    AS exact_jaccard_micro,
              |  abs(coalesce(m.m, 0) * 1000000 // kk.kk -
              |    inter * 1000000 // (va + vb - inter)) AS err_micro
              |FROM p JOIN kk USING (source_a, source_b)
              |LEFT JOIN m USING (source_a, source_b)""".stripMargin)),

    QDef("q344_event_paths",
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("tus").asc, col("eid").asc)
        val paths = Tables.events(s, dir)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_id").cast("long").as("eid"), col("event_type"))
          .withColumn("e2", lead(col("event_type"), 1).over(w))
          .withColumn("e3", lead(col("event_type"), 2).over(w))
          .filter(col("e2").isNotNull && col("e3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
            .as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
        paths.orderBy(col("n").desc, col("path").asc).limit(20)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("path").asc)))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS tus,
             |    event_id AS eid, event_type FROM events),
             |s AS (SELECT event_type,
             |    lead(event_type, 1) OVER w AS e2,
             |    lead(event_type, 2) OVER w AS e3
             |  FROM e WINDOW w AS (PARTITION BY user_id
             |    ORDER BY tus, eid)),
             |p AS (SELECT event_type || '>' || e2 || '>' || e3 AS path,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
             |  GROUP BY 1)
             |SELECT path, n, row_number() OVER (
             |    ORDER BY n DESC, path ASC) AS rank
             |FROM p ORDER BY n DESC, path ASC LIMIT 20""".stripMargin)),

    QDef("q345_packing_efficiency",
      (s, dir) => {
        val lens = Tables.documents(s, dir)
          .select(least(size(TextAnalysis.tokens(col("text")))
            .cast("long"), lit(SeqLen)).as("c"),
            col("doc_id"))
          .localCheckpoint() // three strategies share it
        val tot = lens.agg(count(lit(1)).as("n"), sum("c").as("content"))
        // (a) one doc per sequence
        val single = tot.select(lit("single").as("strategy"),
          col("n").as("n_sequences"),
          (col("n") * SeqLen - col("content")).as("padding_tokens"),
          expr(s"content * 1000000L div (n * $SeqLen)")
            .as("utilization_micro"))
        // (b) boundary-free stream
        val stream = tot.select(lit("stream").as("strategy"),
          expr(s"(content + $SeqLen - 1) div $SeqLen").as("n_sequences"),
          expr(s"((content + $SeqLen - 1) div $SeqLen) * $SeqLen - content")
            .as("padding_tokens"),
          expr(s"content * 1000000L div " +
            s"(((content + $SeqLen - 1) div $SeqLen) * $SeqLen)")
            .as("utilization_micro"))
        // (c) big-with-small pairing: rank i (desc) with rank n+1-i.
        // Global ranks come from the q123 two-level construction —
        // per-length offsets off the O(distinct lengths) histogram +
        // within-length row_number (bounded partitions) — never a
        // corpus-wide sort window
        val hist = lens.groupBy("c").agg(count(lit(1)).as("hc"))
          .withColumn("off",
            coalesce(sum("hc").over(Window.orderBy(col("c").desc)
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("c"), col("off"))
        val ranked = lens
          .withColumn("rr", row_number().over(
            Window.partitionBy("c").orderBy(col("doc_id").asc)))
          .join(broadcast(hist), "c")
          .select(col("c"), col("doc_id"), (col("off") + col("rr")).as("r"))
        val pairedSeqs = ranked.as("x")
          .crossJoin(broadcast(tot.select(col("n"))))
          .filter(col("r") * 2 <= col("n") + 1)
          .join(ranked.as("y").select(col("r").as("r2"),
            col("c").as("c2")),
            col("n") + 1 - col("r") === col("r2"), "left")
          .select(col("c"),
            when(col("r") === col("r2"), lit(null).cast("long"))
              .otherwise(col("c2")).as("c2"))
          .select(
            when(col("c2").isNull, lit(1L)) // odd middle: alone
              .when(col("c") + col("c2") <= SeqLen, lit(1L)) // packed
              .otherwise(lit(2L)).as("seqs"))
          .agg(sum("seqs").as("n_sequences"))
        val paired = pairedSeqs.crossJoin(broadcast(tot))
          .select(lit("paired").as("strategy"), col("n_sequences"),
            (col("n_sequences") * SeqLen - col("content"))
              .as("padding_tokens"),
            expr(s"content * 1000000L div (n_sequences * $SeqLen)")
              .as("utilization_micro"))
        single.unionByName(stream).unionByName(paired)
      },
      Some(s"""WITH l AS (SELECT doc_id,
              |    least(CAST(len($toksSql) AS BIGINT), $SeqLen) AS c
              |  FROM documents),
              |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(c) AS BIGINT) AS content FROM l),
              |rk AS (SELECT c, row_number() OVER (
              |    ORDER BY c DESC, doc_id ASC) AS r FROM l),
              |pr AS (SELECT x.c,
              |    CASE WHEN t.n + 1 - x.r = x.r THEN NULL
              |      ELSE y.c END AS c2
              |  FROM rk x JOIN t ON x.r * 2 <= t.n + 1
              |  LEFT JOIN rk y ON y.r = t.n + 1 - x.r),
              |pn AS (SELECT CAST(sum(CASE WHEN c2 IS NULL THEN 1
              |      WHEN c + c2 <= $SeqLen THEN 1 ELSE 2 END)
              |    AS BIGINT) AS n_sequences FROM pr)
              |SELECT 'single' AS strategy, n AS n_sequences,
              |  n * $SeqLen - content AS padding_tokens,
              |  content * 1000000 // (n * $SeqLen) AS utilization_micro
              |FROM t
              |UNION ALL
              |SELECT 'stream', (content + $SeqLen - 1) // $SeqLen,
              |  ((content + $SeqLen - 1) // $SeqLen) * $SeqLen - content,
              |  content * 1000000 //
              |    (((content + $SeqLen - 1) // $SeqLen) * $SeqLen)
              |FROM t
              |UNION ALL
              |SELECT 'paired', pn.n_sequences,
              |  pn.n_sequences * $SeqLen - t.content,
              |  t.content * 1000000 // (pn.n_sequences * $SeqLen)
              |FROM pn, t""".stripMargin))
  )
}
