package graft.queries

import graft.Tables
import graft.ops.Sketches
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixty-ninth pipeline group — split manifests and distribution
  * divergence:
  *
  *  - q355: stratified train/val/test manifest with EXACT integer
  *    quotas per source (train = n·8 div 10, val = n div 10, test =
  *    the remainder — sums match by construction, unlike the
  *    hash-threshold split whose strata drift binomially). Assignment
  *    is by per-source hash RANK, built scale-safe with the q123
  *    two-level construction: 256 hash-prefix buckets give O(S·256)
  *    offsets, within-bucket row_number runs on bounded partitions —
  *    never a per-source corpus sort window. Deterministic,
  *    replayable, and quota-exact at any scale.
  *  - q356: Jensen–Shannon divergence between each source's length
  *    distribution and the corpus (symmetric, bounded [0, ln 2] —
  *    the information-theoretic complement of q336's KS and q284's
  *    PSI): per-term micro-nat quantization of both KL halves on the
  *    bounded O(S·V) histogram grid, add-one smoothing so empty cells
  *    stay finite.
  */
object PipelineQueries69 {

  private def hash60Sql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 15) as bigint)"

  val defs: Seq[QDef] = Seq(

    QDef("q355_split_manifest",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"),
            Sketches.hash60(concat(lit("split:"),
              col("doc_id").cast("string"))).as("h"))
          // 256 hash-prefix buckets: the two-level rank's outer level
          .withColumn("bkt", (col("h") / lit(1L << 52)).cast("long"))
          .localCheckpoint() // offsets + within-bucket ranks share it
        val offsets = docs.groupBy("source", "bkt")
          .agg(count(lit(1)).as("bc"))
          .withColumn("off",
            coalesce(sum("bc").over(Window.partitionBy("source")
              .orderBy("bkt")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("source"), col("bkt"), col("off"))
        val quotas = docs.groupBy("source").agg(count(lit(1)).as("n"))
          .select(col("source"), col("n"),
            expr("n * 8L div 10").as("qt"),
            expr("n div 10").as("qv"))
        val ranked = docs
          .withColumn("rr", row_number().over(
            Window.partitionBy("source", "bkt")
              .orderBy(col("h").asc, col("doc_id").asc)))
          .join(broadcast(offsets), Seq("source", "bkt"))
          .select(col("source"), col("doc_id"),
            (col("off") + col("rr") - 1).as("r"))
        ranked.join(broadcast(quotas), "source")
          .select(col("source"),
            when(col("r") < col("qt"), lit("train"))
              .when(col("r") < col("qt") + col("qv"), lit("val"))
              .otherwise(lit("test")).as("split"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"))
      },
      Some(s"""WITH d AS (SELECT doc_id, source,
              |    ${hash60Sql("'split:' || CAST(doc_id AS VARCHAR)")}
              |      AS h
              |  FROM documents),
              |r AS (SELECT source, doc_id,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY h, doc_id) - 1 AS r
              |  FROM d),
              |q AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
              |    CAST(count(*) AS BIGINT) * 8 // 10 AS qt,
              |    CAST(count(*) AS BIGINT) // 10 AS qv
              |  FROM d GROUP BY 1)
              |SELECT r.source,
              |  CASE WHEN r.r < q.qt THEN 'train'
              |    WHEN r.r < q.qt + q.qv THEN 'val'
              |    ELSE 'test' END AS split,
              |  CAST(count(*) AS BIGINT) AS n_docs
              |FROM r JOIN q USING (source)
              |GROUP BY 1, 2""".stripMargin)),

    QDef("q356_js_divergence",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .select(col("source"), col("n_chars"))
          .localCheckpoint()
        val vals = docs.select(col("n_chars")).distinct()
        val srcN = docs.groupBy("source").agg(count(lit(1)).as("ns"))
        val n = docs.agg(count(lit(1)).as("n"))
        val hist = docs.groupBy("source", "n_chars")
          .agg(count(lit(1)).as("c"))
        val ghist = docs.groupBy("n_chars").agg(count(lit(1)).as("gc"))
        val nv = vals.count() // |V|: the smoothing denominator term
        // grid with add-one smoothing: p = (c+1)/(ns+|V|),
        // q = (gc+1)/(n+|V|), m = (p+q)/2; per-term micro-nat
        // quantization of both KL halves (q108 rule); all ratios are
        // rationals of exact longs evaluated in mirrored double ops
        srcN.crossJoin(vals)
          .join(hist, Seq("source", "n_chars"), "left")
          .join(ghist, "n_chars")
          .crossJoin(broadcast(n))
          .select(col("source"), col("ns"),
            (coalesce(col("c"), lit(0L)) + 1).cast("double").as("cp"),
            (col("ns") + lit(nv)).cast("double").as("dp"),
            (col("gc") + 1).cast("double").as("cq"),
            (col("n") + lit(nv)).cast("double").as("dq"))
          .select(col("source"),
            floor(lit(1000000.0) * (col("cp") / col("dp")) *
              log((col("cp") / col("dp")) /
                ((col("cp") / col("dp") + col("cq") / col("dq")) / 2.0)))
              .cast("long").as("pterm"),
            floor(lit(1000000.0) * (col("cq") / col("dq")) *
              log((col("cq") / col("dq")) /
                ((col("cp") / col("dp") + col("cq") / col("dq")) / 2.0)))
              .cast("long").as("qterm"))
          .groupBy("source")
          .agg(sum("pterm").as("skl"), sum("qterm").as("gkl"))
          .select(col("source"),
            expr("""CASE WHEN skl + gkl < 0
                   |  THEN -((-(skl + gkl)) div 2)
                   |  ELSE (skl + gkl) div 2 END""".stripMargin)
              .as("js_micro"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source, n_chars FROM documents),
              |v AS (SELECT DISTINCT n_chars FROM d),
              |nv AS (SELECT CAST(count(*) AS BIGINT) AS nv FROM v),
              |sn AS (SELECT source, CAST(count(*) AS BIGINT) AS ns
              |  FROM d GROUP BY 1),
              |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
              |h AS (SELECT source, n_chars, CAST(count(*) AS BIGINT)
              |    AS c FROM d GROUP BY 1, 2),
              |gh AS (SELECT n_chars, CAST(count(*) AS BIGINT) AS gc
              |  FROM d GROUP BY 1),
              |g AS (SELECT sn.source,
              |    (coalesce(h.c, 0) + 1)::DOUBLE AS cp,
              |    (sn.ns + nv.nv)::DOUBLE AS dp,
              |    (gh.gc + 1)::DOUBLE AS cq,
              |    (n.n + nv.nv)::DOUBLE AS dq
              |  FROM sn CROSS JOIN v
              |  LEFT JOIN h ON h.source = sn.source
              |    AND h.n_chars = v.n_chars
              |  JOIN gh ON gh.n_chars = v.n_chars, n, nv),
              |t AS (SELECT source,
              |    CAST(floor(1000000.0 * (cp / dp) *
              |      ln((cp / dp) / ((cp / dp + cq / dq) / 2.0)))
              |      AS BIGINT) AS pterm,
              |    CAST(floor(1000000.0 * (cq / dq) *
              |      ln((cq / dq) / ((cp / dp + cq / dq) / 2.0)))
              |      AS BIGINT) AS qterm
              |  FROM g),
              |a AS (SELECT source, CAST(sum(pterm) AS BIGINT) AS skl,
              |    CAST(sum(qterm) AS BIGINT) AS gkl
              |  FROM t GROUP BY 1)
              |SELECT source,
              |  CAST(CASE WHEN skl + gkl < 0
              |    THEN -((-(skl + gkl)) // 2)
              |    ELSE (skl + gkl) // 2 END AS BIGINT) AS js_micro
              |FROM a ORDER BY source""".stripMargin))
  )
}
