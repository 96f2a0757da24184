package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Moments
import graft.ops.VectorSearch._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-third pipeline group — sketch composition and the
  * second-moment layer over embeddings:
  *
  *  - q276: per-source token-length quantile sketch WITH the merged
  *    corpus margin — the property that makes q264's log buckets the
  *    100 TB percentile path made first-class: the 'ALL' row is
  *    derived by re-aggregating the per-source SKETCH frame (tiny),
  *    never by a second corpus pass. Merge == addition, verified by
  *    the oracle replaying both levels.
  *  - q277: embedding dimension correlation matrix — the redundant-
  *    dimension audit. ONE custom Aggregator pass accumulates
  *    [n | Σx | Σx·xᵀ] in a d(d+3)/2+1-long buffer (map-side
  *    combined, merged by addition); a d²-column SQL aggregate blows
  *    codegen limits and the explode-self-join shape multiplies the
  *    corpus by d(d+1)/2 in the shuffle. Integer milli quantization
  *    before the sums keeps every moment exact; correlation takes the
  *    house one-mirrored-sqrt (q146) — both engines compute
  *    floor(1000·cov/√(vi·vj)) from identical exact integers.
  *  - q278: top-2 PCA projection — the 2-D embedding map. Training is
  *    the same one-pass moment vector + deterministic driver-side
  *    power iteration (fixed uniform start, fixed rounds, sign
  *    convention, single-threaded — bit-reproducible, the Lloyd
  *    discipline); the corpus only ever sees the two final
  *    eigenvectors as plan-time literals in a projection scan. The
  *    oracle is late-bound on those literals (q106's pattern).
  */
object PipelineQueries33 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  // ---- log-bucket fragments (lockstep with PipelineQueries31's and
  // StreamLogQuantile's copies) ----
  private val bucketESql =
    "CASE WHEN vm >= 1 THEN length(bin(vm)) - 1 ELSE -1 END"
  private val bucketSbSql =
    "CASE WHEN vm >= 1 THEN (vm >> greatest(e - 4, 0)) & 15 ELSE 0 END"
  private val bucketRepSql =
    """CASE WHEN e < 0 THEN 0 WHEN e < 4 THEN sb
      |  ELSE ((16 + sb) << (e - 4)) + ((1 << (e - 4)) - 1) // 2
      |END""".stripMargin
  private val bucketRepSpark =
    """CASE WHEN e < 0 THEN 0L WHEN e < 4 THEN sb
      |  ELSE shiftleft(16 + sb, cast(e - 4 as int))
      |    + (shiftleft(1L, cast(e - 4 as int)) - 1) div 2
      |END""".stripMargin

  // ---- vector fragments (lockstep with PipelineQueries6's copies) ----
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)
  private def vlit(c: Array[Double]): String = VectorOracleSql.vlit(c)

  /** q278's late-bound oracle: eigenvector literals. */
  private object PcaOracle { @volatile var sql: Option[String] = None }

  private val Dims = 64

  val defs: Seq[QDef] = Seq(

    // Per-source length sketch + merged corpus margin. The corpus is
    // scanned ONCE into per-source bucket counts; the 'ALL' row is a
    // re-aggregation of that O(#sources · #buckets) frame — sketch
    // merge is addition, which is exactly why this is the cross-shard
    // percentile path at 100 TB.
    QDef("q276_source_length_sketch",
      (s, dir) => {
        val buck = Tables.documents(s, dir)
          .select(col("source"),
            size(tokens(col("text"))).cast("long").as("vm"))
          .withColumn("e",
            expr("CASE WHEN vm >= 1 THEN length(bin(vm)) - 1 ELSE -1 END")
              .cast("long"))
          .withColumn("sb", expr("CASE WHEN vm >= 1 THEN " +
            "shiftright(vm, cast(greatest(e - 4, 0L) as int)) & 15 " +
            "ELSE 0L END"))
          .groupBy("source", "e", "sb").agg(count(lit(1)).as("c"))
          .localCheckpoint() // margin re-agg + union read it
        val all = buck.groupBy("e", "sb").agg(sum("c").as("c"))
          .select(lit("ALL").as("source"), col("e"), col("sb"), col("c"))
        val sk = buck.unionByName(all)
          .withColumn("rep", expr(bucketRepSpark))
        val n = sk.groupBy("source").agg(sum("c").as("n"))
        val w = Window.partitionBy("source").orderBy("e", "sb")
          .rowsBetween(Window.unboundedPreceding, 0)
        def est(p: Int, out: String) =
          min(when(col("cum") >= expr(s"($p * n + 99) div 100"),
            col("rep"))).as(out)
        sk.withColumn("cum", sum("c").over(w))
          .join(broadcast(n), "source")
          .groupBy("source")
          .agg(max("n").as("n"), est(50, "p50_est_toks"),
            est(90, "p90_est_toks"))
      },
      Some(s"""WITH h AS (SELECT source,
              |    CAST(len($toksSql) AS BIGINT) AS vm FROM documents),
              |b0 AS (SELECT source, vm, $bucketESql AS e FROM h),
              |b1 AS (SELECT source, e, $bucketSbSql AS sb FROM b0),
              |bk AS (SELECT source, e, sb, CAST(count(*) AS BIGINT) AS c
              |  FROM b1 GROUP BY 1, 2, 3),
              |al AS (SELECT 'ALL' AS source, e, sb,
              |    CAST(sum(c) AS BIGINT) AS c FROM bk GROUP BY 2, 3),
              |u AS (SELECT * FROM bk UNION ALL SELECT * FROM al),
              |n AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
              |  FROM u GROUP BY 1),
              |r AS (SELECT source, e, sb, c, $bucketRepSql AS rep,
              |    sum(c) OVER (PARTITION BY source ORDER BY e, sb)
              |      AS cum
              |  FROM u)
              |SELECT r.source, CAST(max(n) AS BIGINT) AS n,
              |  CAST(min(CASE WHEN cum >= (50*n + 99) // 100 THEN rep
              |    END) AS BIGINT) AS p50_est_toks,
              |  CAST(min(CASE WHEN cum >= (90*n + 99) // 100 THEN rep
              |    END) AS BIGINT) AS p90_est_toks
              |FROM r JOIN n USING (source) GROUP BY r.source"""
        .stripMargin)),

    // Dimension correlation matrix from the one-pass moment vector.
    // The output is O(d²) rows materialized from ONE bounded collect
    // (the moment row — 2145 longs at d=64); cov/var stay exact
    // integers, correlation is the single mirrored double expression.
    QDef("q277_dim_correlation",
      (s, dir) => {
        val d = Dims
        val m = Moments.secondMomentsMilli(
          Tables.embeddings(s, dir), "embedding", d)
        val n = m(0)
        val rows = for {
          i <- 0 until d
          j <- i until d
        } yield {
          val sxy = m(1 + d + Moments.triIndex(d, i, j))
          val si = m(1 + i)
          val sj = m(1 + j)
          val vi = n * m(1 + d + Moments.triIndex(d, i, i)) - si * si
          val vj = n * m(1 + d + Moments.triIndex(d, j, j)) - sj * sj
          val cov = n * sxy - si * sj
          val corr =
            if (vi <= 0 || vj <= 0) 0L
            else math.floor((1000.0 * cov.toDouble) /
              math.sqrt(vi.toDouble * vj.toDouble)).toLong
          (i.toLong, j.toLong, n, cov, corr)
        }
        s.createDataFrame(rows)
          .toDF("di", "dj", "n", "cov_num", "corr_milli")
      },
      Some(s"""WITH e AS (SELECT vec_id,
              |    list_transform(embedding,
              |      x -> CAST(floor(1000.0 * x::DOUBLE) AS BIGINT)) AS v
              |  FROM embeddings),
              |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
              |g AS (SELECT vec_id,
              |    unnest(generate_series(1, len(v))) AS k,
              |    unnest(v) AS x
              |  FROM e),
              |st AS (SELECT k - 1 AS dk, CAST(sum(x) AS BIGINT) AS sk_,
              |    CAST(sum(x * x) AS BIGINT) AS skk
              |  FROM g GROUP BY 1),
              |pr AS (SELECT a.k - 1 AS di, b.k - 1 AS dj,
              |    CAST(sum(a.x * b.x) AS BIGINT) AS sxy
              |  FROM g a JOIN g b
              |    ON a.vec_id = b.vec_id AND a.k <= b.k
              |  GROUP BY 1, 2)
              |SELECT CAST(di AS BIGINT) AS di, CAST(dj AS BIGINT) AS dj,
              |  n,
              |  CAST(n * sxy - si.sk_ * sj.sk_ AS BIGINT) AS cov_num,
              |  CAST(CASE WHEN n * si.skk - si.sk_ * si.sk_ <= 0
              |      OR n * sj.skk - sj.sk_ * sj.sk_ <= 0 THEN 0
              |    ELSE floor((1000.0 * (n * sxy - si.sk_ * sj.sk_))
              |      / sqrt(CAST(n * si.skk - si.sk_ * si.sk_ AS DOUBLE)
              |        * CAST(n * sj.skk - sj.sk_ * sj.sk_ AS DOUBLE)))
              |    END AS BIGINT) AS corr_milli
              |FROM pr JOIN st si ON pr.di = si.dk
              |  JOIN st sj ON pr.dj = sj.dk
              |CROSS JOIN nn""".stripMargin)),

    // Top-2 PCA projection. Moments → covariance (driver, exact-from-
    // integer doubles) → deterministic power iteration + rank-1
    // deflation; the two eigenvectors round to 1e-6 literals so both
    // engines project the SAME vector, then one corpus scan emits the
    // 2-D coordinates. No shuffle anywhere — the projection is
    // map-only against literals.
    QDef("q278_pca_project",
      (s, dir) => {
        val d = Dims
        val emb = Tables.embeddings(s, dir)
        val m = Moments.secondMomentsMilli(emb, "embedding", d)
        val c = Moments.covNum(m, d)
        val (v1, l1) = Moments.powerIteration(c, 60)
        val (v2, _) = Moments.powerIteration(
          Moments.deflate(c, v1, l1), 60, ortho = Seq(v1))
        def quant(v: Array[Double]) =
          v.map(x => math.rint(x * 1e6) / 1e6)
        val w1 = quant(v1)
        val w2 = quant(v2)
        PcaOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings)
             |SELECT vec_id,
             |  CAST(floor(${dotSql("v", vlit(w1))} * 1000000.0)
             |    AS BIGINT) AS pc1_micro,
             |  CAST(floor(${dotSql("v", vlit(w2))} * 1000000.0)
             |    AS BIGINT) AS pc2_micro
             |FROM e""".stripMargin)
        emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .select(col("vec_id"),
            floor(dot(col("v"), typedLit(w1.toSeq)) * lit(1000000.0))
              .cast("long").as("pc1_micro"),
            floor(dot(col("v"), typedLit(w2.toSeq)) * lit(1000000.0))
              .cast("long").as("pc2_micro"))
      },
      None,
      Some(() => PcaOracle.sql))
  )
}
