package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Moments
import graft.ops.VectorSearch._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Thirty-fourth pipeline group — label-aware embedding audits and
  * categorical association:
  *
  *  - q279: PCA reconstruction error per label — how much of each
  *    label class the 2-D map (q278) actually preserves. With an
  *    orthonormal basis the residual is ‖x‖² − p1² − p2² (no
  *    per-vector reconstruction join); the basis is the QUANTIZED
  *    eigenvector pair, so both engines evaluate the identical
  *    literal expression (late-bound oracle, q106 pattern).
  *  - q280: per-dimension Fisher score (between-class / within-class
  *    variance) — the label-discriminativeness audit used for feature
  *    selection. The corpus explodes to (label, dim, x_milli) but the
  *    partial aggregation combines map-side, so the shuffle carries
  *    only #labels·d moment rows; everything after is arithmetic on
  *    that tiny frame, fully integer (micro means, milli² scatter,
  *    one mirrored div tree).
  *  - q281: lang × source pointwise mutual information (micro-nats) —
  *    which combinations are over/under-represented vs independence.
  *    O(|lang|·|source|) cells after one scan; the single ln is the
  *    house mirrored-libm pattern (q108/q113) over exact integer
  *    ratios.
  *  - q282: source-mass quartiles via ntile / percent_rank /
  *    cume_dist — the rank-window coverage row. These functions sort
  *    their whole partition, so they are ONLY sane on bounded frames:
  *    here the O(#sources) mass table (the q260 rule), never the
  *    corpus.
  */
object PipelineQueries34 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  // ---- vector fragments (lockstep with PipelineQueries6's copies) ----
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)
  private def vlit(c: Array[Double]): String = VectorOracleSql.vlit(c)

  /** q279's late-bound oracle: quantized eigenvector literals. */
  private object ReconOracle { @volatile var sql: Option[String] = None }

  private val Dims = 64

  val defs: Seq[QDef] = Seq(

    // Per-label mean reconstruction error of the top-2 PCA basis.
    // Same deterministic trainer as q278 (moments → orthogonal power
    // iteration); the residual identity keeps the scan map-side —
    // sv/p1/p2 computed once per vector, error from those columns in
    // a second projection so the oracle mirrors stage-for-stage.
    QDef("q279_pca_recon_error",
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
        ReconOracle.sql = Some(
          s"""WITH e AS (SELECT label, $vSql AS v FROM embeddings),
             |b AS (SELECT label, ${dotSql("v", "v")} AS sv,
             |    ${dotSql("v", vlit(w1))} AS p1,
             |    ${dotSql("v", vlit(w2))} AS p2
             |  FROM e),
             |r AS (SELECT label,
             |    CAST(floor((sv - p1 * p1 - p2 * p2) * 1000000.0)
             |      AS BIGINT) AS err
             |  FROM b)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(CASE WHEN CAST(sum(err) AS BIGINT) < 0
             |    THEN -((-CAST(sum(err) AS BIGINT)) // count(*))
             |    ELSE CAST(sum(err) AS BIGINT) // count(*) END
             |    AS BIGINT) AS mean_err_micro
             |FROM r GROUP BY label""".stripMargin)
        emb.select(col("label"), toDouble(col("embedding")).as("v"))
          .select(col("label"), dot(col("v"), col("v")).as("sv"),
            dot(col("v"), typedLit(w1.toSeq)).as("p1"),
            dot(col("v"), typedLit(w2.toSeq)).as("p2"))
          .select(col("label"),
            floor((col("sv") - col("p1") * col("p1") -
              col("p2") * col("p2")) * lit(1000000.0))
              .cast("long").as("err"))
          .groupBy("label")
          .agg(count(lit(1)).as("n_vecs"), sum("err").as("se"))
          .selectExpr("label", "n_vecs",
            """CASE WHEN se < 0 THEN -((-se) div n_vecs)
              |  ELSE se div n_vecs END AS mean_err_micro""".stripMargin)
      },
      None,
      Some(() => ReconOracle.sql)),

    // Per-dimension Fisher score. (label, dim) moments come out of one
    // exploded scan with map-side combine (#labels·d shuffle rows);
    // the global per-dim row re-aggregates THAT frame. Means in micro
    // via integer division (defined precision, mirrored), scatter
    // numerators exact, final ratio one div tree.
    QDef("q280_fisher_scores",
      (s, dir) => {
        val lm = Tables.embeddings(s, dir)
          .select(col("label"),
            posexplode(transform(col("embedding"),
              x => floor(x.cast("double") * lit(1000.0)).cast("long")))
              .as(Seq("dim", "x")))
          .groupBy("label", "dim")
          .agg(count(lit(1)).as("n"), sum("x").as("s"),
            sum(expr("x * x")).as("ss"))
          .localCheckpoint() // global re-agg + the B/W join read it
        val g = lm.groupBy("dim")
          .agg(sum("n").as("gn"), sum("s").as("gs"))
          .selectExpr("dim", "gn", "(1000 * gs) div gn AS gmu")
        lm.join(broadcast(g), "dim")
          .selectExpr("dim",
            "(1000 * s) div n AS mu",
            "n", "gmu", "n * ss - s * s AS wnum")
          .selectExpr("dim",
            "n * (mu - gmu) * (mu - gmu) AS bterm",
            "wnum div n AS wterm")
          .groupBy("dim")
          .agg(count(lit(1)).as("n_labels"), sum("bterm").as("between_num"),
            sum("wterm").as("within_num"))
          .selectExpr("dim", "n_labels", "between_num", "within_num",
            "between_num div greatest(1000 * within_num, 1L)" +
              " AS fisher_milli")
      },
      Some("""WITH e AS (SELECT label,
             |    list_transform(embedding,
             |      x -> CAST(floor(1000.0 * x::DOUBLE) AS BIGINT)) AS v
             |  FROM embeddings),
             |x AS (SELECT label,
             |    unnest(generate_series(1, len(v))) - 1 AS dim,
             |    unnest(v) AS x
             |  FROM e),
             |lm AS (SELECT label, dim, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS s,
             |    CAST(sum(x * x) AS BIGINT) AS ss
             |  FROM x GROUP BY 1, 2),
             |g AS (SELECT dim, CAST(sum(n) AS BIGINT) AS gn,
             |    (1000 * CAST(sum(s) AS BIGINT))
             |      // CAST(sum(n) AS BIGINT) AS gmu
             |  FROM lm GROUP BY 1),
             |t AS (SELECT lm.dim,
             |    n * ((1000 * s) // n - gmu) * ((1000 * s) // n - gmu)
             |      AS bterm,
             |    (n * ss - s * s) // n AS wterm
             |  FROM lm JOIN g USING (dim))
             |SELECT CAST(dim AS BIGINT) AS dim,
             |  CAST(count(*) AS BIGINT) AS n_labels,
             |  CAST(sum(bterm) AS BIGINT) AS between_num,
             |  CAST(sum(wterm) AS BIGINT) AS within_num,
             |  CAST(CAST(sum(bterm) AS BIGINT)
             |    // greatest(1000 * CAST(sum(wterm) AS BIGINT), 1)
             |    AS BIGINT) AS fisher_milli
             |FROM t GROUP BY dim""".stripMargin)),

    // lang × source PMI in micro-nats + expected count. O(cells)
    // arithmetic after one scan; margins re-aggregate the cell frame.
    QDef("q281_lang_source_pmi",
      (s, dir) => {
        val cell = Tables.documents(s, dir)
          .groupBy("lang", "source").agg(count(lit(1)).as("n"))
          .localCheckpoint() // margins + output read it
        val rl = cell.groupBy("lang").agg(sum("n").as("rl"))
        val cs = cell.groupBy("source").agg(sum("n").as("cs"))
        val tot = cell.agg(sum("n").as("tot"))
        cell.join(broadcast(rl), "lang").join(broadcast(cs), "source")
          .crossJoin(broadcast(tot))
          .select(col("lang"), col("source"), col("n"),
            expr("(1000 * rl * cs) div tot AS expected_milli"),
            floor(log((col("n") * col("tot")) / (col("rl") * col("cs")))
              * lit(1000000.0)).cast("long").as("pmi_micro_nat"))
      },
      Some("""WITH c AS (SELECT lang, source,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM documents GROUP BY 1, 2),
             |r AS (SELECT lang, CAST(sum(n) AS BIGINT) AS rl
             |  FROM c GROUP BY 1),
             |s AS (SELECT source, CAST(sum(n) AS BIGINT) AS cs
             |  FROM c GROUP BY 1),
             |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
             |SELECT lang, source, n,
             |  CAST((1000 * rl * cs) // tot AS BIGINT)
             |    AS expected_milli,
             |  CAST(floor(ln((n * tot) / (rl * cs)) * 1000000.0)
             |    AS BIGINT) AS pmi_micro_nat
             |FROM c JOIN r USING (lang) JOIN s USING (source)
             |CROSS JOIN t""".stripMargin)),

    // Rank-window coverage on the bounded source-mass frame:
    // ntile(4) quartiles, percent_rank, cume_dist — all milli, total
    // order (mass, source). These windows sort their whole partition;
    // the frame is O(#sources), never the corpus (the q260 rule).
    QDef("q282_source_mass_deciles",
      (s, dir) => {
        val mass = Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(size(tokens(col("text"))).cast("long")).as("tok_mass"))
        val w = Window.orderBy(col("tok_mass").asc, col("source").asc)
        mass
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .withColumn("pr_milli",
            floor(percent_rank().over(w) * lit(1000.0)).cast("long"))
          .withColumn("cd_milli",
            floor(cume_dist().over(w) * lit(1000.0)).cast("long"))
          .select(col("source"), col("tok_mass"), col("quartile"),
            col("pr_milli"), col("cd_milli"))
      },
      Some(s"""WITH m AS (SELECT source,
              |    CAST(sum(len($toksSql)) AS BIGINT) AS tok_mass
              |  FROM documents GROUP BY source)
              |SELECT source, tok_mass,
              |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
              |  CAST(floor(percent_rank() OVER w * 1000.0) AS BIGINT)
              |    AS pr_milli,
              |  CAST(floor(cume_dist() OVER w * 1000.0) AS BIGINT)
              |    AS cd_milli
              |FROM m
              |WINDOW w AS (ORDER BY tok_mass ASC, source ASC)"""
        .stripMargin))
  )
}
