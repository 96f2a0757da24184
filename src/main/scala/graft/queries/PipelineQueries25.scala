package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Sketches
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Twenty-fifth pipeline group — hybrid retrieval, pair-free semantic
  * diversity, and the Bloom operating curve:
  *
  *  - q219: reciprocal-rank fusion (RRF, Cormack et al. 2009) of the
  *    lexical BM25 ranking (q90) and the embedding-cosine ranking
  *    (q28) — the standard hybrid-search stack. Each list contributes
  *    1e6 div (60 + rank) integer micro-units; the fused score is a
  *    full-outer join of two k-row rankings, so fusion costs O(k)
  *    regardless of corpus size — the expensive parts ARE q90/q28,
  *    whose scale shapes are already contract-pinned. Reuses both
  *    QDefs directly (Spark fns and oracle SQL alike), so the three
  *    rankings can never drift apart.
  *  - q220: per-label embedding diversity — MEAN PAIRWISE COSINE with
  *    zero pair enumeration, via the Gram identity
  *    Σ_{i≠j} qᵢ·qⱼ = ‖Σq‖² − Σ‖qᵢ‖²: one per-dimension sum
  *    aggregation replaces the O(n²) pair join entirely (n = 10⁹
  *    vectors per label costs the same two aggregations as n = 100).
  *    Vectors are unit-normalized then micro-quantized to longs, so
  *    every cross-row sum is exact-integer; the only floats are the
  *    per-row normalize chain (the q146 single-mirrored-sqrt rule).
  *    The pair sum can be negative; Spark `div` and DuckDB `//` both
  *    truncate toward zero, so the integer mean stays engine-exact.
  *  - q221: Bloom-filter false-positive operating curve — q109's
  *    filter measured at m ∈ {2¹², 2¹⁴, 2¹⁶} bits against held-out
  *    TRUE NEGATIVES (val-split grams anti-joined from the prior
  *    set): measured FP rate next to bits-per-key, the table that
  *    picks m for a production decontamination filter. Build is the
  *    bounded m/64-long collect per width; the oracle replays the
  *    position arithmetic as set membership (the q109 idiom).
  *
  * Overflow bounds (q220): component sums reach n·1e6 and are
  * squared, so n must stay under ~3e12/‖dims‖ per label — documented,
  * beyond any tested scale by orders of magnitude.
  */
object PipelineQueries25 {

  /** RRF's standard dampening constant. */
  private val RrfK = 60L

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  // Negative-ground division note (q220's pair sum CAN be negative):
  // Spark `div` and DuckDB `//` BOTH truncate toward zero (verified:
  // -7 // 2 = -3 in DuckDB), so plain div stays engine-exact on
  // either sign — the "non-negative ground" rule elsewhere is belt
  // and braces, not a necessity.

  private val FpK = 5
  private val FpMs = Seq(4096, 16384, 65536)

  /** 8-gram concatenation, lockstep with TextAnalysis.ngramHashes. */
  private val gramCat8 =
    (0 until 8).map(i => s"toks[i+$i]").mkString(" || ' ' || ")

  /** DuckDB twin of Sketches' affine position hash (q109's idiom). */
  private def affineSql(g: String, seed: Int): String = {
    val (a, b) = graft.functions.TextAnalysis.affineParam(seed)
    s"(($g * $a + $b) % ${graft.functions.TextAnalysis.MinhashPrime})"
  }

  val defs: Seq[QDef] = Seq(

    QDef("q219_hybrid_rrf",
      (s, dir) => {
        val lex = PipelineQueries4.defs
          .find(_.name == "q90_bm25_search").get.fn(s, dir)
          .select(col("doc_id").as("id"),
            col("rank").cast("long").as("lex_rank"))
        val sem = VectorQueries.defs
          .find(_.name == "q28_ann_bruteforce").get.fn(s, dir)
          .select(col("vec_id").as("id"),
            col("rank").cast("long").as("sem_rank"))
        lex.join(sem, Seq("id"), "full_outer") // two k-row frames
          .select(col("id").as("doc_id"),
            (coalesce(expr(s"1000000 div ($RrfK + lex_rank)"), lit(0L)) +
              coalesce(expr(s"1000000 div ($RrfK + sem_rank)"), lit(0L)))
              .as("rrf_micro"),
            col("lex_rank"), col("sem_rank"))
          .orderBy(col("rrf_micro").desc, col("doc_id"))
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("rrf_micro").desc, col("doc_id")))
            .cast("long"))
      },
      Some {
        val lexSql = PipelineQueries4.defs
          .find(_.name == "q90_bm25_search").get.oracle.get
        val semSql = VectorQueries.defs
          .find(_.name == "q28_ann_bruteforce").get.oracle.get
        s"""WITH lex AS (SELECT doc_id AS id,
           |    CAST(rank AS BIGINT) AS lex_rank FROM ($lexSql) zl),
           |sem AS (SELECT vec_id AS id,
           |    CAST(rank AS BIGINT) AS sem_rank FROM ($semSql) zs),
           |f AS (SELECT coalesce(lex.id, sem.id) AS doc_id,
           |    coalesce(1000000 // ($RrfK + lex_rank), 0) +
           |      coalesce(1000000 // ($RrfK + sem_rank), 0) AS rrf_micro,
           |    lex_rank, sem_rank
           |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
           |SELECT doc_id, rrf_micro, lex_rank, sem_rank,
           |  CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
           |    AS BIGINT) AS rank
           |FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10"""
          .stripMargin
      }),

    QDef("q220_embed_diversity",
      (s, dir) => {
        val vd = transform(col("embedding"), x => x.cast("double"))
        val nrm = sqrt(aggregate(vd, lit(0.0),
          (acc, x) => acc + x * x))
        val q = Tables.embeddings(s, dir)
          .select(col("label"), vd.as("v"), nrm.as("nrm"))
          .filter(col("nrm") > 0.0)
          .select(col("label"), transform(col("v"),
            x => floor(lit(1000000.0) * (x / col("nrm"))).cast("long"))
            .as("qv"))
          .localCheckpoint() // per-dim sums + per-vec norms share it
        // ‖Σq‖²: per-dimension integer sums (64·n rows, map-side
        // combined), then Σ over dims
        val ss = q.select(col("label"),
            posexplode(col("qv")).as(Seq("d", "x")))
          .groupBy("label", "d").agg(sum("x").as("sd"))
          .groupBy("label").agg(sum(col("sd") * col("sd")).as("ss"))
        // Σ‖qᵢ‖²: row-local fold, one aggregation
        val sn = q.select(col("label"),
            aggregate(col("qv"), lit(0L), (acc, x) => acc + x * x)
              .as("n2"))
          .groupBy("label")
          .agg(sum("n2").as("sn"), count(lit(1)).as("n_vecs"))
        ss.join(sn, "label")
          .select(col("label").cast("long").as("label"), col("n_vecs"),
            (col("ss") - col("sn")).as("pair_dot_sum"),
            when(col("n_vecs") >= 2,
              expr("(ss - sn) div (n_vecs * (n_vecs - 1) * 1000000)"))
              .otherwise(lit(0L)).as("mean_cos_micro"))
      },
      Some("""WITH v AS (SELECT label,
             |    list_transform(embedding, x -> x::DOUBLE) AS vd
             |  FROM embeddings),
             |w AS (SELECT label, vd, sqrt(list_reduce(list_prepend(
             |      0.0::DOUBLE, list_transform(vd, x -> x * x)),
             |      (p, q2) -> p + q2)) AS nrm
             |  FROM v),
             |q AS MATERIALIZED (SELECT label, list_transform(vd,
             |      x -> CAST(floor(1000000.0 * (x / nrm)) AS BIGINT))
             |    AS qv
             |  FROM w WHERE nrm > 0.0),
             |e AS (SELECT label, i AS d, qv[i] AS x FROM (
             |    SELECT label, qv,
             |      unnest(generate_series(1, len(qv))) AS i FROM q) z),
             |sd AS (SELECT label, d, sum(x) AS sd FROM e GROUP BY 1, 2),
             |ss AS (SELECT label, sum(sd * sd) AS ss FROM sd GROUP BY 1),
             |sn AS (SELECT label, sum(list_reduce(list_prepend(
             |      CAST(0 AS BIGINT), list_transform(qv, x -> x * x)),
             |      (p, q2) -> p + q2)) AS sn,
             |    count(*) AS n_vecs FROM q GROUP BY 1)
             |SELECT CAST(ss.label AS BIGINT) AS label,
             |  CAST(n_vecs AS BIGINT) AS n_vecs,
             |  CAST(ss - sn AS BIGINT) AS pair_dot_sum,
             |  CAST(CASE WHEN n_vecs >= 2 THEN (ss - sn) //
             |      (n_vecs * (n_vecs - 1) * 1000000)
             |    ELSE 0 END AS BIGINT) AS mean_cos_micro
             |FROM ss JOIN sn USING (label)""".stripMargin)),

    QDef("q221_bloom_fp_curve",
      (s, dir) => {
        val grams = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"),
            explode(ngramHashes(col("toks"), 8)).as("g"))
          .localCheckpoint() // prior + negatives derive from it
        val prior = grams.filter(col("doc_id") % 31 === 0)
          .select("g").distinct().localCheckpoint() // 3 builds + count
        // held-out TRUE negatives: val-split grams the prior never saw
        val negs = grams.filter(col("doc_id") % 31 =!= 0)
          .select("g").distinct()
          .join(prior, Seq("g"), "left_anti")
          .localCheckpoint() // 3 probes share it
        val nPrior = prior.agg(count(lit(1)).as("n_prior"))
        val curves = FpMs.map { m =>
          val words = Sketches.bloomBuild(prior, col("g"), m, FpK)
          negs
            .withColumn("hit", Sketches.bloomProbe(col("g"), words,
              m, FpK))
            .agg(count(lit(1)).as("n_neg"),
              sum(when(col("hit"), 1L).otherwise(0L)).as("n_fp"))
            .withColumn("m", lit(m.toLong))
        }.reduce(_ union _)
        curves.crossJoin(broadcast(nPrior))
          .select(col("m"), col("n_prior"), col("n_neg"), col("n_fp"),
            expr("(1000 * n_fp) div greatest(n_neg, 1)").as("fp_milli"),
            expr("(1000 * m) div greatest(n_prior, 1)")
              .as("bits_per_key_milli"))
      },
      Some {
        val perM = FpMs.map { m =>
          s"""(SELECT $m AS m,
             |  (SELECT count(*) FROM pg) AS n_prior,
             |  (SELECT count(*) FROM neg) AS n_neg,
             |  (SELECT count(*) FROM (
             |    SELECT neg.g FROM neg CROSS JOIN
             |      unnest(generate_series(0, ${FpK - 1})) AS ti(i)
             |    JOIN pp_$m ON pp_$m.p =
             |      (${affineSql("neg.g", 9001)} +
             |       i * ${affineSql("neg.g", 9002)}) % $m
             |    GROUP BY neg.g HAVING count(*) = $FpK) z) AS n_fp)"""
            .stripMargin
        }.mkString("\nUNION ALL ")
        val pps = FpMs.map { m =>
          s"""pp_$m AS MATERIALIZED (SELECT DISTINCT
             |    (${affineSql("g", 9001)} +
             |     i * ${affineSql("g", 9002)}) % $m AS p
             |  FROM pg CROSS JOIN
             |    unnest(generate_series(0, ${FpK - 1})) AS ti(i))"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
           |ga AS (SELECT doc_id, list_distinct(
           |    CASE WHEN len(toks) >= 8 THEN list_transform(
           |      generate_series(1, len(toks) - 7), i ->
           |        cast('0x' || substr(md5(($gramCat8)), 1, 8)
           |          as bigint))
           |    ELSE [] END) AS gs FROM t),
           |g AS (SELECT doc_id, unnest(gs) AS g FROM ga),
           |pg AS MATERIALIZED (SELECT DISTINCT g FROM g
           |  WHERE doc_id % 31 = 0),
           |neg AS MATERIALIZED (SELECT DISTINCT g FROM g
           |  WHERE doc_id % 31 <> 0 AND g NOT IN (SELECT g FROM pg)),
           |$pps,
           |c AS ($perM)
           |SELECT CAST(m AS BIGINT) AS m,
           |  CAST(n_prior AS BIGINT) AS n_prior,
           |  CAST(n_neg AS BIGINT) AS n_neg,
           |  CAST(n_fp AS BIGINT) AS n_fp,
           |  (1000 * CAST(n_fp AS BIGINT)) //
           |    greatest(CAST(n_neg AS BIGINT), 1) AS fp_milli,
           |  (1000 * CAST(m AS BIGINT)) //
           |    greatest(CAST(n_prior AS BIGINT), 1)
           |    AS bits_per_key_milli
           |FROM c""".stripMargin
      })
  )
}
