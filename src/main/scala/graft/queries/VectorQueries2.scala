package graft.queries

import graft.Tables
import graft.ops.VectorSearch.{cosine, dot, sq8Approx, toDouble}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second similarity-search group: scalar-quantized (SQ8) ANN — the
  * remaining rung of the compression ladder between raw floats and
  * product quantization (q85/q89): 1 byte per DIMENSION (4× smaller
  * than float32, ~8× larger than PQ's 1 byte per SUBSPACE) with far
  * better per-vector fidelity than PQ, which is why int8 quantization
  * is the default first step in production vector stores.
  *
  * q223 adds the FINAL rung: binary sign quantization — 1 BIT per
  * dimension, so the whole 64-dim vector is ONE long and candidate
  * scoring is a single `bit_count(xor)` (the cheapest similarity
  * computable on any hardware; 256× smaller than float32). This is
  * the shape billion-vector stores scan first precisely because the
  * Hamming pass is memory-bandwidth-bound, then a tiny exact re-rank
  * restores fidelity.
  */
object VectorQueries2 {

  private val Dims = 64

  /** (vec_id, v, sig): the corpus with its q223 binary signature —
    * per-dim midpoint thresholds from one exact min/max aggregation,
    * 64 bits OR-reduced into one long. One definition serves q223's
    * ANN and q243's calibration curve.
    */
  private def signedFrame(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .localCheckpoint() // stats agg + encode share it
    val statCols =
      (1 to Dims).map(d => min(element_at(col("v"), d)).as(s"mn$d")) ++
        (1 to Dims).map(d => max(element_at(col("v"), d)).as(s"mx$d"))
    val mids = e.agg(statCols.head, statCols.tail: _*)
      .select(array((1 to Dims).map(d =>
        (col(s"mn$d") + col(s"mx$d")) / 2.0): _*).as("mid"))
    val sig = (0 until Dims).map(i =>
      when(element_at(col("v"), i + 1) > element_at(col("mid"), i + 1),
        lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    e.crossJoin(broadcast(mids))
      .select(col("vec_id"), col("v"), sig.as("sig"))
  }

  /** DuckDB twin of [[signedFrame]]: `e`/`st`/`se(vec_id, v, sig)`
    * CTEs (caller supplies `WITH`). 1L << 63 has no direct BIGINT
    * literal in DuckDB (`<<` overflows, -9223372036854775808 parses
    * HUGEINT) — bit 63 is spelled arithmetically.
    */
  private def signedCtes: String = {
    val midList = (1 to Dims)
      .map(d => s"(min(v[$d]) + max(v[$d])) / 2.0")
      .mkString("[", ", ", "]")
    def bitLit(i: Int): String =
      if (i == 63) "(-9223372036854775807 - 1)::BIGINT"
      else s"${1L << i}::BIGINT"
    val sigSql = (0 until Dims).map(i =>
      s"(CASE WHEN v[${i + 1}] > mid[${i + 1}] THEN ${bitLit(i)} " +
        "ELSE 0::BIGINT END)").mkString(" | ")
    s"""e AS (SELECT vec_id, $vSql AS v FROM embeddings),
       |st AS (SELECT $midList AS mid FROM e),
       |se AS (SELECT vec_id, v, $sigSql AS sig FROM e CROSS JOIN st)"""
      .stripMargin
  }

  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private def cosSql(a: String, b: String): String =
    VectorOracleSql.cos(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  val defs: Seq[QDef] = Seq(

    // SQ8 scalar-quantized ANN: per-dimension [min, max] corpus ranges
    // (ONE aggregation pass — min/max are exact selections, no float
    // accumulation, so the trained ranges need no late-bound oracle),
    // 8-bit codes with midpoint dequantization ranked against the
    // query (the fused codegen kernel computes exactly what ranking
    // against stored int8 codes computes), 50-candidate shortlist,
    // exact cosine re-rank — the q85 two-stage shape. At 100 TB the
    // scanned corpus is 4× smaller than raw float32 embeddings with
    // near-exact ranking fidelity (measured here: recall@10 = 10/10 vs
    // exact, where PQ's 8-byte codes reach 8/10 — the
    // compression/fidelity dial these three queries span); both
    // ranking stages are no-shuffle TakeOrdered, and the stats row
    // rides along as a broadcast.
    QDef("q94_ann_sq8",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // checkpointed: feeds the stats agg, the scan, and the re-rank
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .localCheckpoint()
        val statCols =
          (1 to Dims).map(d => min(element_at(col("v"), d)).as(s"mn$d")) ++
            (1 to Dims).map(d => max(element_at(col("v"), d)).as(s"mx$d"))
        val stats = e.agg(statCols.head, statCols.tail: _*)
          .select(
            array((1 to Dims).map(d => col(s"mn$d")): _*).as("mn"),
            array((1 to Dims).map(d => col(s"mx$d")): _*).as("mx"))
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val short = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(stats))
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(sq8Approx(col("v"), col("mn"), col("mx")),
              col("qv")), 6).as("approx_sim"))
          .orderBy(col("approx_sim").desc, col("vec_id").asc)
          .limit(50)
          .select(col("vec_id"))
        short.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some {
        val mnList = (1 to Dims).map(d => s"min(v[$d])").mkString("[", ", ", "]")
        val mxList = (1 to Dims).map(d => s"max(v[$d])").mkString("[", ", ", "]")
        // x[1]=v, x[2]=mn, x[3]=mx — the kernel's parenthesization
        val approx = "list_transform(list_zip(v, st.mn, st.mx), x -> " +
          "CASE WHEN x[3] = x[2] THEN x[2] ELSE " +
          "x[2] + ((least(greatest(floor(((x[1] - x[2]) * 255.0) / " +
          "(x[3] - x[2])), 0.0), 255.0) + 0.5) * " +
          "((x[3] - x[2]) / 255.0)) END)"
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
           |st AS (SELECT $mnList AS mn, $mxList AS mx FROM e),
           |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
           |a AS (SELECT vec_id, $approx AS approx
           |      FROM e CROSS JOIN st WHERE vec_id <> 0),
           |s AS (SELECT vec_id, round(${cosSql("approx", "qv")}, 6)
           |        AS approx_sim FROM a, q),
           |short AS (SELECT vec_id FROM s
           |          ORDER BY approx_sim DESC, vec_id ASC LIMIT 50),
           |x AS (SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
           |      FROM e JOIN short USING (vec_id), q)
           |SELECT vec_id, sim,
           |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
           |FROM x ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
      }),

    // Johnson-Lindenstrauss sign random projection: 64 -> 16 dims via
    // a seeded ±1 matrix (md5-parity, a plan-time constant — the q31
    // hyperplane pattern), then recall@10 of projected-space cosine
    // ranking vs full-space exact, per query. This is the missing
    // DIMENSION-reduction rung of the compression ladder (SQ8/PQ
    // compress per-dimension precision; RP cuts the dimension count —
    // 4x fewer floats with no training step at all). Projections ride
    // the corpus scan through the codegen'd dot kernel (16 kernel
    // calls, not a 1000-node expression tree — the q85 Janino
    // lesson); both rankings run through the partial/final TopK
    // operator, so no per-query window ever sees the corpus, and one
    // scored pass feeds both (checkpointed). Measured recall@10 on
    // THIS corpus is 0-2/10: near-uniform vectors separate top-10
    // neighbors by cosine gaps far below the JL distortion at r=16 —
    // the same no-free-structure property PLANS.md records for IVF
    // (q30) and PQ (q85). The audit reporting that honestly is the
    // point; r is the dial, and the oracle replays any r.
    QDef("q188_rp_recall",
      (s, dir) => {
        val R = 16
        val signs: Seq[Seq[Double]] = (0 until R).map(j =>
          (0 until Dims).map(i =>
            if ((graft.functions.TextAnalysis.md5Hex8(s"rp:$j:$i") & 1L)
              == 0L) 1.0 else -1.0))
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .withColumn("p",
            array(signs.map(sr => dot(col("v"), typedLit(sr))): _*))
          .localCheckpoint() // query rows + corpus scan share it
        val qs = broadcast(e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"), col("v").as("qv"),
            col("p").as("qp")))
        val scored = e.filter(col("vec_id") >= 4).crossJoin(qs)
          .select(col("query_id"), col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim_full"),
            round(cosine(col("p"), col("qp")), 6).as("sim_rp"))
          .localCheckpoint() // both top-k passes share one scoring pass
        def top10(simCol: String): DataFrame =
          graft.ops.TopK.perGroup(scored, "query_id",
            struct((-col(simCol)).as("ns"), col("vec_id").as("id")), 10)
            .select(col("query_id"), col("key.id").as("vec_id"))
        val overlap = top10("sim_full")
          .join(broadcast(top10("sim_rp")), Seq("query_id", "vec_id"),
            "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("no"))
        qs.select(col("query_id"))
          .join(broadcast(overlap), Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("no"), lit(0L)).as("n_overlap"))
          .withColumn("recall_milli", expr("(1000 * n_overlap) div 10"))
      },
      Some {
        val projs = (0 until 16).map { j =>
          val sl = (0 until Dims).map(i =>
            if ((graft.functions.TextAnalysis.md5Hex8(s"rp:$j:$i") & 1L)
              == 0L) "1.0" else "-1.0").mkString("[", ", ", "]")
          dotSql("v", sl)
        }.mkString("[", ",\n      ", "]")
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
           |pe AS (SELECT vec_id, v, $projs AS p FROM e),
           |q AS (SELECT vec_id AS query_id, v AS qv, p AS qp
           |  FROM pe WHERE vec_id < 4),
           |sc AS (SELECT query_id, pe.vec_id,
           |    round(${cosSql("pe.v", "qv")}, 6) AS sim_full,
           |    round(${cosSql("pe.p", "qp")}, 6) AS sim_rp
           |  FROM pe, q WHERE pe.vec_id >= 4),
           |tf AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id, row_number() OVER (
           |      PARTITION BY query_id
           |      ORDER BY sim_full DESC, vec_id ASC) AS rn FROM sc) x
           |  WHERE rn <= 10),
           |tr AS (SELECT query_id, vec_id FROM (
           |    SELECT query_id, vec_id, row_number() OVER (
           |      PARTITION BY query_id
           |      ORDER BY sim_rp DESC, vec_id ASC) AS rn FROM sc) y
           |  WHERE rn <= 10),
           |o AS (SELECT tf.query_id, count(*) AS n_overlap
           |  FROM tf JOIN tr USING (query_id, vec_id) GROUP BY 1)
           |SELECT q.query_id,
           |  CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
           |  (1000 * CAST(coalesce(o.n_overlap, 0) AS BIGINT)) // 10
           |    AS recall_milli
           |FROM q LEFT JOIN o ON o.query_id = q.query_id""".stripMargin
      }),

    // Binary sign quantization ANN: bit i = (v[i] > per-dim corpus
    // midpoint), packed into ONE long (64 dims), candidates ranked by
    // Hamming distance bit_count(sig XOR qsig), 50-shortlist + exact
    // cosine re-rank (the q94 two-stage shape). Thresholds come from
    // the same exact min/max aggregation as SQ8 — no float
    // accumulation, so the oracle replays them in closed form. The
    // signature is a 64-term when-chain OR-reduced (codegen'd; bitwise
    // OR, not +, so no overflow arithmetic anywhere near the sign
    // bit). At 100 TB this is the scan-stage everything else rides
    // on: 8 bytes/vector means the Hamming pass streams the whole
    // corpus at memory bandwidth, and the re-rank touches 50 raw
    // vectors; both ranking stages are no-shuffle TakeOrdered.
    QDef("q223_ann_binary",
      (s, dir) => {
        val signed = signedFrame(s, dir)
          .localCheckpoint() // query row + Hamming scan + re-rank
        val q = broadcast(signed.filter(col("vec_id") === 0)
          .select(col("sig").as("qsig"), col("v").as("qv")))
        val short = signed.filter(col("vec_id") =!= 0)
          .crossJoin(q)
          .select(col("vec_id"),
            bit_count(col("sig").bitwiseXOR(col("qsig"))).as("ham"))
          .orderBy(col("ham").asc, col("vec_id").asc)
          .limit(50)
          .select(col("vec_id"))
        short.join(signed, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some {
        s"""WITH $signedCtes,
           |q AS (SELECT sig AS qsig, v AS qv FROM se WHERE vec_id = 0),
           |h AS (SELECT vec_id, bit_count(xor(sig, qsig)) AS ham
           |      FROM se, q WHERE vec_id <> 0),
           |short AS (SELECT vec_id FROM h
           |          ORDER BY ham ASC, vec_id ASC LIMIT 50),
           |x AS (SELECT se.vec_id, round(${cosSql("se.v", "qv")}, 6)
           |        AS sim
           |      FROM se JOIN short USING (vec_id), q)
           |SELECT vec_id, sim,
           |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
           |FROM x ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin
      }),

    // Hamming-vs-cosine calibration: mean exact cosine per Hamming-
    // distance bucket over a BOUNDED deterministic pair sample (128
    // hash-ordered vectors split 64×64 — 4096 pairs at ANY corpus
    // size, the audit is O(1) in the corpus). This is the table that
    // says how much ranking signal the 1-bit signature carries here —
    // i.e. why q223's exact re-rank is load-bearing on near-uniform
    // data, stated by measurement. Cosines micro-quantize per pair
    // before the mean (exact integer sums; negative-safe div per the
    // q220 finding).
    QDef("q243_hamming_cosine_curve",
      (s, dir) => {
        val withH = signedFrame(s, dir)
          .withColumn("hs", graft.functions.TextAnalysis.tokenHash(
            concat(lit("hp:"), col("vec_id").cast("string"))))
          .orderBy(col("hs"), col("vec_id")).limit(128)
          .withColumn("r", row_number().over(
            Window.orderBy(col("hs"), col("vec_id"))) - 1)
          .localCheckpoint() // both halves of the pair grid read it
        val aH = withH.filter(col("r") < 64)
          .select(col("v").as("va"), col("sig").as("sa"))
        val bH = withH.filter(col("r") >= 64)
          .select(col("v").as("vb"), col("sig").as("sb"))
        aH.crossJoin(bH)
          .select(
            (bit_count(col("sa").bitwiseXOR(col("sb"))) / lit(4))
              .cast("long").as("hamming_bucket"),
            floor(lit(1000000.0) * cosine(col("va"), col("vb")))
              .cast("long").as("cm"))
          .groupBy("hamming_bucket")
          .agg(count(lit(1)).as("n_pairs"), sum("cm").as("sc"))
          .select(col("hamming_bucket"), col("n_pairs"),
            expr("sc div n_pairs").as("mean_cos_micro"))
      },
      Some {
        val hSql = "cast('0x' || substr(md5('hp:' || " +
          "CAST(vec_id AS VARCHAR)), 1, 8) as bigint)"
        s"""WITH $signedCtes,
           |rk AS (SELECT vec_id, v, sig, row_number() OVER (
           |    ORDER BY $hSql, vec_id) - 1 AS r FROM se),
           |a AS (SELECT v AS va, sig AS sa FROM rk WHERE r < 64),
           |b AS (SELECT v AS vb, sig AS sb FROM rk
           |      WHERE r >= 64 AND r < 128),
           |pr AS (SELECT bit_count(xor(sa, sb)) // 4 AS hamming_bucket,
           |    CAST(floor(1000000.0 * ${cosSql("va", "vb")}) AS BIGINT)
           |      AS cm
           |  FROM a CROSS JOIN b)
           |SELECT CAST(hamming_bucket AS BIGINT) AS hamming_bucket,
           |  CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(CAST(sum(cm) AS BIGINT) // count(*) AS BIGINT)
           |    AS mean_cos_micro
           |FROM pr GROUP BY 1""".stripMargin
      }),

    // Matryoshka truncation recall: recall@10 of PREFIX-dimension
    // cosine ranking (r = 8/16/32 of 64) vs the full-space exact
    // ranking — the decision table for Matryoshka-style tiered
    // retrieval (truncate stored vectors, re-rank survivors at full
    // width). Complements q180 (which measures prefix ENERGY — how
    // much norm the prefix holds) with the retrieval-quality number
    // that actually gates the decision, and q188 (random projection —
    // no training assumption) with the learned-prefix variant. Same
    // plan skeleton as q188: one scored pass (4 codegen'd cosines per
    // row) checkpointed, windowless TopK rankings, overlap by semi
    // join; on THIS near-uniform corpus expect the documented
    // no-free-structure recall floor — the audit states it by data.
    QDef("q231_matryoshka_recall",
      (s, dir) => {
        val rs = Seq(8, 16, 32)
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val qs = broadcast(e.filter(col("vec_id") < 4)
          .select(col("vec_id").as("query_id"), col("v").as("qv")))
        val scored = e.filter(col("vec_id") >= 4).crossJoin(qs)
          .select(Seq(col("query_id"), col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim_full")) ++
            rs.map(r => round(cosine(slice(col("v"), 1, r),
              slice(col("qv"), 1, r)), 6).as(s"sim_$r")): _*)
          .localCheckpoint() // all four top-k passes share one scoring
        def top10(simCol: String) =
          graft.ops.TopK.perGroup(scored, "query_id",
            struct((-col(simCol)).as("ns"), col("vec_id").as("id")), 10)
            .select(col("query_id"), col("key.id").as("vec_id"))
        val full = top10("sim_full").localCheckpoint() // 3 overlap probes
        val perR = rs.map { r =>
          full.join(broadcast(top10(s"sim_$r")),
              Seq("query_id", "vec_id"), "left_semi")
            .groupBy("query_id").agg(count(lit(1)).as("no"))
            .select(lit(r.toLong).as("prefix_dims"), col("query_id"),
              col("no"))
        }.reduce(_ unionAll _)
        qs.select(col("query_id"))
          .crossJoin(broadcast(
            s.range(0, 1).select(explode(
              array(rs.map(r => lit(r.toLong)): _*)).as("prefix_dims"))))
          .join(broadcast(perR), Seq("prefix_dims", "query_id"), "left")
          .select(col("prefix_dims"), col("query_id"),
            coalesce(col("no"), lit(0L)).as("n_overlap"))
          .withColumn("recall_milli", expr("(1000 * n_overlap) div 10"))
      },
      Some {
        val simCols = Seq(8, 16, 32).map(r =>
          s"round(${cosSql(s"list_slice(pe.v, 1, $r)",
            s"list_slice(qv, 1, $r)")}, 6) AS sim_$r").mkString(",\n    ")
        val tops = (Seq("full") ++ Seq(8, 16, 32).map(_.toString)).map { r =>
          val c = if (r == "full") "sim_full" else s"sim_$r"
          s"""t$r AS (SELECT query_id, vec_id FROM (
             |    SELECT query_id, vec_id, row_number() OVER (
             |      PARTITION BY query_id
             |      ORDER BY $c DESC, vec_id ASC) AS rn FROM sc) x$r
             |  WHERE rn <= 10)""".stripMargin
        }.mkString(",\n")
        s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
           |q AS (SELECT vec_id AS query_id, v AS qv FROM e
           |      WHERE vec_id < 4),
           |sc AS (SELECT query_id, pe.vec_id,
           |    round(${cosSql("pe.v", "qv")}, 6) AS sim_full,
           |    $simCols
           |  FROM e pe, q WHERE pe.vec_id >= 4),
           |$tops,
           |o AS (SELECT 8 AS prefix_dims, tfull.query_id,
           |        count(*) AS no
           |      FROM tfull JOIN t8 USING (query_id, vec_id) GROUP BY 2
           |      UNION ALL
           |      SELECT 16, tfull.query_id, count(*)
           |      FROM tfull JOIN t16 USING (query_id, vec_id) GROUP BY 2
           |      UNION ALL
           |      SELECT 32, tfull.query_id, count(*)
           |      FROM tfull JOIN t32 USING (query_id, vec_id) GROUP BY 2),
           |grid AS (SELECT r AS prefix_dims, query_id
           |         FROM q CROSS JOIN (SELECT unnest([8, 16, 32]) AS r))
           |SELECT CAST(g.prefix_dims AS BIGINT) AS prefix_dims,
           |  g.query_id,
           |  CAST(coalesce(o.no, 0) AS BIGINT) AS n_overlap,
           |  (1000 * CAST(coalesce(o.no, 0) AS BIGINT)) // 10
           |    AS recall_milli
           |FROM grid g LEFT JOIN o
           |  ON o.prefix_dims = g.prefix_dims
           |  AND o.query_id = g.query_id""".stripMargin
      }),

    // Per-dimension moment audit — the whitening/anisotropy check run
    // before trusting cosine at corpus scale: per dimension, the mean
    // and variance of the corpus distribution (dead dims, dominant
    // dims, mean offsets — each distorts cosine differently), plus
    // each dimension's share of total variance. Components quantize
    // to integer MICRO units before aggregation (the q106 discipline:
    // partition-order-free exact long sums); the variance uses
    // floor-division moments (E[x²]−E[x]², both floored) so every
    // intermediate stays under ~2e16 at any corpus size — no squared
    // corpus-sum term (the q220 overflow class is avoided by
    // dividing BEFORE multiplying).
    QDef("q233_dim_moments",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(toDouble(col("embedding")).as("v"))
        def qd(d: Int) =
          s"CAST(floor(element_at(v, $d) * 1000000.0) AS BIGINT)"
        val sums = (1 to Dims).flatMap(d => Seq(
          sum(expr(qd(d))).as(s"s$d"),
          sum(expr(s"(${qd(d)} * ${qd(d)}) div 1000000")).as(s"ss$d")))
          .:+(count(lit(1)).as("n"))
        val agg = e.agg(sums.head, sums.tail: _*)
        val rows = agg.select(explode(array((1 to Dims).map(d =>
          struct(lit(d.toLong).as("dim"),
            expr(s"s$d div n").as("mean_micro"),
            expr(s"ss$d div n - ((s$d div n) * (s$d div n)) div 1000000")
              .as("var_micro"))): _*)).as("p"))
          .select(col("p.dim"), col("p.mean_micro"), col("p.var_micro"))
          .localCheckpoint() // total-variance probe reads it twice
        rows.crossJoin(broadcast(
            rows.agg(sum("var_micro").as("tv"))))
          .select(col("dim"), col("mean_micro"), col("var_micro"),
            expr("(1000 * var_micro) div greatest(tv, 1L)")
              .as("var_share_milli"))
      },
      Some {
        val terms = (1 to Dims).map(d =>
          s"""SELECT $d AS dim,
             |  CAST(sum(CAST(floor(v[$d] * 1000000.0) AS BIGINT))
             |    AS BIGINT) AS s,
             |  CAST(sum((CAST(floor(v[$d] * 1000000.0) AS BIGINT) *
             |    CAST(floor(v[$d] * 1000000.0) AS BIGINT)) // 1000000)
             |    AS BIGINT) AS ss,
             |  count(*) AS n
             |FROM e""".stripMargin).mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT $vSql AS v FROM embeddings),
           |m AS ($terms),
           |r AS (SELECT CAST(dim AS BIGINT) AS dim,
           |    s // n AS mean_micro,
           |    ss // n - ((s // n) * (s // n)) // 1000000 AS var_micro
           |  FROM m),
           |tv AS (SELECT CAST(sum(var_micro) AS BIGINT) AS tv FROM r)
           |SELECT dim, CAST(mean_micro AS BIGINT) AS mean_micro,
           |  CAST(var_micro AS BIGINT) AS var_micro,
           |  CAST((1000 * var_micro) // greatest(tv, 1) AS BIGINT)
           |    AS var_share_milli
           |FROM r CROSS JOIN tv""".stripMargin
      }),

    // Graph ANN, NSW-style (Malkov & Yashunin's navigable small
    // world, re-expressed as bounded-round joins — the
    // pointer-chasing beam search HNSW runs on one machine becomes a
    // FIXED number of expand-score-prune rounds, each one broadcast
    // join; see ops/NswIndex). Build: multiprobe k-means cells bound
    // the neighbor candidates (the q197 Σ cell² join — multiprobe is
    // what threads edges ACROSS cell borders and makes the graph
    // navigable), top-6 neighbors per node, symmetrized. Search:
    // beam 12, 3 rounds, entries = each probed query cell's min-id
    // resident (+ the global min id as the never-empty fallback);
    // candidate budget ≈ entries + rounds·beam·m scored vectors —
    // independent of corpus size, vs IVF-probe's fixed FRACTION of
    // the corpus. Every ranking orders by (round(cos,6) DESC, id) so
    // the DuckDB oracle replays build + all three rounds exactly
    // from centroid literals (late oracle, the q30 pattern).
    // Measured recall@10 vs exact: AnnRecallSpec (uniform corpus
    // floor) and VectorSearchSpec (clustered fixture, ≥ IVF at a
    // smaller candidate budget).
    QDef("q257_ann_nsw",
      (s, dir) => {
        import graft.ops.VectorSearch._
        import graft.ops.NswIndex
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        // ONE cap value feeds build AND oracle (conf-overridable so
        // the capped-verify lane can make the salt bind at sf0.1)
        val cap = NswIndex.effectiveBlockCap(s)
        NswOracle.sql = Some(nswOracleSql(cents, probes = NswProbes,
          m = NswM, beam = NswBeam, rounds = NswRounds, topK = 10,
          cap = cap))
        val corpus = emb.filter(col("vec_id") =!= 0)
        val assign = ivfAssign(corpus, "vec_id", "embedding", cents,
          probes = NswProbes).localCheckpoint() // graph build + entries
        // artifact-addressed: with a configured root (Verify/Bench)
        // the first builder commits the edge table and later callers
        // over the same corpus (q358's serving twin) read parquet —
        // already materialized, so only the inline shape checkpoints
        val edgesRaw = NswIndex.knnGraphArtifact(corpus, "vec_id",
          "embedding", cents, probes = NswProbes, m = NswM,
          blockCap = cap, fpKey = s"$dir#embeddings#ne0",
          assignOpt = Some(assign))
        val edges = if (graft.ops.ArtifactStore.root(s).isEmpty)
          edgesRaw.localCheckpoint() else edgesRaw
        val vecs = corpus
          .select(col("vec_id").cast("long").as("id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", graft.ops.VectorSearch.norm(col("v")))
          .localCheckpoint() // entry scoring + every round reads it
        val qv = emb.filter(col("vec_id") === 0)
          .select(toDouble(col("embedding")).as("qv"))
          .withColumn("qn", graft.ops.VectorSearch.norm(col("qv")))
        val qCells = ivfAssign(emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", cents, probes = NswProbes)
          .select(col("cell"))
        val entries = assign.join(broadcast(qCells), "cell")
          .groupBy("cell").agg(min("id").as("id")).select(col("id"))
          .unionByName(assign.agg(min("id").as("id")))
          .distinct()
        NswIndex.beamSearch(vecs, edges, qv, entries,
            beamWidth = NswBeam, rounds = NswRounds)
          .orderBy(col("sim").desc, col("id").asc).limit(10)
          .select(col("id").as("vec_id"), col("sim"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      None,
      Some(() => NswOracle.sql)),

    // q257's graph ANN in its SERVING shape: one shared index probed
    // by a query BATCH (every 100th vector), all beams advanced
    // together — a per-query driver loop would pay `rounds` Spark
    // jobs PER query; here the whole batch costs the same number of
    // joins as ONE q257 search. The (qid, id) beam frame is always
    // the broadcast side (O(batch·beam) rows), the query batch
    // broadcasts into each score join, and the per-qid prune is the
    // partial/final TopK aggregation — never a corpus-wide window.
    // Candidate budget: batch · (entries + rounds·beam·m) scored
    // rows, corpus-size-independent and linear in the batch. Oracle:
    // the q257 replay with every beam stage PARTITION BY qid.
    QDef("q259_ann_nsw_batch",
      (s, dir) => {
        import graft.ops.VectorSearch._
        import graft.ops.NswIndex
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        val cap = NswIndex.effectiveBlockCap(s)
        NswBatchOracle.sql = Some(nswBatchOracleSql(cents,
          probes = NswProbes, m = NswM, beam = NswBeam,
          rounds = NswRounds, topK = 10, cap = cap))
        val isQ = col("vec_id") % 100 === 0
        val corpus = emb.filter(!isQ)
        val assign = ivfAssign(corpus, "vec_id", "embedding", cents,
          probes = NswProbes).localCheckpoint() // graph build + entries
        // artifact-addressed (see q257): q358 serves what this commits
        val edgesRaw = NswIndex.knnGraphArtifact(corpus, "vec_id",
          "embedding", cents, probes = NswProbes, m = NswM,
          blockCap = cap, fpKey = s"$dir#embeddings#mod100ne0",
          assignOpt = Some(assign))
        val edges = if (graft.ops.ArtifactStore.root(s).isEmpty)
          edgesRaw.localCheckpoint() else edgesRaw
        val vecs = corpus
          .select(col("vec_id").cast("long").as("id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", graft.ops.VectorSearch.norm(col("v")))
          .localCheckpoint() // entry scoring + every round reads it
        val queries = emb.filter(isQ)
          .select(col("vec_id").cast("long").as("qid"),
            toDouble(col("embedding")).as("qv"))
          .withColumn("qn", graft.ops.VectorSearch.norm(col("qv")))
          .localCheckpoint() // broadcast into every round's score join
        val qAssign = ivfAssign(emb.filter(isQ), "vec_id", "embedding",
          cents, probes = NswProbes)
        val cellMin = assign.groupBy("cell").agg(min("id").as("id"))
        val globalMin = assign.agg(min("id").as("id"))
        val entries = qAssign.select(col("id").as("qid"), col("cell"))
          .join(broadcast(cellMin), "cell")
          .select(col("qid"), col("id"))
          .unionByName(queries.select(col("qid"))
            .crossJoin(broadcast(globalMin)))
          .distinct()
        NswIndex.beamSearchBatch(vecs, edges, queries, entries,
            beamWidth = NswBeam, rounds = NswRounds)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("sim").desc, col("id").asc)))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("id").as("vec_id"), col("sim"),
            col("rank"))
      },
      None,
      Some(() => NswBatchOracle.sql)),

    // q259's batch ANN in its STEADY-STATE serving shape (r12 verdict
    // #1): the kNN edge table and the entry cell map are write-once
    // ARTIFACTS (ops/ArtifactStore) — with a configured root this
    // query never runs a graph-build stage: it fingerprints the corpus
    // (one column-pruned scan, session-memoized), reads the committed
    // parquet q259 wrote earlier in the sweep, and spends its whole
    // budget on the beam rounds. Same rows as q259 bit-for-bit
    // (Pipeline71Spec pins it); the bench line therefore shows build
    // (q259) and serve (this) side by side at every SF — the
    // operating-model split the 100 TB brief asks for. With no root
    // configured it falls back to the inline build, output unchanged.
    QDef("q358_ann_nsw_served",
      (s, dir) => {
        import graft.ops.NswIndex
        val sc = nswServedScaffold(s, dir)
        NswServedOracle.sql = Some(nswBatchOracleSql(sc.cents,
          probes = NswProbes, m = NswM, beam = NswBeam,
          rounds = NswRounds, topK = 10, cap = sc.cap))
        NswIndex.beamSearchBatch(sc.vecs, sc.edges, sc.queries,
            sc.entries, beamWidth = NswBeam, rounds = NswRounds)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("sim").desc, col("id").asc)))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("id").as("vec_id"), col("sim"),
            col("rank"))
      },
      None,
      Some(() => NswServedOracle.sql)),

    // Entry-SEEDED served NSW (the r14 verdict #8c frontier — q376's
    // multi-probe instinct applied at the entry stage): before the
    // first beam round, each query's entry set is widened by the
    // entries' 1-hop graph neighbors, so round 0 ranks over
    // entries + their neighborhoods instead of the bare per-cell
    // minima — one extra broadcast join against the served edge
    // artifact (entry sets are O(probes) rows per query), zero extra
    // index storage, and the same beam budget afterwards. Shares
    // q358's artifacts (edge table, entry-cell map) so within a sweep
    // it is a pure serve; oracle = the batch replay with the seeding
    // replayed literally (seedHop). AnnRecallSpec re-measures the
    // recall floor against q358's.
    QDef("q392_ann_nsw_seeded",
      (s, dir) => {
        import graft.ops.NswIndex
        // cpEdgesInline: the seeding joins the edge table twice (1-hop
        // expansion + every beam round) — inline it must not re-run
        // the build
        val sc = nswServedScaffold(s, dir, cpEdgesInline = true)
        NswSeededOracle.sql = Some(nswBatchOracleSql(sc.cents,
          probes = NswProbes, m = NswM, beam = NswBeam,
          rounds = NswRounds, topK = 10, cap = sc.cap, seedHop = true))
        // the seeding: entries ∪ their 1-hop neighbors (the edge table
        // is symmetrized, so dst-of-src covers the whole neighborhood)
        val seeded = sc.entries.unionByName(
            sc.edges.join(
              broadcast(sc.entries.withColumnRenamed("id", "src")),
              "src")
              .select(col("qid"), col("dst").as("id")))
          .distinct()
        NswIndex.beamSearchBatch(sc.vecs, sc.edges, sc.queries, seeded,
            beamWidth = NswBeam, rounds = NswRounds)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("qid"))
              .orderBy(col("sim").desc, col("id").asc)))
          .filter(col("rank") <= 10)
          .select(col("qid"), col("id").as("vec_id"), col("sim"),
            col("rank"))
      },
      None,
      Some(() => NswSeededOracle.sql)),

    // HNSW-style LAYERED graph ANN (r12 verdict frontier (b)): q257's
    // flat NSW graph gains a coarse top layer — a deterministic ~25%
    // node subset (geometric level by the house hash, the Malkov &
    // Yashunin draw made replayable) with its own salt-capped kNN
    // graph. Search descends: beam over the top layer from its min-id
    // entry (2 rounds over a 4× sparser graph), then the surviving
    // beam SEEDS the full layer-0 search — the coarse-to-fine entry
    // ladder that replaces per-cell entry election and is how graph
    // ANN keeps round counts flat as n grows (more layers, not more
    // rounds). Both layer graphs are artifact-addressed; layer 0 is
    // the SAME artifact q257 commits. Oracle: the full two-layer
    // replay from centroid literals — membership hash, both salted
    // builds, every beam stage MATERIALIZED.
    QDef("q362_ann_hnsw",
      (s, dir) => {
        import graft.ops.VectorSearch._
        import graft.ops.{ArtifactStore, NswIndex}
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        val cap = NswIndex.effectiveBlockCap(s)
        NswHnswOracle.sql = Some(hnswOracleSql(cents, probes = NswProbes,
          m = NswM, beam = NswBeam, topRounds = HnswTopRounds,
          rounds = NswRounds, topK = 10, cap = cap))
        val corpus = emb.filter(col("vec_id") =!= 0)
        val lvl1 = corpus.filter(NswIndex.atLevel(col("vec_id"), 1))
        def cp(df: org.apache.spark.sql.DataFrame) =
          if (ArtifactStore.root(s).isEmpty) df.localCheckpoint() else df
        val edges1 = cp(NswIndex.knnGraphArtifact(lvl1, "vec_id",
          "embedding", cents, probes = NswProbes, m = NswM,
          blockCap = cap, fpKey = s"$dir#embeddings#ne0lvl1"))
        val edges0 = cp(NswIndex.knnGraphArtifact(corpus, "vec_id",
          "embedding", cents, probes = NswProbes, m = NswM,
          blockCap = cap,
          fpKey = s"$dir#embeddings#ne0")) // q257's artifact, shared
        val vecs = corpus
          .select(col("vec_id").cast("long").as("id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", graft.ops.VectorSearch.norm(col("v")))
          .localCheckpoint() // both layers' scoring reads it
        val qv = emb.filter(col("vec_id") === 0)
          .select(toDouble(col("embedding")).as("qv"))
          .withColumn("qn", graft.ops.VectorSearch.norm(col("qv")))
        val entry1 = lvl1.agg(min(col("vec_id")).cast("long").as("id"))
        val beam1 = NswIndex.beamSearch(vecs, edges1, qv, entry1,
          beamWidth = NswBeam, rounds = HnswTopRounds)
        NswIndex.beamSearch(vecs, edges0, qv, beam1.select(col("id")),
            beamWidth = NswBeam, rounds = NswRounds)
          .orderBy(col("sim").desc, col("id").asc).limit(10)
          .select(col("id").as("vec_id"), col("sim"))
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      None,
      Some(() => NswHnswOracle.sql)),

    // Graph ANN served from a PQ-COMPRESSED vector artifact (r13
    // verdict frontier (b)): q358's serve path still re-reads the raw
    // doubles every beam round; here the round-scoring corpus is a
    // write-once `nsw_pq_codes` artifact — vec_id + 8 one-byte codes,
    // ~32× smaller than the embeddings — reconstructed ON THE FLY
    // (per-row codegen arithmetic) inside each round's bounded
    // broadcast lookup, and only the FINAL beam pays raw-vector point
    // lookups for the exact cosine re-rank (the q85 two-stage shape
    // grafted onto the q257 traversal). At 100 TB that is the
    // difference between a serve tier whose working set fits in RAM
    // and one that pages the full fp64 corpus every query. Graph +
    // entry map + codes are all artifacts (the graph is q257's,
    // shared); with no root everything builds inline, rows unchanged.
    // Oracle: full replay — salted graph build from centroid
    // literals, PQ encode from codebook literals (bit-identical codes,
    // the q85 contract), every beam stage scored on RECONSTRUCTED
    // vectors, exact re-rank from raw.
    QDef("q372_ann_nsw_pq_served",
      (s, dir) => {
        import graft.ops.VectorSearch._
        import graft.ops.{ArtifactStore, NswIndex}
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        val codebook = pqTrain(sample, m = 8, k = 16, iters = 10,
          seed = 42)
        val cap = NswIndex.effectiveBlockCap(s)
        PqNswOracle.sql = Some(pqNswOracleSql(cents, codebook,
          probes = NswProbes, m = NswM, beam = NswBeam,
          rounds = NswRounds, topK = 10, cap = cap))
        val corpus = emb.filter(col("vec_id") =!= 0)
        val fpKey = s"$dir#embeddings#ne0"
        def cp(df: DataFrame) =
          if (ArtifactStore.root(s).isEmpty) df.localCheckpoint() else df
        def artifactOr(name: String, params: String)(b: => DataFrame) =
          if (ArtifactStore.root(s).isEmpty) cp(b)
          else ArtifactStore.buildOrServe(s, name,
            ArtifactStore.fingerprint(
              corpus.select(col("vec_id"), col("embedding")), fpKey),
            params, fpKey)(b)
        val edges = cp(NswIndex.knnGraphArtifact(corpus, "vec_id",
          "embedding", cents, probes = NswProbes, m = NswM,
          blockCap = cap, fpKey = fpKey)) // q257's artifact, shared
        val cbh = ArtifactStore.contentHash(
          codebook.map(_.map(_.mkString(",")).mkString(";")).mkString("|"))
        val codes = artifactOr("nsw_pq_codes", s"cb=$cbh,m=8,k=16")(
          corpus.select(col("vec_id"),
              pqEncodeKernel(toDouble(col("embedding")), codebook)
                .as("codes"))
            .select(col("vec_id") +: (0 until 8)
              .map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*))
        val ch = ArtifactStore.contentHash(
          cents.map(_.mkString(",")).mkString("|"))
        val cellMin = artifactOr("nsw_entry_cells",
          s"k=${cents.length},ch=$ch,probes=$NswProbes")(
          ivfAssign(corpus, "vec_id", "embedding", cents,
            probes = NswProbes).groupBy("cell").agg(min("id").as("id")))
        // traversal frame: reconstructed per round FROM THE CODES SCAN
        // (declarative when served — each round re-reads the small
        // artifact; only the inline shape checkpoints, else the encode
        // kernel would re-run per round)
        val recon = pqRecon((0 until 8).map(i => col(s"c$i")), codebook)
        val vecs = cp(codes
          .select(col("vec_id").cast("long").as("id"), recon.as("v"))
          .withColumn("nrm", graft.ops.VectorSearch.norm(col("v"))))
        val qv = emb.filter(col("vec_id") === 0)
          .select(toDouble(col("embedding")).as("qv"))
          .withColumn("qn", graft.ops.VectorSearch.norm(col("qv")))
        val qCells = ivfAssign(emb.filter(col("vec_id") === 0),
          "vec_id", "embedding", cents, probes = NswProbes)
          .select(col("cell")).distinct()
        val entries = cellMin.join(broadcast(qCells), "cell")
          .select(col("id"))
          .unionByName(cellMin.agg(min("id").as("id")))
          .distinct()
        val beam = NswIndex.beamSearch(vecs, edges, qv, entries,
          beamWidth = NswBeam, rounds = NswRounds)
        // exact re-rank: raw-vector point lookups for the beam ONLY
        val raw = corpus.select(col("vec_id").cast("long").as("id"),
          toDouble(col("embedding")).as("v"))
        raw.join(broadcast(beam.select(col("id"))), "id")
          .crossJoin(broadcast(qv))
          .select(col("id").as("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc).limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      None,
      Some(() => PqNswOracle.sql)),

    // PQ reconstruction-fidelity audit — the governance leg of the
    // q372 compressed serve tier: BEFORE routing a corpus's serving
    // through 32×-compressed codes, measure what the compression
    // loses, per label stratum (a skewed stratum quantizing worse
    // than the mean is exactly what a global average hides). One
    // encode scan (the codegen kernel), per-row micro-quantized
    // cosine(v, recon(v)) (the q108 rule: quantize each term, THEN
    // integer-sum — bit-stable under any partitioning), one map-side
    // agg to O(#labels) rows. Mean via sign-split integer division
    // (house rule — Spark `div` truncates, DuckDB `//` floors; the
    // split makes both truncate). Oracle replays encode + recon +
    // quantize from codebook literals.
    QDef("q374_pq_recon_fidelity",
      (s, dir) => {
        import graft.ops.VectorSearch._
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val codebook = pqTrain(sample, m = 8, k = 16, iters = 10,
          seed = 42)
        PqFidelityOracle.sql = Some {
          val codeCols = codebook.indices
            .map(mi => s"${VectorQueries.pqEncSql(codebook, mi, "v")} AS c$mi")
            .mkString(",\n  ")
          val reconSql = VectorQueries.pqReconSql(codebook)
          s"""WITH e AS (SELECT label, $vSql AS v FROM embeddings),
             |enc AS (SELECT label, v, $codeCols FROM e),
             |r AS (SELECT label,
             |    CAST(floor(${cosSql("v", s"($reconSql)")} * 1000000.0)
             |      AS BIGINT) AS fid
             |  FROM enc),
             |g AS (SELECT label, count(*) AS n,
             |    CAST(sum(fid) AS BIGINT) AS sf
             |  FROM r GROUP BY label)
             |SELECT label, n,
             |  CASE WHEN sf >= 0 THEN sf // n
             |       ELSE -((-sf) // n) END AS mean_fid_micro
             |FROM g""".stripMargin
        }
        val e = emb.select(col("label"),
          toDouble(col("embedding")).as("v"))
        val enc = e.select(col("label"), col("v"),
            pqEncodeKernel(col("v"), codebook).as("codes"))
          .select(Seq(col("label"), col("v")) ++ (0 until 8)
            .map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        val recon = pqRecon((0 until 8).map(i => col(s"c$i")), codebook)
        enc
          .select(col("label"),
            floor(cosine(col("v"), recon) * lit(1000000.0)).as("fid"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"), sum(col("fid")).as("sf"))
          .select(col("label"), col("n"),
            when(col("sf") >= 0, expr("sf div n"))
              .otherwise(-expr("(-sf) div n")).as("mean_fid_micro"))
      },
      None,
      Some(() => PqFidelityOracle.sql))
  )

  /** q374's late-bound oracle (codebook literals). */
  private object PqFidelityOracle {
    @volatile var sql: Option[String] = None
  }

  private val HnswTopRounds = 2

  /** q362's late-bound oracle (trained-centroid literals). */
  private object NswHnswOracle {
    @volatile var sql: Option[String] = None
  }

  private val NswProbes = 2
  private val NswM = 6
  private val NswBeam = 12
  private val NswRounds = 3

  /** q257's late-bound oracle (trained-centroid literals). */
  private object NswOracle { @volatile var sql: Option[String] = None }

  /** q259's late-bound oracle (trained-centroid literals). */
  private object NswBatchOracle {
    @volatile var sql: Option[String] = None
  }

  /** q358's late-bound oracle — its own slot (a filtered Verify run
    * must not depend on q259 having populated anything). */
  private object NswServedOracle {
    @volatile var sql: Option[String] = None
  }

  /** q392's late-bound oracle (the seedHop batch replay). */
  private object NswSeededOracle {
    @volatile var sql: Option[String] = None
  }

  /** Everything q358 and q392 SHARE — trained centroids, the served
    * edge/entry-map artifacts, the scored corpus/query frames, the
    * per-cell entry set. One builder so the two queries cannot drift
    * apart on the fpKey / artifact names / params strings that make
    * them serve the SAME committed artifacts within a sweep (an edit
    * to one copy would silently split the address and re-build). */
  private final case class NswServed(cents: Array[Array[Double]],
      cap: Int, edges: org.apache.spark.sql.DataFrame,
      vecs: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      entries: org.apache.spark.sql.DataFrame)

  private def nswServedScaffold(s: org.apache.spark.sql.SparkSession,
                                dir: String,
                                cpEdgesInline: Boolean = false)
      : NswServed = {
    import graft.ops.VectorSearch._
    import graft.ops.{ArtifactStore, NswIndex}
    val emb = Tables.embeddings(s, dir)
    val sample = sampleVectors(emb, "vec_id", "embedding",
      n = 512, seed = 42)
    val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
    val cap = NswIndex.effectiveBlockCap(s)
    val isQ = col("vec_id") % 100 === 0
    val corpus = emb.filter(!isQ)
    val fpKey = s"$dir#embeddings#mod100ne0"
    def artifactOr(name: String, params: String)
                  (b: => org.apache.spark.sql.DataFrame) =
      if (ArtifactStore.root(s).isEmpty) b
      else ArtifactStore.buildOrServe(s, name,
        ArtifactStore.fingerprint(
          corpus.select(col("vec_id"), col("embedding")), fpKey),
        params, fpKey)(b)
    val edges0 = NswIndex.knnGraphArtifact(corpus, "vec_id",
      "embedding", cents, probes = NswProbes, m = NswM,
      blockCap = cap, fpKey = fpKey)
    val edges = if (cpEdgesInline && ArtifactStore.root(s).isEmpty)
      edges0.localCheckpoint() else edges0
    // entry map: cell → min corpus id, O(k) rows — an artifact too,
    // so the served plan has NO corpus-wide assignment stage
    val ch = ArtifactStore.contentHash(
      cents.map(_.mkString(",")).mkString("|"))
    val cellMin0 = artifactOr("nsw_entry_cells",
      s"k=${cents.length},ch=$ch,probes=$NswProbes")(
      ivfAssign(corpus, "vec_id", "embedding", cents,
        probes = NswProbes)
        .groupBy("cell").agg(min("id").as("id")))
    // entries + globalMin both read the tiny map: served it's an
    // O(k)-row parquet (re-scan is free); inline it's a corpus pass,
    // so only that shape checkpoints
    val cellMin = if (ArtifactStore.root(s).isEmpty)
      cellMin0.localCheckpoint() else cellMin0
    val vecs = corpus
      .select(col("vec_id").cast("long").as("id"),
        toDouble(col("embedding")).as("v"))
      .withColumn("nrm", graft.ops.VectorSearch.norm(col("v")))
      .localCheckpoint() // every beam round reads it
    val queries = emb.filter(isQ)
      .select(col("vec_id").cast("long").as("qid"),
        toDouble(col("embedding")).as("qv"))
      .withColumn("qn", graft.ops.VectorSearch.norm(col("qv")))
      .localCheckpoint()
    val qAssign = ivfAssign(emb.filter(isQ), "vec_id", "embedding",
      cents, probes = NswProbes)
    val globalMin = cellMin.agg(min("id").as("id"))
    val entries = qAssign.select(col("id").as("qid"), col("cell"))
      .join(broadcast(cellMin), "cell")
      .select(col("qid"), col("id"))
      .unionByName(queries.select(col("qid"))
        .crossJoin(broadcast(globalMin)))
      .distinct()
      .localCheckpoint() // tiny (O(queries·probes) rows); q392 reads
                         // it twice (itself + the 1-hop expansion)
    NswServed(cents, cap, edges, vecs, queries, entries)
  }

  /** q372's late-bound oracle (centroid + PQ-codebook literals). */
  private object PqNswOracle {
    @volatile var sql: Option[String] = None
  }

  /** DuckDB replay of q372: the [[nswOracleSql]] build (raw-vector
    * salted graph) + the q85 PQ encode replay, beam stages scored on
    * the RECONSTRUCTED vectors, final exact re-rank from raw. */
  private def pqNswOracleSql(centroids: Array[Array[Double]],
                             codebook: Array[Array[Array[Double]]],
                             probes: Int, m: Int, beam: Int,
                             rounds: Int, topK: Int, cap: Int): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), " +
        s"'cell': $i}"
    }.mkString("[", ",\n", "]")
    val codeCols = codebook.indices
      .map(mi => s"${VectorQueries.pqEncSql(codebook, mi, "v")} AS c$mi")
      .mkString(",\n  ")
    val reconSql = VectorQueries.pqReconSql(codebook)
    val beamStages = (1 to rounds).map { r =>
      s"""c$r AS MATERIALIZED (SELECT DISTINCT vec_id FROM (
         |    SELECT ed.dst AS vec_id FROM edges ed
         |    JOIN b${r - 1} b ON ed.src = b.vec_id
         |    UNION SELECT vec_id FROM b${r - 1}) z),
         |b$r AS MATERIALIZED (
         |  SELECT rr.vec_id, round(${cosSql("rr.rv", "qv")}, 6) AS sim
         |  FROM rec rr JOIN c$r USING (vec_id), q
         |  ORDER BY sim DESC, vec_id ASC LIMIT $beam)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $vSql AS v
       |  FROM embeddings),
       |a AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, $probes),
       |    x -> x.cell)) AS cell
       |  FROM a),
       |${nswCandCtes("vec_id <> 0", cap)},
       |sc AS MATERIALIZED (SELECT cand.src, cand.dst,
       |    round(${cosSql("sv.v", "dv.v")}, 6) AS sim
       |  FROM cand JOIN e sv ON sv.vec_id = cand.src
       |    JOIN e dv ON dv.vec_id = cand.dst),
       |tm AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst ASC) AS rn FROM sc) z
       |  WHERE rn <= $m),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM tm UNION SELECT dst, src FROM tm),
       |enc AS MATERIALIZED (
       |  SELECT vec_id, $codeCols FROM e WHERE vec_id <> 0),
       |rec AS MATERIALIZED (SELECT vec_id, $reconSql AS rv FROM enc),
       |qc AS (SELECT DISTINCT cell FROM cells WHERE vec_id = 0),
       |ent AS (
       |  SELECT min(c.vec_id) AS vec_id FROM cells c
       |    JOIN qc ON c.cell = qc.cell WHERE c.vec_id <> 0
       |  GROUP BY c.cell
       |  UNION
       |  SELECT min(vec_id) FROM cells WHERE vec_id <> 0),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |b0 AS MATERIALIZED (
       |  SELECT rr.vec_id, round(${cosSql("rr.rv", "qv")}, 6) AS sim
       |  FROM rec rr JOIN (SELECT DISTINCT vec_id FROM ent) en
       |    USING (vec_id), q
       |  ORDER BY sim DESC, vec_id ASC LIMIT $beam),
       |$beamStages,
       |x AS (SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |  FROM e JOIN (SELECT DISTINCT vec_id FROM b$rounds) fb
       |    USING (vec_id), q)
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM x ORDER BY sim DESC, vec_id ASC LIMIT $topK"""
      .stripMargin
  }

  /** Shortest-safe double literal (the VectorQueries.dbl rule). */
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** DuckDB twin of TextAnalysis.tokenHash (the house hash). */
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** The salted candidate CTEs shared by both NSW oracles:
    * corpus-only cell sizes → per-assignment deterministic salt →
    * candidates pair only within (cell, salt), replaying
    * [[graft.ops.NswIndex.knnGraph]]'s blockCap exactly.
    * `corpusPred` filters query rows out of the graph. */
  private def nswCandCtes(corpusPred: String, cap: Int,
                          sfx: String = ""): String =
    s"""csz$sfx AS (SELECT cell, count(*) AS cn FROM cells
       |  WHERE $corpusPred GROUP BY cell),
       |sal$sfx AS MATERIALIZED (SELECT c.vec_id, c.cell,
       |    ${hashSql("'nsw:' || CAST(c.vec_id AS VARCHAR)")}
       |      % greatest(1, (cn + ${cap - 1}) // $cap)
       |      AS salt
       |  FROM cells c JOIN csz$sfx USING (cell) WHERE $corpusPred),
       |cand$sfx AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst
       |  FROM sal$sfx x JOIN sal$sfx y
       |    ON x.cell = y.cell AND x.salt = y.salt
       |      AND x.vec_id <> y.vec_id)""".stripMargin

  /** One layer's full graph replay (candidates → exact-cosine scored →
    * per-src top-m → symmetrized edges), CTE names suffixed so the
    * HNSW oracle can instantiate two layers side by side. */
  private def nswGraphCtes(corpusPred: String, m: Int, cap: Int,
                           sfx: String): String =
    s"""${nswCandCtes(corpusPred, cap, sfx)},
       |sc$sfx AS MATERIALIZED (SELECT cand$sfx.src, cand$sfx.dst,
       |    round(${cosSql("sv.v", "dv.v")}, 6) AS sim
       |  FROM cand$sfx JOIN e sv ON sv.vec_id = cand$sfx.src
       |    JOIN e dv ON dv.vec_id = cand$sfx.dst),
       |tm$sfx AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst ASC) AS rn FROM sc$sfx) z
       |  WHERE rn <= $m),
       |edges$sfx AS MATERIALIZED (
       |  SELECT src, dst FROM tm$sfx
       |  UNION SELECT dst, src FROM tm$sfx)""".stripMargin

  /** `rounds` unrolled beam stages over `edges$sfx`, beams named
    * `${pfx}b0..${pfx}b$rounds` (${pfx}b0 supplied by the caller). */
  private def nswBeamStages(sfx: String, pfx: String, rounds: Int,
                            beam: Int): String =
    (1 to rounds).map { r =>
      s"""${pfx}c$r AS MATERIALIZED (SELECT DISTINCT vec_id FROM (
         |    SELECT ed.dst AS vec_id FROM edges$sfx ed
         |    JOIN ${pfx}b${r - 1} b ON ed.src = b.vec_id
         |    UNION SELECT vec_id FROM ${pfx}b${r - 1}) z),
         |${pfx}b$r AS MATERIALIZED (
         |  SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         |  FROM e JOIN ${pfx}c$r USING (vec_id), q
         |  ORDER BY sim DESC, vec_id ASC LIMIT $beam)""".stripMargin
    }.mkString(",\n")

  /** DuckDB replay of q362's two-layer HNSW descent: the level-1
    * membership hash, BOTH layers' salted graph builds, the top-layer
    * beam from the min-id entry, and the layer-0 beam seeded by the
    * top layer's final beam — every stage MATERIALIZED and
    * bit-replayed from centroid literals.
    */
  private def hnswOracleSql(centroids: Array[Array[Double]], probes: Int,
                            m: Int, beam: Int, topRounds: Int,
                            rounds: Int, topK: Int, cap: Int): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), " +
        s"'cell': $i}"
    }.mkString("[",
      ",\n", "]")
    val lvl1Pred = "vec_id <> 0 AND " +
      s"${hashSql("'lvl:' || CAST(vec_id AS VARCHAR)")} % 4 = 0"
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $vSql AS v
       |  FROM embeddings),
       |a AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, $probes),
       |    x -> x.cell)) AS cell
       |  FROM a),
       |${nswGraphCtes(lvl1Pred, m, cap, "1")},
       |${nswGraphCtes("vec_id <> 0", m, cap, "0")},
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |tb0 AS MATERIALIZED (
       |  SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |  FROM e JOIN (SELECT min(vec_id) AS vec_id FROM sal1) en
       |    USING (vec_id), q
       |  ORDER BY sim DESC, vec_id ASC LIMIT $beam),
       |${nswBeamStages("1", "t", topRounds, beam)},
       |zb0 AS MATERIALIZED (
       |  SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |  FROM e JOIN (SELECT DISTINCT vec_id FROM tb$topRounds) en
       |    USING (vec_id), q
       |  ORDER BY sim DESC, vec_id ASC LIMIT $beam),
       |${nswBeamStages("0", "z", rounds, beam)}
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM zb$rounds ORDER BY sim DESC, vec_id ASC LIMIT $topK"""
      .stripMargin
  }

  /** DuckDB replay of [[graft.ops.NswIndex]] build + search with
    * literal centroids: multiprobe assignment (the ivfOracleSql cell
    * construction — centroid norms precomputed with the kernel's
    * ascending fold), cell-bounded top-m neighbor edges symmetrized,
    * then `rounds` beam stages unrolled as MATERIALIZED CTEs (the
    * KCore late-oracle discipline: the replay runs exactly the
    * measured rounds).
    */
  private def nswOracleSql(centroids: Array[Array[Double]], probes: Int,
                           m: Int, beam: Int, rounds: Int,
                           topK: Int, cap: Int): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), " +
        s"'cell': $i}"
    }.mkString("[", ",\n", "]")
    val beamStages = (1 to rounds).map { r =>
      s"""c$r AS MATERIALIZED (SELECT DISTINCT vec_id FROM (
         |    SELECT ed.dst AS vec_id FROM edges ed
         |    JOIN b${r - 1} b ON ed.src = b.vec_id
         |    UNION SELECT vec_id FROM b${r - 1}) z),
         |b$r AS MATERIALIZED (
         |  SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
         |  FROM e JOIN c$r USING (vec_id), q
         |  ORDER BY sim DESC, vec_id ASC LIMIT $beam)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $vSql AS v
       |  FROM embeddings),
       |a AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, $probes),
       |    x -> x.cell)) AS cell
       |  FROM a),
       |${nswCandCtes("vec_id <> 0", cap)},
       |sc AS MATERIALIZED (SELECT cand.src, cand.dst,
       |    round(${cosSql("sv.v", "dv.v")}, 6) AS sim
       |  FROM cand JOIN e sv ON sv.vec_id = cand.src
       |    JOIN e dv ON dv.vec_id = cand.dst),
       |tm AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst ASC) AS rn FROM sc) z
       |  WHERE rn <= $m),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM tm UNION SELECT dst, src FROM tm),
       |qc AS (SELECT DISTINCT cell FROM cells WHERE vec_id = 0),
       |ent AS (
       |  SELECT min(c.vec_id) AS vec_id FROM cells c
       |    JOIN qc ON c.cell = qc.cell WHERE c.vec_id <> 0
       |  GROUP BY c.cell
       |  UNION
       |  SELECT min(vec_id) FROM cells WHERE vec_id <> 0),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |b0 AS MATERIALIZED (
       |  SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |  FROM e JOIN (SELECT DISTINCT vec_id FROM ent) en
       |    USING (vec_id), q
       |  ORDER BY sim DESC, vec_id ASC LIMIT $beam),
       |$beamStages
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM b$rounds ORDER BY sim DESC, vec_id ASC LIMIT $topK"""
      .stripMargin
  }

  /** DuckDB replay of [[graft.ops.NswIndex.beamSearchBatch]]: the
    * [[nswOracleSql]] build replay (queries = vec_id % 100 = 0
    * excluded from the graph), then every beam stage re-ranked
    * PARTITION BY qid (nested-subquery row_number, the tm shape —
    * one window per stage over O(batch · beam · m) rows).
    */
  private def nswBatchOracleSql(centroids: Array[Array[Double]],
                                probes: Int, m: Int, beam: Int,
                                rounds: Int, topK: Int, cap: Int,
                                seedHop: Boolean = false): String = {
    // seedHop (q392): round 0 additionally scores the entries' 1-hop
    // graph neighbors — the entry-seeding analog of q376's multi-probe
    val entsSql =
      if (seedHop)
        """SELECT DISTINCT qid, vec_id FROM (
          |  SELECT qid, vec_id FROM ent
          |  UNION SELECT en.qid, ed.dst AS vec_id FROM ent en
          |    JOIN edges ed ON ed.src = en.vec_id) zz""".stripMargin
      else "SELECT qid, vec_id FROM ent"
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), " +
        s"'cell': $i}"
    }.mkString("[", ",\n", "]")
    val beamStages = (1 to rounds).map { r =>
      s"""c$r AS (SELECT DISTINCT qid, vec_id FROM (
         |    SELECT b.qid, ed.dst AS vec_id FROM edges ed
         |    JOIN b${r - 1} b ON ed.src = b.vec_id
         |    UNION SELECT qid, vec_id FROM b${r - 1}) z),
         |b$r AS MATERIALIZED (SELECT qid, vec_id, sim FROM (
         |    SELECT qid, vec_id, sim, row_number() OVER (
         |      PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
         |    FROM (SELECT c.qid, e.vec_id,
         |        round(${cosSql("e.v", "q.qv")}, 6) AS sim
         |      FROM e JOIN c$r c ON e.vec_id = c.vec_id
         |        JOIN q ON q.qid = c.qid) y) z
         |  WHERE rn <= $beam)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, $vSql AS v
       |  FROM embeddings),
       |a AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e),
       |cells AS MATERIALIZED (
       |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, $probes),
       |    x -> x.cell)) AS cell
       |  FROM a),
       |${nswCandCtes("vec_id % 100 <> 0", cap)},
       |sc AS MATERIALIZED (SELECT cand.src, cand.dst,
       |    round(${cosSql("sv.v", "dv.v")}, 6) AS sim
       |  FROM cand JOIN e sv ON sv.vec_id = cand.src
       |    JOIN e dv ON dv.vec_id = cand.dst),
       |tm AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst ASC) AS rn FROM sc) z
       |  WHERE rn <= $m),
       |edges AS MATERIALIZED (
       |  SELECT src, dst FROM tm UNION SELECT dst, src FROM tm),
       |q AS MATERIALIZED (
       |  SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 100 = 0),
       |qc AS (SELECT vec_id AS qid, cell FROM cells
       |  WHERE vec_id % 100 = 0),
       |cellmin AS (SELECT cell, min(vec_id) AS vec_id FROM cells
       |  WHERE vec_id % 100 <> 0 GROUP BY cell),
       |gmin AS (SELECT min(vec_id) AS vec_id FROM cells
       |  WHERE vec_id % 100 <> 0),
       |ent AS (SELECT DISTINCT qid, vec_id FROM (
       |  SELECT qc.qid, cm.vec_id FROM qc JOIN cellmin cm USING (cell)
       |  UNION SELECT q.qid, g.vec_id FROM q CROSS JOIN gmin g) z),
       |ents AS ($entsSql),
       |b0 AS MATERIALIZED (SELECT qid, vec_id, sim FROM (
       |    SELECT qid, vec_id, sim, row_number() OVER (
       |      PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rn
       |    FROM (SELECT en.qid, e.vec_id,
       |        round(${cosSql("e.v", "q.qv")}, 6) AS sim
       |      FROM e JOIN ents en ON e.vec_id = en.vec_id
       |        JOIN q ON q.qid = en.qid) y) z
       |  WHERE rn <= $beam),
       |$beamStages
       |SELECT qid, vec_id, sim, rank FROM (
       |  SELECT qid, vec_id, sim, row_number() OVER (
       |    PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
       |  FROM b$rounds) z
       |WHERE rank <= $topK"""
      .stripMargin
  }
}
