package graft.queries

import graft.Tables
import graft.ops.VectorSearch._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search coverage over the `embeddings` table: exact
  * brute-force top-k, exact cosine near-dup pairs, IVF-style probed
  * search, and sign-bit LSH bucketed ANN.
  *
  * Floats are cast to double before any arithmetic and every reduction
  * is a sequential left fold, so similarity values are bit-identical to
  * the DuckDB oracle (which uses list_reduce in the same order).
  */
object VectorQueries {

  /** DuckDB fragment: sequential-fold dot product of two double lists. */
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)

  private def normSql(a: String): String = VectorOracleSql.norm(a)

  private def cosSql(a: String, b: String): String =
    VectorOracleSql.cos(a, b)

  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  /** DuckDB fragment: sign bit of v · plane(p) (v must be a double list
    * expression, d is the 0-based dimension).
    */
  private def signBitSql(v: String, p: Int): String =
    s"(CASE WHEN ${VectorOracleSql.proj(v, p)} > 0 THEN 1 ELSE 0 END)"

  private def bandKeySql(v: String, band: Int, bits: Int): String =
    (0 until bits).map(i => s"${signBitSql(v, band * bits + i)} * ${1 << i}")
      .mkString("(", " + ", ")")

  /** q30's late-bound oracle: populated by the query run with the SQL
    * that replays IVF assignment/probe/top-k against the run's trained
    * centroids as literals.
    */
  private object IvfOracle {
    @volatile var sql: Option[String] = None
  }

  /** q85's late-bound oracle: DuckDB replay of PQ encode + ADC ranking
    * with the run's trained codebooks as literals.
    */
  private object PqOracle {
    @volatile var sql: Option[String] = None
  }

  /** q89's late-bound oracle: coarse assignment + residual PQ replay. */
  private object IvfPqOracle {
    @volatile var sql: Option[String] = None
  }

  /** Shortest-safe double literal: 17 fractional digits of scientific
    * notation round-trips any finite double, and the exponent form makes
    * DuckDB parse it as DOUBLE (a plain decimal literal would parse as
    * DECIMAL and change the arithmetic).
    */
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** DuckDB replay of [[graft.ops.VectorSearch.ivfAssign]] + probe +
    * exact top-k with literal centroids. Norms of the centroids are
    * precomputed with the same ascending multiply-add fold the codegen'd
    * kernel uses, so assignment sims are bit-identical cross-engine.
    */
  /** q29's late-bound oracle (regime-dependent SQL). */
  private object NearDupOracle { @volatile var sql: Option[String] = None }

  /** q79's late-bound oracle (regime-dependent SQL). */
  private object NearDupCcOracle {
    @volatile var sql: Option[String] = None
  }

  /** DuckDB twin of TextAnalysis.tokenHash (the house hash). */
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** Near-dup pair CTEs for WHICHEVER regime nearDupPairs' gate picks
    * on `emb` — ends in `p(va, vb, sim)`. Exact (≤ gate rows): the
    * brute pair join. Cell-bounded (above it): the reroute replayed
    * LITERALLY — multiprobe assignment from the trained merged-
    * centroid literals ([[graft.ops.VectorSearch.cellCentroids]], the
    * op's own derivation), ceil(pop/cap) md5 salts, candidates only
    * within (cell, salt), exact-cosine verified. The probe, the
    * centroid training, and the cap all re-derive exactly what the
    * operator will compute, so the oracle checks the gated shape
    * instead of assuming the exact one (r13 verdict #3).
    */
  private def nearDupPairCtes(s: org.apache.spark.sql.SparkSession,
                              emb: org.apache.spark.sql.DataFrame,
                              threshold: Double): String = {
    val gate = s.conf.getOption(graft.ops.VectorSearch.GateConf)
      .map(_.toLong).getOrElse(graft.ops.VectorSearch.DefaultGate)
    val t = dbl(threshold)
    if (graft.ops.VectorSearch.rowsUnder(emb, gate))
      s"""e0 AS (SELECT vec_id, $vSql AS v FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb,
         |    round(${cosSql("a.v", "b.v")}, 6) AS sim
         |  FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.v", "b.v")} >= $t)""".stripMargin
    else {
      val cents = graft.ops.VectorSearch.cellCentroids(
        emb, "vec_id", "embedding", threshold)
      val cap = graft.ops.NswIndex.effectiveBlockCap(s)
      def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
      val cells = cents.zipWithIndex.map { case (c, i) =>
        val n = dbl(math.sqrt(c.map(x => x * x).sum))
        s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), " +
          s"'cell': $i}"
      }.mkString("[", ",\n", "]")
      s"""e0 AS MATERIALIZED (SELECT vec_id, $vSql AS v FROM embeddings),
         |a0 AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e0),
         |cl0 AS MATERIALIZED (
         |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, 2),
         |    x -> x.cell)) AS cell
         |  FROM a0),
         |csz0 AS (SELECT cell, count(*) AS pop FROM cl0 GROUP BY cell),
         |sal0 AS MATERIALIZED (SELECT c.vec_id, c.cell,
         |    ${hashSql("'nd:' || CAST(c.vec_id AS VARCHAR)")}
         |      % CAST(ceil(pop / $cap) AS BIGINT) AS salt
         |  FROM cl0 c JOIN csz0 USING (cell)),
         |cand0 AS (SELECT DISTINCT x.vec_id AS va, y.vec_id AS vb
         |  FROM sal0 x JOIN sal0 y
         |    ON x.cell = y.cell AND x.salt = y.salt
         |      AND x.vec_id < y.vec_id),
         |p AS (
         |  SELECT va, vb, round(${cosSql("a.v", "b.v")}, 6) AS sim
         |  FROM cand0 JOIN e0 a ON a.vec_id = va
         |    JOIN e0 b ON b.vec_id = vb
         |  WHERE ${cosSql("a.v", "b.v")} >= $t)""".stripMargin
    }
  }

  private[queries] def ivfOracleSql(centroids: Array[Array[Double]],
                                    probes: Int, topK: Int): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
    s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
       |a AS (SELECT vec_id, list_reverse_sort($cells) AS cs FROM e),
       |cells AS (
       |  SELECT vec_id, unnest(list_transform(list_slice(cs, 1, $probes),
       |    x -> x.cell)) AS cell
       |  FROM a),
       |qc AS (SELECT DISTINCT cell FROM cells WHERE vec_id = 0),
       |cand AS (SELECT DISTINCT c.vec_id FROM cells c
       |         JOIN qc ON c.cell = qc.cell WHERE c.vec_id <> 0),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |s AS (SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |      FROM e JOIN cand ON e.vec_id = cand.vec_id, q)
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM s ORDER BY sim DESC, vec_id ASC LIMIT $topK""".stripMargin
  }

  /** DuckDB fragment: PQ code of subspace `mi` over a double-list
    * column `src` — the exact mirror of pqEncode's expression tree:
    * per-centroid score `cn2 + (-2.0 * (src[i]*c_i + ...))` with the
    * same association order, deterministic index tie-break, so codes
    * are bit-identical cross-engine.
    */
  private[queries] def pqEncSql(codebook: Array[Array[Array[Double]]],
                                mi: Int, src: String): String = {
    val dsub = codebook(0)(0).length
    val cells = codebook(mi).zipWithIndex.map { case (cvec, ci) =>
      val dotVc = cvec.zipWithIndex.map { case (cv, di) =>
        s"$src[${mi * dsub + di + 1}] * ${dbl(cv)}"
      }.mkString("(", " + ", ")")
      val cn2 = cvec.foldLeft(0.0)((s, x) => s + x * x)
      s"{'d': (${dbl(cn2)} + (-2.0e0 * $dotVc)), 'c': $ci}"
    }.mkString("[", ", ", "]")
    s"(list_sort($cells)[1]).c"
  }

  /** DuckDB fragment: concatenated-centroid reconstruction from code
    * columns c0..c{m-1} — mirror of pqRecon.
    */
  private[queries] def pqReconSql(codebook: Array[Array[Array[Double]]])
      : String =
    codebook.indices.map { mi =>
      val cents = codebook(mi)
        .map(_.map(dbl).mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"($cents)[c$mi + 1]"
    }.mkString("(", " || ", ")")

  private def pqOracleSql(codebook: Array[Array[Array[Double]]],
                          topK: Int): String = {
    def encSql(mi: Int): String = pqEncSql(codebook, mi, "v")
    val reconSql = pqReconSql(codebook)
    val codeCols = codebook.indices.map(mi => s"${encSql(mi)} AS c$mi")
      .mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
       |enc AS (SELECT vec_id, $codeCols FROM e),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |r AS (SELECT vec_id, $reconSql AS recon
       |      FROM enc WHERE vec_id <> 0),
       |s AS (SELECT vec_id, round(${cosSql("recon", "qv")}, 6) AS approx_sim
       |      FROM r, q),
       |short AS (SELECT vec_id FROM s
       |          ORDER BY approx_sim DESC, vec_id ASC LIMIT $PqShortlist),
       |x AS (SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |      FROM e JOIN short USING (vec_id), q)
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM x ORDER BY sim DESC, vec_id ASC LIMIT $topK""".stripMargin
  }

  /** ADC shortlist size for the exact re-rank stage of q85/q89. */
  private val PqShortlist = 50

  /** DuckDB replay of IVF-PQ: coarse cosine assignment (the q30
    * construction), residual against the coarse centroid, PQ codes over
    * the residual, probe, and cosine ranking against coarse + residual
    * reconstruction. Every float op mirrors the Spark tree (elementwise
    * subtract/add carry no fold order; dots/norms use the shared
    * sequential fold).
    */
  private[queries] def ivfPqOracleSql(coarse: Array[Array[Double]],
                             codebook: Array[Array[Array[Double]]],
                             probes: Int, topK: Int): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cellsSql = coarse.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
    val coarseLit = coarse.map(vlit).mkString("[", ", ", "]")
    val encCols = codebook.indices
      .map(mi => s"${pqEncSql(codebook, mi, "r")} AS c$mi").mkString(",\n  ")
    s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
       |a0 AS (SELECT vec_id, v, list_reverse_sort($cellsSql) AS cs FROM e),
       |a AS (SELECT vec_id, v, (cs[1]).cell AS cell FROM a0),
       |rc AS (SELECT vec_id, cell, ($coarseLit)[cell + 1] AS cc,
       |  list_transform(list_zip(v, ($coarseLit)[cell + 1]),
       |    x -> x[1] - x[2]) AS r
       |  FROM a),
       |enc AS (SELECT vec_id, cell, cc, $encCols FROM rc),
       |qa AS (SELECT list_transform(list_slice(cs, 1, $probes),
       |    x -> x.cell) AS cells FROM a0 WHERE vec_id = 0),
       |qc AS (SELECT DISTINCT unnest(cells) AS cell FROM qa),
       |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |ap AS (SELECT vec_id,
       |  list_transform(list_zip(cc, ${pqReconSql(codebook)}),
       |    x -> x[1] + x[2]) AS approx
       |  FROM enc JOIN qc USING (cell) WHERE vec_id <> 0),
       |s AS (SELECT vec_id, round(${cosSql("approx", "qv")}, 6)
       |        AS approx_sim FROM ap, q),
       |short AS (SELECT vec_id FROM s
       |          ORDER BY approx_sim DESC, vec_id ASC LIMIT $PqShortlist),
       |x AS (SELECT e.vec_id, round(${cosSql("e.v", "qv")}, 6) AS sim
       |      FROM e JOIN short USING (vec_id), q)
       |SELECT vec_id, sim,
       |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
       |FROM x ORDER BY sim DESC, vec_id ASC LIMIT $topK""".stripMargin
  }

  val defs: Seq[QDef] = Seq(

    // Exact brute-force top-k: scan + per-partition partial top-k, no
    // shuffle of the corpus.
    QDef("q28_ann_bruteforce",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(toDouble(col("embedding")).as("qv")))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(toDouble(col("embedding")), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some(s"""WITH q AS (SELECT $vSql AS qv FROM embeddings WHERE vec_id = 0),
              |e AS (SELECT vec_id, $vSql AS v FROM embeddings WHERE vec_id <> 0),
              |s AS (SELECT vec_id, round(${cosSql("v", "qv")}, 6) AS sim
              |      FROM e, q)
              |SELECT vec_id, sim,
              |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
              |FROM s ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin)),

    // Embedding-cosine near-dup pairs, CARDINALITY-GATED (nearDupPairs):
    // at or below spark.graft.neardup.exactMaxRows (default 10⁴) this is
    // the exact TILED plan — at this threshold (0.4 ⇒ ~66° pair angles)
    // every pruning structure was measured to need more candidate pairs
    // than brute force for full recall (IVF probes=6/16: 2.2×, sign-LSH
    // r=2,b=24: 6×), so exact tiling (tile-pair tasks, O(n·T) shuffle,
    // codegen'd dot kernel) is the right small-corpus shape. ABOVE the
    // gate exact mining is measured 67× wall for 10× rows — a 100 TB
    // non-starter regardless of plan shape — so the operator reroutes to
    // the cell-bounded candidate path (k ∝ n k-means cells, linear
    // candidate surface, exact-cosine verified; recall spec-pinned full
    // on clustered corpora). Oracle runs at sf0.01 (500 rows, under the
    // gate ⇒ exact); both shapes pinned in PlanContractSpec.
    QDef("q29_embed_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        // the oracle replays WHICHEVER regime the gate picks (r13
        // verdict #3: the capped lane forces the reroute at sf0.1 and
        // the replay must then spell the cell-bounded shape literally
        // — assuming the exact one is how a recall change hides)
        NearDupOracle.sql = Some(
          s"""WITH ${nearDupPairCtes(s, emb, 0.4)}
             |SELECT va AS vec_a, vb AS vec_b, sim FROM p""".stripMargin)
        nearDupPairs(emb, "vec_id", "embedding", 0.4)
      },
      None,
      Some(() => NearDupOracle.sql)),

    // Semantic dedup clusters — q29's gated cosine near-dup pairs
    // closed into connected components, one canonical (minimum-id)
    // vector kept per cluster: the embedding-space twin of the text
    // pipeline's q69. Unlike text near-dup cliques (diameter 1-2 →
    // label propagation), a low-threshold cosine graph is CHAIN-shaped
    // because cosine is not transitive — measured here: diameter ~22 at
    // sf0.1 — so this goes straight to the O(log n)-round
    // star-contraction instead of paying propagation rounds first.
    // Singletons recovered by a left join instead of shuffling the full
    // corpus through CC. Pair mining inherits q29's cardinality gate
    // (exact under 10⁴ rows — the oracle regime; cell-bounded above).
    QDef("q79_embed_clusters",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        NearDupCcOracle.sql = Some(
          s"""WITH RECURSIVE ${nearDupPairCtes(s, emb, 0.4)},
             |pp AS (SELECT va, vb FROM p),
             |ed AS (SELECT va AS a, vb AS b FROM pp
             |      UNION SELECT vb, va FROM pp),
             |reach(a, b) AS (
             |  SELECT a, b FROM ed
             |  UNION
             |  SELECT r.a, ed.b FROM reach r JOIN ed ON r.b = ed.a),
             |cl AS (SELECT a AS vec_id, min(b) AS mn FROM reach GROUP BY a)
             |SELECT m.vec_id,
             |  least(m.vec_id, coalesce(cl.mn, m.vec_id)) AS cluster_id,
             |  m.vec_id = least(m.vec_id, coalesce(cl.mn, m.vec_id)) AS keep
             |FROM embeddings m LEFT JOIN cl USING (vec_id)""".stripMargin)
        val pairs = nearDupPairs(emb, "vec_id", "embedding", 0.4)
        val comp = graft.ops.ConnectedComponents
          .runStarContraction(pairs, "vec_a", "vec_b")
          .withColumnRenamed("node", "vec_id")
        emb.select(col("vec_id"))
          .join(comp, Seq("vec_id"), "left")
          .select(col("vec_id"),
            coalesce(col("component"), col("vec_id")).as("cluster_id"))
          .withColumn("keep", col("vec_id") === col("cluster_id"))
      },
      None,
      Some(() => NearDupCcOracle.sql)),

    // IVF probed search with real k-means centroids (deterministic
    // k-means++ over a SEEDED BOUNDED sample — a distributed TakeOrdered
    // of 512 vectors, never a full-table collect) and multiprobe 4:
    // assign every vector to its top-4 cells, probe the query's cells,
    // exact-search only co-probed vectors. k-means itself is not
    // SQL-expressible, but the trained centroids are plan-time constants
    // — so the oracle embeds them as literals (exactly as q31 embeds its
    // hyperplane matrix) and replays assignment + probe + top-k in
    // DuckDB: published late (after the run) via QDef.oracleLate.
    // Recall is unit-tested on clustered data where IVF is exact
    // (VectorSearchSpec).
    QDef("q30_ann_ivf",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val centroids = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        IvfOracle.sql = Some(ivfOracleSql(centroids, probes = 4, topK = 10))
        val assign = ivfAssign(emb, "vec_id", "embedding", centroids,
          probes = 4).localCheckpoint()
        val qCells = broadcast(assign.filter(col("id") === 0)
          .select(col("cell")).distinct())
        val candIds = assign.filter(col("id") =!= 0)
          .join(qCells, "cell")
          .select(col("id").as("vec_id")).distinct()
        val q = broadcast(e.filter(col("vec_id") === 0).select(col("v").as("qv")))
        candIds.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      None,
      Some(() => IvfOracle.sql)),

    // Product-quantization ANN (Jégou et al., TPAMI 2011) — the
    // memory-bound scale path: each 64-dim vector compresses to 8
    // one-byte codes (8 subspaces × 16 centroids, codebooks trained by
    // the same seeded driver-side k-means as q30); the ADC pass ranks
    // against the RECONSTRUCTED vectors (asymmetric distance: exact
    // query vs quantized corpus) to a 50-candidate shortlist, and an
    // EXACT cosine re-rank of the shortlist emits the final top-k —
    // the standard two-stage shape (quantized scan over everything,
    // raw-vector point-lookups for only the shortlist). At 100 TB the
    // scanned corpus is ~32× smaller than the raw embeddings — the
    // difference between spilling and RAM-resident search; encode is
    // one scan of plain codegen'd arithmetic (the |c|²-2⟨v,c⟩
    // expansion halves the expression count), and both ranking stages
    // are no-shuffle TakeOrdered. Codebooks are plan-time constants →
    // the DuckDB oracle replays encode+ADC+re-rank bit-identically
    // (late oracle, the q30 pattern).
    QDef("q85_ann_pq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val codebook = pqTrain(sample, m = 8, k = 16, iters = 10, seed = 42)
        PqOracle.sql = Some(pqOracleSql(codebook, topK = 10))
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
          .localCheckpoint()
        // all 8 codes from the codegen'd kernel (the expression form
        // would blow the 64 KB codegen limit and run interpreted)
        val enc = e.select(col("vec_id"),
          pqEncodeKernel(col("v"), codebook).as("codes"))
          .select(col("vec_id") +: (0 until 8)
            .map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val recon = pqRecon((0 until 8).map(i => col(s"c$i")), codebook)
        val short = enc.filter(col("vec_id") =!= 0)
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(recon, col("qv")), 6).as("approx_sim"))
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
      None,
      Some(() => PqOracle.sql)),

    // IVF-PQ — the composed billion-vector architecture (FAISS's
    // workhorse index): a coarse quantizer routes each vector to ONE
    // of 16 cells, PQ compresses the RESIDUAL v - c_cell (residuals
    // are smaller and better-centered than raw vectors, so the same
    // codebook budget quantizes finer), and the query probes its 8
    // nearest cells (half of a 16-cell toy quantizer ~ probing 1% of
    // a production 16k-cell one; nprobe is the recall/cost dial),
    // scoring only co-resident codes against c_cell + recon(residual),
    // then exact-re-ranks the 50-candidate ADC shortlist (raw-vector
    // point-lookups, the q85 two-stage shape). Search cost: probed
    // fraction of the corpus in codes + 50 raw lookups; memory:
    // 8 B/vector + one cell id. Measured recall@10 vs exact (sf0.001):
    // 8/10 for full-scan PQ+re-rank (q85), 5/10 here — the gap is
    // probe coverage, the inherent IVF trade on near-uniform data. Both trained
    // structures are plan-time literals (seeded driver-side k-means;
    // codebook trained on the sample's residuals under the SAME
    // argmax-cosine assignment the operator applies), so the oracle
    // replays everything bit-identically. Residual and reconstruction
    // run as the codegen'd VecElemwiseDbl kernel (per-element IEEE
    // add/sub carries no fold order — identical values to the
    // zip_with form without its per-element interpreter tax).
    QDef("q89_ann_ivfpq",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val coarse = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        def cosD(a: Array[Double], b: Array[Double]): Double = {
          var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
          while (i < a.length) {
            d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
          }
          d / (math.sqrt(na) * math.sqrt(nb))
        }
        // residual training set under the operator's own assignment
        // rule (argmax cosine, larger index wins ties — ivfAssign's
        // reverse-sorted struct order)
        val resSample = sample.map { v =>
          val ci = coarse.indices.maxBy(i => (cosD(v, coarse(i)), i))
          Array.tabulate(v.length)(d => v(d) - coarse(ci)(d))
        }
        val codebook = pqTrain(resSample, m = 8, k = 16, iters = 10, seed = 43)
        IvfPqOracle.sql = Some(ivfPqOracleSql(coarse, codebook,
          probes = 8, topK = 10))
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
        val withRes = e
          .join(ivfAssign(emb, "vec_id", "embedding", coarse, probes = 1)
            .withColumnRenamed("id", "vec_id"), "vec_id")
          .withColumn("cc", element_at(coarseLit, col("cell") + 1))
          .select(col("vec_id"), col("cell"), col("cc"),
            vecSub(col("v"), col("cc")).as("r"))
        val enc = withRes.select(col("vec_id"), col("cell"), col("cc"),
          pqEncodeKernel(col("r"), codebook).as("codes"))
          .select(Seq(col("vec_id"), col("cell"), col("cc")) ++ (0 until 8)
            .map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        val qCells = broadcast(
          ivfAssign(emb.filter(col("vec_id") === 0), "vec_id", "embedding",
            coarse, probes = 8).select(col("cell")).distinct())
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
        val recon = pqRecon((0 until 8).map(i => col(s"c$i")), codebook)
        val short = enc.filter(col("vec_id") =!= 0)
          .join(qCells, "cell")
          .withColumn("approx", vecAdd(col("cc"), recon))
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("approx"), col("qv")), 6).as("approx_sim"))
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
      None,
      Some(() => IvfPqOracle.sql)),

    // LSH-bucketed ANN (the scale path): 4 bands × 4 sign bits under
    // deterministic md5-derived hyperplanes; candidates share any band
    // bucket with the query, then exact cosine top-5.
    QDef("q31_ann_lsh",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val e = emb.select(col("vec_id"), toDouble(col("embedding")).as("v"))
        val buckets = lshCandidates(emb, "vec_id", "embedding",
          bands = 4, bitsPerBand = 4, dims = 64)
        val qKeys = broadcast(buckets.filter(col("id") === 0)
          .select(col("band"), col("key")))
        val candIds = buckets.filter(col("id") =!= 0)
          .join(qKeys, Seq("band", "key"))
          .select(col("id").as("vec_id")).distinct()
        val q = broadcast(e.filter(col("vec_id") === 0).select(col("v").as("qv")))
        candIds.join(e, "vec_id")
          .crossJoin(q)
          .select(col("vec_id"),
            round(cosine(col("v"), col("qv")), 6).as("sim"))
          .orderBy(col("sim").desc, col("vec_id").asc)
          .limit(5)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("sim").desc, col("vec_id").asc)))
      },
      Some {
        val bandExprs = (0 until 4).map(b =>
          s"${bandKeySql("v", b, 4)} AS k$b").mkString(", ")
        val matchCond = (0 until 4).map(b => s"e.k$b = q.k$b").mkString(" OR ")
        s"""WITH e AS (
           |  SELECT vec_id, v, $bandExprs FROM (
           |    SELECT vec_id, $vSql AS v FROM embeddings) t),
           |q AS (SELECT * FROM e WHERE vec_id = 0),
           |cand AS (
           |  SELECT DISTINCT e.vec_id, e.v FROM e, q
           |  WHERE e.vec_id <> 0 AND ($matchCond)),
           |s AS (SELECT c.vec_id, round(${cosSql("c.v", "q.v")}, 6) AS sim
           |      FROM cand c, q)
           |SELECT vec_id, sim,
           |  row_number() OVER (ORDER BY sim DESC, vec_id ASC) AS rank
           |FROM s ORDER BY sim DESC, vec_id ASC LIMIT 5""".stripMargin
      })
  )
}
