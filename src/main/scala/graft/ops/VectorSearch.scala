package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * All vector math is Catalyst higher-order functions over doubles with
  * sequential left-fold accumulation, so results are bit-reproducible
  * across engines (the DuckDB oracle uses the same fold order).
  *
  * Scale paths: brute-force top-k is a scan + per-partition partial
  * top-k (TakeOrderedAndProject) — no shuffle of the corpus. The LSH
  * variant buckets by sign bits under deterministic hyperplanes so the
  * candidate set stays O(n/2^bits · bands); IVF probes only the
  * closest coarse cells. Both avoid the O(n²) pair blowup at 100 TB.
  */
object VectorSearch {

  /** Sequential-fold dot product of two double arrays. Runs as a
    * codegen'd kernel ([[graft.expressions.DotProductDbl]]) with the
    * same ascending multiply-add order as the HOF form
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` — bit-identical doubles,
    * ~100× less per-element overhead than the interpreted lambdas.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.DotProductDbl(
      org.apache.spark.sql.GraftExpr.expression(a),
      org.apache.spark.sql.GraftExpr.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Elementwise a - b / a + b as codegen'd kernels (residual and
    * reconstruction steps of IVF-PQ; same values as the zip_with form).
    */
  def vecSub(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.VecElemwiseDbl(
      org.apache.spark.sql.GraftExpr.expression(a),
      org.apache.spark.sql.GraftExpr.expression(b), subtract = true))

  def vecAdd(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.VecElemwiseDbl(
      org.apache.spark.sql.GraftExpr.expression(a),
      org.apache.spark.sql.GraftExpr.expression(b), subtract = false))

  /** Fused SQ8 scalar-quantization round trip (encode against the
    * per-dimension [mn, mx] corpus range, midpoint-dequantize) as a
    * codegen'd kernel — the ranking arithmetic of an int8-quantized
    * ANN scan (see [[graft.expressions.Sq8ApproxDbl]]).
    */
  def sq8Approx(v: Column, mn: Column, mx: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.Sq8ApproxDbl(
      org.apache.spark.sql.GraftExpr.expression(v),
      org.apache.spark.sql.GraftExpr.expression(mn),
      org.apache.spark.sql.GraftExpr.expression(mx)))

  /** Cast an array<float> column to array<double> (done before any
    * arithmetic so both engines multiply exactly-converted doubles).
    */
  def toDouble(a: Column): Column = transform(a, v => v.cast("double"))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine similarity to one query vector. The query
    * vector is a scalar subquery result pushed into every row — a
    * broadcast, not a join.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     query: Column, k: Int, excludeId: Option[Long] = None)
      : DataFrame = {
    val base = excludeId.fold(emb)(id => emb.filter(col(idCol) =!= id))
    base.select(col(idCol),
        round(cosine(toDouble(col(vecCol)), query), 6).as("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col(idCol).asc)))
  }

  /** All pairs with cosine >= threshold. Exact (O(n²) scored pairs) —
    * the correctness baseline; prefer [[nearDupExactTiled]] (same result,
    * distributed tiling) or, at thresholds high enough for pruning,
    * [[nearDupIvf]].
    */
  def nearDupExact(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val n = emb.select(col(idCol).as("id"),
      toDouble(col(vecCol)).as("v"), norm(toDouble(col(vecCol))).as("nrm"))
    n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .withColumn("sim",
        dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.id").as("vec_a"), col("b.id").as("vec_b"),
        round(col("sim"), 6).as("sim"))
  }

  /** Exact all-pairs cosine mining, tiled for scale.
    *
    * At low thresholds exact pair mining is irreducibly O(n²) compute —
    * measured on this corpus: cosine 0.4 ⇒ ~66° pair angles, and ANY
    * bucketing with full recall (IVF probes=6/16, sign-LSH r=2 b=24)
    * generates MORE candidate pairs than brute force. What scale design
    * can fix is the plan shape, not the math: tile the corpus into T
    * buckets, emit one task per tile-pair (T(T+1)/2 tasks), so shuffle
    * volume is O(n·T) rows (never O(n²)), per-task memory is bounded by
    * 2n/T vectors, and every dot runs in the codegen'd kernel. T scales
    * with the cluster; the work is embarrassingly parallel.
    */
  def nearDupExactTiled(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, tiles: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val vecs = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"),
        norm(toDouble(col(vecCol))).as("nrm"))
      .withColumn("t", pmod(col("id"), lit(tiles)).cast("int"))
    val tilePairs = (for {
      i <- 0 until tiles; j <- i until tiles
    } yield (i, j, i * tiles + j)).toDF("ti", "tj", "tp")
    val left = vecs.join(broadcast(tilePairs), col("t") === col("ti"))
      .select(col("tp"), col("id").as("ida"), col("v").as("va"),
        col("nrm").as("na"))
    val right = vecs.join(broadcast(tilePairs), col("t") === col("tj"))
      .select(col("tp"), col("id").as("idb"), col("v").as("vb"),
        col("nrm").as("nb"))
    // Each unordered pair appears in exactly one tile-pair task: on the
    // diagonal (ti == tj) both orientations show up, so id order dedups
    // there; across tiles only one orientation exists (which may have
    // ida > idb — emit the canonical least/greatest order).
    val diag = (col("tp") % lit(tiles + 1) === 0) // tp = ti*tiles+tj, ti==tj
    left.join(right, "tp")
      .filter(!diag || col("ida") < col("idb"))
      .withColumn("sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("sim") >= threshold)
      .select(least(col("ida"), col("idb")).as("vec_a"),
        greatest(col("ida"), col("idb")).as("vec_b"),
        round(col("sim"), 6).as("sim"))
  }

  /** Cardinality gate for exact pair mining — the [[PageRank]] /
    * [[ConnectedComponents]] `collectIfSmall` precedent applied to the
    * one remaining quadratic in the tree. Exact all-pairs cosine costs
    * n²/2 dot products no matter how well the tiling shapes the plan
    * (measured: 67× wall for 10× rows); above this many corpus rows
    * the operator reroutes to the cell-bounded candidate path instead.
    */
  val GateConf = "spark.graft.neardup.exactMaxRows"
  val DefaultGate = 10000L

  /** Near-dup pairs above a cosine threshold — the gated entry point.
    *
    * Two physical shapes behind one schema (vec_a, vec_b, sim), gated
    * on corpus cardinality with a bounded `limit(gate+1).count` probe
    * (never an unbounded count):
    *
    *  - '''exact tiled''' (≤ `spark.graft.neardup.exactMaxRows`,
    *    default 10⁴, or `exact = true`): [[nearDupExactTiled]] — full
    *    recall, O(n²) compute bounded per-task by the tiling. 10⁴ rows
    *    ⇒ 5·10⁷ dots, seconds on one node; the quadratic growth beyond
    *    that is why the gate exists.
    *  - '''cell-bounded''' (above the gate): [[nearDupCellBounded]] —
    *    k-means cells sized ~`targetCell`, candidates only within
    *    co-probed cells (Σ cell² ≈ 4·targetCell·n — LINEAR in n for
    *    k ∝ n), exact-cosine verified. Recall is data-dependent: full
    *    on clustered corpora (spec-pinned), MEASURED ~50% of pairs
    *    (456/920) on the near-isotropic sf0.1 embeddings at
    *    threshold 0.4 under a forced gate — the capped-verify lane's
    *    number, not a guess. The honest trade stands: at 100 TB the
    *    exact answer is not computable at all, callers who insist get
    *    the `exact = true` escape hatch, and since r14 the oracle
    *    REPLAYS this regime literally (which pairs survive is
    *    bit-pinned even where recall is partial).
    *
    * Unlike the PageRank gate this one changes the ANSWER above the
    * gate, not just the plan — documented here and in SURVEY; both
    * shapes are contract-pinned in PlanContractSpec.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, tiles: Int = 8, exact: Boolean = false,
                   seed: Long = 42L): DataFrame = {
    val gate = emb.sparkSession.conf.getOption(GateConf).map(_.toLong)
      .getOrElse(DefaultGate)
    if (exact || rowsUnder(emb, gate))
      nearDupExactTiled(emb, idCol, vecCol, threshold, tiles)
    else nearDupCellBounded(emb, idCol, vecCol, threshold, seed = seed,
      blockCap = NswIndex.effectiveBlockCap(emb.sparkSession))
  }

  /** Bounded cardinality probe: limit(gate+1) caps the job's output,
    * so an over-gate corpus costs one capped pass, not a full count.
    * Exposed within graft so q29/q79's LATE-BOUND oracles can emit the
    * SQL of whichever regime actually ran (the capped-verify-lane
    * contract: the oracle replays the gated shape literally, it never
    * assumes the exact one).
    */
  private[graft] def rowsUnder(df: DataFrame, gate: Long): Boolean =
    regimeMemo.computeIfAbsent(
      s"${df.queryExecution.analyzed.semanticHash()}|$gate",
      _ => {
        val n = math.min(gate, Int.MaxValue - 2L).toInt
        java.lang.Boolean.valueOf(df.limit(n + 1).count() <= gate)
      }).booleanValue()

  /** Session memos for the gated-regime derivation, keyed on the
    * SEMANTIC hash of the input plan (same source + projection = same
    * key): within one sweep, q29's oracle builder, q29's operator, and
    * q79's both run the identical probe + centroid training — memoized
    * they cost ONE bounded count and ONE sample/train per corpus
    * (r14 review: the duplication was 2-3 redundant actions per gated
    * run). Keys are plan-shaped, so distinct corpora never collide; a
    * spec that rewrites its fixture in place must [[clearRegimeMemo]]
    * (the ArtifactStore.clearFingerprintMemo rule). */
  private val regimeMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
  private val centMemo = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Double]]]()

  private[graft] def clearRegimeMemo(): Unit = {
    regimeMemo.clear(); centMemo.clear()
  }

  /** Cell-bounded near-dup pairs: the over-gate reroute. k scales with
    * the corpus (k = n / targetCell, clamped to [16, 512]) so average
    * cell size stays ~targetCell and the candidate surface
    * Σ cell² ≈ k·(probes·targetCell)² = 4·targetCell·probes²·n stays
    * LINEAR in n — the property the fixed-k [[nearDupIvf]] lacks.
    * Centroids: k-means++ seed on a bounded sample, then 2 distributed
    * Lloyd rounds (integer-deterministic, map-side combined — the q106
    * machinery), so the training cost is 2 corpus scans regardless of n.
    * The 512-cell clamp is the Catalyst expression-width bound on the
    * per-row top-probes assignment (512 struct children per row);
    * beyond n ≈ 32k·targetCell cells grow past targetCell linearly —
    * lift by moving assignment into a codegen'd kernel if ever needed.
    */
  def nearDupCellBounded(emb: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, targetCell: Int = 64,
                         probes: Int = 2, seed: Long = 42L,
                         blockCap: Int = NswIndex.DefaultBlockCap)
      : DataFrame =
    nearDupWithCentroids(emb, idCol, vecCol, threshold,
      cellCentroids(emb, idCol, vecCol, threshold, targetCell, seed),
      probes, blockCap)

  /** The cell-bounded path's trained-and-merged centroids — the ONE
    * derivation shared by the operator and q29/q79's late-bound
    * oracle builders (duplicating it would let the replay silently
    * drift from the op). Centroids train DRIVER-SIDE on the bounded
    * sample (the nearDupIvf discipline): candidate bucketing needs
    * cells that carve the space, not corpus-converged means — two
    * distributed Lloyd rounds were measured 5 s of pure fixed cost
    * here for no recall difference on the clustered fixture, and at
    * 100 TB they would be two full corpus scans spent polishing
    * bucket walls. */
  def cellCentroids(emb: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, targetCell: Int = 64,
                    seed: Long = 42L): Array[Array[Double]] =
    centMemo.computeIfAbsent(
      s"${emb.queryExecution.analyzed.semanticHash()}|$idCol|$vecCol|" +
        s"$threshold|$targetCell|$seed",
      _ => {
        val n = emb.count()
        val k = math.min(512L, math.max(16L, n / targetCell)).toInt
        val cents = kmeansCentroids(
          sampleVectors(emb, idCol, vecCol, n = 2048, seed = seed),
          k, iters = 4, seed = seed)
        mergeCentroids(cents, math.max(threshold, MergeFloor))
      })

  /** Centroids are only merged when NEAR-IDENTICAL (cos ≥ this floor,
    * or ≥ threshold when the caller's threshold is higher). Merging at
    * the pair threshold itself would be wrong at low thresholds: on a
    * corpus with broad mass at cos ≥ 0.4 the centroids THEMSELVES sit
    * within 0.4 of each other, the union-find collapses k ∝ n cells
    * into a handful of mega-cells, and the candidate surface goes
    * quadratic again — the exact blowup the gate exists to prevent.
    */
  val MergeFloor = 0.98

  /** Collapse near-identical centroids into one cell (driver-side
    * union-find over ≤ k² cosines, k ≤ 512). When k ∝ n overshoots the
    * number of natural clusters, Lloyd parks several near-identical
    * centroids inside one tight cluster and probes=2 can hand two
    * in-cluster vectors disjoint probe sets — the one recall failure
    * mode that is an artifact of k, not of the data. Merging only at
    * [[MergeFloor]] keeps the cure from reintroducing the disease
    * (see the constant's doc).
    */
  def mergeCentroids(cents: Array[Array[Double]], threshold: Double)
      : Array[Array[Double]] = {
    val k = cents.length
    val nrm = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val parent = Array.tabulate(k)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r)
      var c = x; while (parent(c) != c) { val n = parent(c); parent(c) = r; c = n }; r }
    for (i <- 0 until k; j <- i + 1 until k) {
      var d = 0.0
      var t = 0
      while (t < cents(i).length) { d += cents(i)(t) * cents(j)(t); t += 1 }
      if (nrm(i) > 0 && nrm(j) > 0 && d / (nrm(i) * nrm(j)) >= threshold) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
      }
    }
    (0 until k).filter(i => find(i) == i).map(cents).toArray
  }

  /** Shared verify stage: co-probed-cell candidates, exact-cosine
    * checked. Candidate generation never materializes an all-pairs
    * join; the vecs frame is checkpointed once and served to both
    * candidate joins.
    *
    * Cells are additionally SALT-CAPPED (the [[NswIndex.knnGraph]]
    * discipline, cap = [[NswIndex.DefaultBlockCap]]): Lloyd on
    * weakly-clustered data can park most of the corpus in a few cells,
    * and an uncapped Σ cell² is then quadratic no matter how k was
    * chosen. Cells over the cap split into ceil(pop / cap)
    * deterministic id-hash sub-blocks and pairs only form within
    * (cell, salt) — Σ block² ≤ assignments · cap = O(n),
    * UNCONDITIONALLY. Below the cap every salt count is 1 and the
    * candidate set is identical to the uncapped join (the clustered
    * fixtures in VectorSearchSpec sit below it).
    */
  private def nearDupWithCentroids(emb: DataFrame, idCol: String,
                                   vecCol: String, threshold: Double,
                                   centroids: Array[Array[Double]],
                                   probes: Int,
                                   blockCap: Int = NswIndex.DefaultBlockCap)
      : DataFrame = {
    val cap = if (blockCap > 0) blockCap else Int.MaxValue
    // Vectors RIDE ALONG with the cell assignment (the exact-tiled
    // discipline): the dense-corpus alternative — materialize id-pair
    // candidates, then join the vector payload on twice — was measured
    // slower than brute force at sf1 (the candidate×vector join
    // shuffles candidates·|vec| bytes; carrying vectors shuffles only
    // assignments·|vec| = O(n·probes) and verifies inline in the
    // codegen'd dot kernel, with nothing corpus-quadratic ever rowed
    // through an exchange).
    val v = toDouble(col(vecCol))
    val cellVecs = emb.select(col(idCol).as("id"), v.as("v"),
        norm(v).as("nrm"),
        explode(topCells(v, centroids, probes)).as("cell"))
      .localCheckpoint()
    val salts = cellVecs.groupBy("cell")
      .agg(count(lit(1)).as("pop"))
      .select(col("cell"), ceil(col("pop") / lit(cap)).cast("int")
        .as("salts"))
    // the salt is ANSWER-VISIBLE above the cap (over-cap cells keep
    // only within-salt pairs), so it uses the house md5 hash — the
    // only hash the DuckDB oracle can replay (the q361 rule; the
    // first cut's xxhash64 here was un-replayable and shipped only
    // because no fixture bound the cap)
    val cv = cellVecs.join(broadcast(salts), Seq("cell"))
      .withColumn("salt",
        pmod(graft.functions.TextAnalysis.tokenHash(
          concat(lit("nd:"), col("id").cast("string"))), col("salts")))
      .drop("salts")
    cv.as("x").join(cv.as("y"),
        col("x.cell") === col("y.cell") && col("x.salt") === col("y.salt") &&
          col("x.id") < col("y.id"))
      .withColumn("sim",
        dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm")))
      .filter(col("sim") >= threshold)
      // multiprobe finds a pair once per shared cell; the recomputed
      // sim is bit-identical (same doubles, same fold), so a plain
      // distinct on the OUTPUT (already threshold-filtered — far
      // smaller than the candidate surface) collapses the duplicates
      .select(col("x.id").as("vec_a"), col("y.id").as("vec_b"),
        round(col("sim"), 6).as("sim"))
      .distinct()
  }

  /** Deterministic pseudo-random hyperplane for plane p, materialized
    * ONCE at plan time as a literal array (the hyperplane is a constant —
    * recomputing an md5 per (plane, dim) per row, as the SQL oracle
    * spells it, would be pure waste on the executors). Component d is
    * (md5Hex8("p:d") % 2001 - 1000) / 1000 — bit-identical to the SQL
    * formula `(cast('0x'||substr(md5(p||':'||d),1,8) as bigint) % 2001
    * - 1000) / 1000.0`.
    */
  def planeVector(p: Int, dims: Int): Seq[Double] =
    Seq.tabulate(dims)(d =>
      (graft.functions.TextAnalysis.md5Hex8(s"$p:$d") % 2001 - 1000) / 1000.0)

  /** Raw projection vector · hyperplane p — the SIGNED margin, exposed
    * for multi-probe LSH, whose flip-bit choice needs the magnitude,
    * not just the sign. Same left-fold as the SQL oracle's list_reduce
    * (0.0 seed, in-order), so the doubles are bit-identical. */
  def planeProj(vec: Column, p: Int, dims: Int): Column =
    aggregate(
      zip_with(vec, typedLit(planeVector(p, dims)), (x, w) => x * w),
      lit(0.0), (acc, x) => acc + x)

  /** Sign bit of vector · hyperplane p (1 when positive): one zip_with
    * dot against the broadcast literal plane.
    */
  def signBit(vec: Column, p: Int, dims: Int): Column =
    when(planeProj(vec, p, dims) > 0, lit(1)).otherwise(lit(0))

  /** Multi-probe LSH query keys (Lv et al., VLDB 2007): per band, the
    * base signature PLUS `extraProbes` perturbed signatures, each
    * flipping one of the band's lowest-|margin| bits — the bits most
    * likely to disagree for a true near neighbor. The CORPUS keeps one
    * key per band ([[lshCandidates]] unchanged — no extra storage, no
    * extra tables); only the query fans out, so recall rises at the
    * price of `1 + extraProbes` bucket lookups per band instead of
    * more index replicas. Returns an array of (band, key) structs —
    * every expression is a Column over the query row (no driver math),
    * and the flip choice is a deterministic array_sort on
    * (|margin|, bit) pairs, replayable literally in SQL. */
  def multiProbeKeys(vec: Column, bands: Int, bitsPerBand: Int,
                     dims: Int, extraProbes: Int): Column = {
    require(extraProbes < bitsPerBand, "at most bits-1 single-bit probes")
    val perBand = (0 until bands).flatMap { b =>
      val projs = (0 until bitsPerBand)
        .map(i => planeProj(vec, b * bitsPerBand + i, dims))
      val base = projs.zipWithIndex
        .map { case (p, i) => when(p > 0, lit(1 << i)).otherwise(lit(0)) }
        .reduce(_ + _)
      val margins = array_sort(array(projs.zipWithIndex.map {
        case (p, i) => struct(abs(p).as("a"), lit(i).as("i")) }: _*))
      val probes = base +: (0 until extraProbes).map { j =>
        val bit = element_at(margins, j + 1).getField("i")
        base.bitwiseXOR(pow(lit(2.0), bit).cast("int"))
      }
      probes.map(k => struct(lit(b).as("band"), k.as("key")))
    }
    array(perBand: _*)
  }

  /** Seeded bounded sample of vectors for centroid training: order the
    * corpus by a seeded hash of the id (uniform and deterministic) and
    * take the first `n` — a distributed TakeOrdered that moves exactly
    * `n` vectors to the driver, NEVER a full-table collect, so the
    * sample cost is O(n) regardless of corpus size.
    */
  def sampleVectors(emb: DataFrame, idCol: String, vecCol: String,
                    n: Int, seed: Long): Array[Array[Double]] =
    emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
      .orderBy(xxhash64(concat_ws(":", lit(seed.toString),
        col("id").cast("string"))), col("id"))
      .limit(n)
      .collect().map(_.getSeq[Double](1).toArray)

  /** Deterministic k-means++ centroids computed driver-side from a
    * seeded bounded sample ([[sampleVectors]]). Driver-side iteration
    * keeps the centroids bit-deterministic — a distributed float sum
    * would depend on partition order.
    */
  def kmeansCentroids(sample: Array[Array[Double]], k: Int, iters: Int,
                      seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val n = sample.length
    val dims = sample.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dims) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ seeding. The min-distance array is maintained
    // incrementally (each new centroid can only LOWER a point's d²,
    // and min over all centroids == fold of mins), so seeding is
    // O(k·n·dims), not O(k²·n·dims) — same picks bit-for-bit, which
    // the q30/q107 late-bound oracles depend on.
    val centroids = scala.collection.mutable.ArrayBuffer(
      sample(rnd.nextInt(n)).clone())
    val d2 = sample.map(v => dist2(v, centroids(0)))
    while (centroids.length < k) {
      val total = d2.sum
      var pick = rnd.nextDouble() * total
      var idx = 0
      while (idx < n - 1 && pick > d2(idx)) { pick -= d2(idx); idx += 1 }
      val c = sample(idx).clone()
      centroids += c
      var i = 0
      while (i < n) {
        val d = dist2(sample(i), c); if (d < d2(i)) d2(i) = d; i += 1
      }
    }
    // Lloyd iterations
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dims))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) {
          val d = dist2(v, centroids(c)); if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < dims) { sums(best)(i) += v(i); i += 1 }
      }
      (0 until k).foreach { c =>
        if (counts(c) > 0)
          centroids(c) = sums(c).map(_ / counts(c))
      }
    }
    centroids.toArray
  }

  /** Single-cell cosine assignment against literal centroids: the cell
    * (and its sim) of the best centroid, ties resolved exactly as
    * [[ivfAssign]] resolves them (descending (sim, cell) struct order,
    * mirrored by the oracle's list_reverse_sort).
    */
  def assignBest(v: Column, centroids: Array[Array[Double]]): Column = {
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(v, typedLit(c.toSeq)).as("sim"), lit(i).as("cell"))
    }
    element_at(reverse(array_sort(array(cells: _*))), 1)
  }

  /** Distributed Lloyd iterations — the k-means scale path the seeded
    * driver-side trainer ([[kmeansCentroids]]) is the bounded-sample
    * approximation of. Each round assigns EVERY vector to its nearest
    * current centroid (a scan against plan-time literals, no join) and
    * re-estimates centroids from per-(cell, dim) aggregates. The float
    * determinism problem of a distributed mean — partition order
    * changes the IEEE sum — is solved the q78 way: components quantize
    * to integer micro-units BEFORE the sum, so the aggregate is an
    * exact long sum (associative, partition-order-free) and the new
    * centroid component is the one fixed-order double division
    * (sum/10^6)/count. Driver state per round is k·dims longs + k
    * counts — bounded regardless of corpus size; empty cells keep
    * their previous centroid. The result is bit-reproducible across
    * any partitioning, which is what lets the DuckDB oracle replay the
    * final assignment from centroid literals.
    */
  def lloydRoundsDistributed(emb: DataFrame, idCol: String, vecCol: String,
                             init: Array[Array[Double]], rounds: Int)
      : Array[Array[Double]] = {
    val dims = init.head.length
    val e = emb.select(toDouble(col(vecCol)).as("v")).localCheckpoint()
    // one micro-unit sum column per dimension: the aggregation input
    // stays one row per vector (never the ×dims explode — at corpus
    // scale that multiplication IS the shuffle), map-side partials
    // reduce each task to at most k rows of dims+1 longs
    val sumCols = (0 until dims).map(d =>
      sum(round(element_at(col("v"), d + 1) * lit(1000000.0)).cast("long"))
        .as(s"s$d"))
    var cents = init
    (0 until rounds).foreach { _ =>
      val rows = e
        .select(element_at(topCells(col("v"), cents, 1), 1).as("cell"),
          col("v"))
        .groupBy("cell")
        .agg(count(lit(1)).as("cnt"), sumCols: _*)
        .collect()
      val next = cents.map(_.clone())
      rows.foreach { r =>
        val cell = r.getInt(0)
        val cnt = r.getLong(1)
        (0 until dims).foreach(d =>
          next(cell)(d) = (r.getLong(2 + d).toDouble / 1000000.0) / cnt)
      }
      cents = next
    }
    cents
  }

  /** Assign each vector to its `probes` nearest centroids (by cosine):
    * (id, cell) rows. The centroid matrix rides along as a broadcast
    * literal; each assignment is `k` codegen'd dot products.
    */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
                centroids: Array[Array[Double]], probes: Int): DataFrame =
    emb.select(col(idCol).as("id"),
        explode(topCells(toDouble(col(vecCol)), centroids, probes))
          .as("cell"))

  /** Top-`probes` cell indices by cosine, (sim desc, cell desc) — the
    * codegen'd kernel form of the k-struct array_sort (bit- and
    * tie-identical values; see [[graft.expressions.TopCellsDbl]]).
    * The struct form materializes k structs + a k·log k object sort
    * per row and recomputes ‖v‖ under every centroid — measured 22 s
    * where this kernel needs < 1 s (312 cells × 20k rows).
    */
  def topCells(v: Column, centroids: Array[Array[Double]],
               probes: Int): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.TopCellsDbl(
      org.apache.spark.sql.GraftExpr.expression(v), centroids, probes))

  /** Near-dup pairs above a cosine threshold, IVF-gated: candidates are
    * pairs sharing one of their `probes` nearest of `k` centroids, then
    * exact-cosine verified. The scale path for embedding dedup (the
    * FAISS-IVF shape): candidate count ~ Σ cell² instead of n², and no
    * all-pairs join ever materializes. Sign-bit LSH is NOT usable here:
    * at thresholds this low (0.4) the per-bit agreement probability is
    * ~0.63, so any banding with usable recall generates more candidate
    * pairs than brute force.
    *
    * RECALL CONTRACT (changed in r12, documented per r12 advice): this
    * is exact-over-candidates, and since r12 the candidate cells are
    * additionally SALT-CAPPED at `blockCap` (default
    * [[NswIndex.DefaultBlockCap]]) — a cell denser than the cap splits
    * into id-hash sub-blocks and co-cell pairs landing in different
    * sub-blocks are NOT candidates. Below the cap (every cell ≤
    * blockCap assignments) the result is identical to the historical
    * uncapped enumeration; above it recall over dense cells drops to
    * a ~1/salts per-pair sample of the within-cell surface. Overall
    * recall is data-dependent either way (no theoretical guarantee at
    * arbitrary thresholds) — the exact-pairs DuckDB oracle gates it
    * per corpus. Callers that need the historical all-co-cell-pairs
    * behavior and own the density quadratic pass `blockCap <= 0` (the
    * uncapped escape hatch).
    */
  def nearDupIvf(emb: DataFrame, idCol: String, vecCol: String,
                 threshold: Double, k: Int = 16, probes: Int = 2,
                 seed: Long = 42, maxSample: Int = 4096,
                 blockCap: Int = NswIndex.DefaultBlockCap): DataFrame = {
    val sample = sampleVectors(emb, idCol, vecCol, maxSample, seed)
    val centroids = kmeansCentroids(sample, k, iters = 10, seed = seed)
    nearDupWithCentroids(emb, idCol, vecCol, threshold, centroids, probes,
      blockCap)
  }

  /** Product-quantization codebook (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011): the vector space is cut
    * into `m` subspaces of dims/m dimensions and each subspace gets its
    * own k-centroid codebook, trained by the same deterministic
    * driver-side k-means as IVF (seeded bounded sample — O(sample),
    * never a full collect). A 64-dim float vector (256 B) compresses to
    * m bytes (here 8) — the memory-bound regime that makes
    * billion-vector ANN feasible at all.
    */
  def pqTrain(sample: Array[Array[Double]], m: Int, k: Int, iters: Int,
              seed: Long): Array[Array[Array[Double]]] = {
    val dsub = sample.head.length / m
    Array.tabulate(m) { mi =>
      val sub = sample.map(_.slice(mi * dsub, (mi + 1) * dsub))
      kmeansCentroids(sub, k, iters, seed + mi)
    }
  }

  /** All-subspace PQ codes as ONE array column, computed by the
    * codegen'd kernel ([[graft.expressions.PqEncodeDbl]]). The
    * expression form ([[pqEncode]]) inlines m×k×(dsub+3) Catalyst
    * nodes — at m=8,k=16 that blows Janino's 64 KB method limit,
    * whole-stage codegen is disabled for the stage, and the tree runs
    * interpreted; the kernel is the same arithmetic (inner-product
    * expansion, strict-less tie-break) as one tight loop that keeps
    * the stage inside codegen. Bit-identical codes (same IEEE order).
    */
  def pqEncodeKernel(v: Column, codebook: Array[Array[Array[Double]]])
      : Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.PqEncodeDbl(
      org.apache.spark.sql.GraftExpr.expression(v), codebook))

  /** Per-subspace PQ codes for a double-array column: code m is the
    * centroid minimizing ||v_m - c||², computed with the inner-product
    * expansion |c|² - 2⟨v_m, c⟩ (|v_m|² is constant within a subspace,
    * so it cannot change the argmin) — half the expression nodes of the
    * squared-difference form, all plain codegen'd arithmetic against
    * literal centroid components, with deterministic centroid-index
    * tie-break. One column per subspace. Prefer [[pqEncodeKernel]] in
    * query plans (this form is the spec's cross-check reference).
    */
  def pqEncode(v: Column, codebook: Array[Array[Array[Double]]])
      : Seq[Column] = {
    val dsub = codebook(0)(0).length
    codebook.zipWithIndex.map { case (cents, mi) =>
      val cells = cents.zipWithIndex.map { case (cvec, ci) =>
        val dotVc = cvec.zipWithIndex.map { case (cv, di) =>
          element_at(v, mi * dsub + di + 1) * lit(cv)
        }.reduce(_ + _)
        val cn2 = cvec.foldLeft(0.0)((s, x) => s + x * x)
        struct((lit(cn2) + (lit(-2.0) * dotVc)).as("d"), lit(ci).as("c"))
      }
      array_min(array(cells: _*)).getField("c")
    }
  }

  /** Reconstruction of a PQ-coded vector: concatenate each subspace's
    * centroid, looked up from the literal codebook by the code column.
    * No float arithmetic — pure literal-array indexing.
    */
  def pqRecon(codes: Seq[Column], codebook: Array[Array[Array[Double]]])
      : Column =
    concat(codes.zipWithIndex.map { case (code, mi) =>
      element_at(typedLit(codebook(mi).map(_.toSeq).toSeq), code + 1)
    }: _*)

  /** LSH bucket keys: `bands` bands of `bitsPerBand` sign bits each.
    * Returns (id, band, key) rows — join on equal (band, key) for
    * candidates. `dims` is the (fixed) embedding dimensionality, needed
    * to materialize the literal plane matrix at plan time.
    */
  def lshCandidates(emb: DataFrame, idCol: String, vecCol: String,
                    bands: Int, bitsPerBand: Int, dims: Int): DataFrame = {
    val v = toDouble(col(vecCol))
    val bandCols = (0 until bands).map { b =>
      val key = (0 until bitsPerBand)
        .map(i => signBit(v, b * bitsPerBand + i, dims) * (1 << i))
        .reduce((x, y) => x + y)
      struct(lit(b).as("band"), key.as("key"))
    }
    emb.select(col(idCol).as("id"), explode(array(bandCols: _*)).as("e"))
      .select(col("id"), col("e.band"), col("e.key"))
  }
}
