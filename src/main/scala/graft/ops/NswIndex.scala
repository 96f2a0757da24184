package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import VectorSearch._

/** Graph ANN, Spark-first: a navigable-small-world-STYLE index built
  * and searched as bounded-round joins (Malkov & Yashunin's NSW/HNSW
  * searches by pointer-chasing a beam through a neighbor graph — the
  * one shape a shared-nothing engine cannot run; what it CAN run is
  * the same neighbor graph materialized as an edge table and the same
  * beam search unrolled into a FIXED number of expand-score-prune
  * rounds, each one broadcast join).
  *
  * Build: vectors multiprobe-assign to their top-`probes` k-means
  * cells (the q30 coarse quantizer — multiprobe is what makes the
  * graph navigable ACROSS cell borders), candidate neighbors are cell
  * co-residents (the q197 Σ cell² bound — never an all-pairs join),
  * and each node keeps its top-`m` by rounded cosine with id
  * tiebreak; edges are symmetrized. At 100 TB the build is one
  * bounded-candidate join + one per-group top-k — the same scale
  * shape as the LSH band join.
  *
  * Search: the beam starts at deterministic entry points (per probed
  * query cell), and each round expands the beam's neighbors via the
  * edge table (beam is ≤ `beamWidth` rows → ALWAYS the broadcast
  * side), re-scores ≤ beamWidth·(m+1) candidates against the query,
  * and keeps the top `beamWidth`. Rounds are fixed — the KCore
  * bounded-round discipline — so the whole search is `rounds`
  * broadcast joins over the edge table, no driver loop over data.
  * Candidate budget: |entries| + rounds · beamWidth · m scored rows,
  * independent of corpus size once the graph exists.
  *
  * Determinism contract (what makes the DuckDB replay possible):
  * every ranking anywhere — neighbor top-m, beam prune, final top-k —
  * orders by (round(cosine, 6) DESC, id ASC).
  */
object NswIndex {

  /** The single source of truth for [[knnGraph]]'s `blockCap` default.
    * The DuckDB oracle replay (VectorQueries2.nswCandCtes) must use the
    * SAME value — callers that rely on the replayed graph pass this
    * constant explicitly so a change here cannot silently diverge the
    * two engines. */
  val DefaultBlockCap = 256

  /** Conf override for the cap — the capped-verify lane (r13 verdict
    * #3) lowers it at sf0.1 so the salt BINDS at a scale the DuckDB
    * oracle can still replay (the default only binds at sf1+, which
    * the sf0.01 gate never sees: exactly how q145's undercount hid
    * for a round). Query sites read this ONCE per run and pass the
    * same value to both the Spark build and the oracle generator. */
  val BlockCapConf = "spark.graft.nsw.blockCap"

  def effectiveBlockCap(spark: org.apache.spark.sql.SparkSession): Int =
    spark.conf.getOption(BlockCapConf).map(_.toInt)
      .getOrElse(DefaultBlockCap)

  /** The symmetrized cell-bounded k-NN edge table: (src, dst) longs.
    * `emb` must already exclude any query-only rows.
    *
    * `blockCap` is what makes the build UNCONDITIONALLY linear: with a
    * fixed-k coarse quantizer, cell population grows with the corpus
    * and the Σ cell² candidate join grows quadratically (measured:
    * q257 4.3 s at sf0.1 → 334 s at sf1 before the cap). Every cell
    * whose population exceeds the cap is therefore salted into
    * ceil(cn / blockCap) deterministic sub-blocks (hash of the id —
    * content-independent, replayable), and candidates pair only
    * within (cell, salt): Σ block² ≤ assignments · blockCap = O(n).
    * Cross-salt neighbors inside one cell are sacrificed; multiprobe
    * keeps the graph navigable because a vector's `probes` cells are
    * salted independently. Below the cap (sf0.01/sf0.1 fixtures:
    * ~60-250 assignments/cell) every salt count is 1 and the graph is
    * bit-identical to the uncapped build.
    */
  /** [[knnGraph]] behind the [[ArtifactStore]]: the edge table is a
    * write-once artifact addressed by the CORPUS CONTENT fingerprint
    * and the build params, so within a sweep (and across sweeps over
    * the same corpus) the graph builds once and every later caller
    * serves a plain parquet scan — identical rows either way, since
    * the build is integer-deterministic and (src,dst) longs round-trip
    * parquet exactly. With no artifact root configured this IS
    * [[knnGraph]] (the spec-pinned inline shape).
    *
    * `fpKey` names the physical corpus (dir + table + filter tag) for
    * the session fingerprint memo — distinct corpora must use
    * distinct keys.
    */
  def knnGraphArtifact(emb: DataFrame, idCol: String, vecCol: String,
                       centroids: Array[Array[Double]], probes: Int,
                       m: Int, blockCap: Int, fpKey: String,
                       assignOpt: Option[DataFrame] = None): DataFrame = {
    val spark = emb.sparkSession
    if (ArtifactStore.root(spark).isEmpty)
      knnGraph(emb, idCol, vecCol, centroids, probes, m, blockCap,
        assignOpt)
    else {
      val fp = ArtifactStore.fingerprint(
        emb.select(col(idCol), col(vecCol)), fpKey)
      // FULL digest of the centroid literals (r13 advice: a 32-bit
      // String.hashCode collision would silently serve an edge table
      // built from different centroids, with no staleness signal)
      val ch = ArtifactStore.contentHash(
        centroids.map(_.mkString(",")).mkString("|"))
      val params =
        s"k=${centroids.length},ch=$ch,probes=$probes,m=$m,cap=$blockCap"
      ArtifactStore.buildOrServe(spark, "nsw_knn_graph", fp, params,
        sourceKey = fpKey)(
        knnGraph(emb, idCol, vecCol, centroids, probes, m, blockCap,
          assignOpt))
    }
  }

  def knnGraph(emb: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], probes: Int,
               m: Int, blockCap: Int = DefaultBlockCap,
               assignOpt: Option[DataFrame] = None): DataFrame = {
    // callers that already materialized the (id, cell) assignment for
    // entry election pass it in; both paths are the same checkpointed
    // ivfAssign frame
    val assign0 = assignOpt.getOrElse(
      ivfAssign(emb, idCol, vecCol, centroids, probes)
        .localCheckpoint()) // cell-size agg + the salted join read it
    val sizes = assign0.groupBy("cell")
      .agg(count(lit(1)).as("cn")) // O(k) rows — broadcast back
    val assign = assign0.join(broadcast(sizes), "cell")
      .withColumn("salt",
        pmod(graft.functions.TextAnalysis.tokenHash(
          concat(lit("nsw:"), col("id").cast("string"))),
          expr(s"greatest(1, (cn + ${blockCap - 1}) div $blockCap)")))
    val vecs = emb.select(col(idCol).cast("long").as("id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", norm(col("v")))
      .localCheckpoint() // src-score + dst-score sides share it
    val cand = assign.as("x").join(assign.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.salt") === col("y.salt") &&
          col("x.id") =!= col("y.id"))
      .select(col("x.id").cast("long").as("src"),
        col("y.id").cast("long").as("dst"))
      .distinct() // multiprobe can collide a pair in 2 cells
    val scored = cand
      .join(vecs.select(col("id").as("src"), col("v").as("sv"),
        col("nrm").as("sn")), "src")
      .join(vecs.select(col("id").as("dst"), col("v").as("dv"),
        col("nrm").as("dn")), "dst")
      .select(col("src"), col("dst"),
        round(dot(col("sv"), col("dv")) / (col("sn") * col("dn")), 6)
          .as("sim"))
    val topm = TopK.perGroup(scored, "src",
        struct((-col("sim")).as("ns"), col("dst").as("dst")), m)
      .select(col("src").cast("long").as("src"),
        col("key.dst").as("dst"))
    topm.unionByName(topm.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct()
  }

  /** HNSW-style deterministic layer membership: node `id` belongs to
    * layer `l` iff tokenHash("lvl:" ++ id) ≡ 0 (mod 4^l) — the house-
    * hash twin of HNSW's geometric level draw (Malkov & Yashunin,
    * TPAMI 2018), P(level ≥ l) = 4^-l, replayable bit-for-bit by the
    * DuckDB oracle (md5 prefix both sides). Layer 0 is everyone;
    * each higher layer is a ~4× sparser subset whose salt-capped
    * [[knnGraph]] is correspondingly cheaper — the coarse-to-fine
    * entry ladder that replaces q257's flat per-cell entry election
    * with O(log n) descent at query time.
    */
  def atLevel(id: Column, l: Int): Column =
    if (l <= 0) lit(true)
    else pmod(graft.functions.TextAnalysis.tokenHash(
      concat(lit("lvl:"), id.cast("string"))),
      lit(math.pow(4, l).toLong)) === 0L

  /** Fixed-beam, fixed-round search. `vecs` is (id, v, nrm) for the
    * corpus (localCheckpointed by the caller), `edges` the
    * [[knnGraph]] output, `query` a ONE-ROW frame (qv, qn). Returns
    * the final beam as (id, sim).
    */
  def beamSearch(vecs: DataFrame, edges: DataFrame, query: DataFrame,
                 entries: DataFrame, beamWidth: Int,
                 rounds: Int): DataFrame = {
    // ids is O(beamWidth·m) rows — ALWAYS the broadcast side; the
    // corpus frame never shuffles for the lookup
    def score(ids: DataFrame): DataFrame = vecs
      .join(broadcast(ids), "id")
      .crossJoin(broadcast(query))
      .select(col("id"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    var beam = score(entries.select(col("id")).distinct())
      .orderBy(col("sim").desc, col("id").asc).limit(beamWidth)
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val ids = edges
        .join(broadcast(beam.select(col("id").as("src"))), "src")
        .select(col("dst").as("id"))
        .unionByName(beam.select(col("id")))
        .distinct()
      val next = score(ids)
        .orderBy(col("sim").desc, col("id").asc).limit(beamWidth)
      if (r < rounds) {
        val cp = next.localCheckpoint()
        beam.unpersist(blocking = false) // KCore round discipline
        beam = cp
      } else {
        // the LAST round stays declarative: the caller's plan keeps
        // the broadcast-lookup + bounded-top-k shape visible (plan-
        // contract-pinned) and the result isn't materialized twice.
        // Its parent checkpoint stays resident (beamWidth rows).
        beam = next
      }
    }
    beam
  }

  /** [[beamSearch]] generalized to a query BATCH — the serving shape
    * (ANN indexes are built once and probed by many queries; a
    * per-query driver loop would pay `rounds` Spark jobs PER query).
    * One beam frame keyed by `qid` advances every query's beam in the
    * same `rounds` joins: per round the (qid, id) beam — O(batch ·
    * beamWidth) rows, ALWAYS the broadcast side — expands via the
    * edge table, re-scores against its own query vector (`queries` is
    * the batch frame (qid, qv, qn), broadcast into the score join),
    * and prunes back to beamWidth per qid via the partial/final TopK
    * aggregation (never a corpus-wide window). Candidate budget:
    * batch · (entries + rounds · beamWidth · m) scored rows —
    * corpus-size-independent, linear in the batch.
    */
  def beamSearchBatch(vecs: DataFrame, edges: DataFrame,
                      queries: DataFrame, entries: DataFrame,
                      beamWidth: Int, rounds: Int): DataFrame = {
    // cand is (qid, id), O(batch·beam·m) rows — broadcast so the
    // corpus frame never shuffles for the lookup
    def score(cand: DataFrame): DataFrame = vecs
      .join(broadcast(cand), "id")
      .join(broadcast(queries), "qid")
      .select(col("qid"), col("id"),
        round(dot(col("v"), col("qv")) / (col("nrm") * col("qn")), 6)
          .as("sim"))
    def prune(scored: DataFrame): DataFrame =
      TopK.perGroup(scored, "qid",
          struct((-col("sim")).as("ns"), col("id").as("id")), beamWidth)
        .select(col("qid"), col("key.id").as("id"),
          (-col("key.ns")).as("sim"))
    var beam = prune(score(entries.select(col("qid"), col("id"))
        .distinct()))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val cand = edges
        .join(broadcast(beam.select(col("qid"), col("id").as("src"))),
          "src")
        .select(col("qid"), col("dst").as("id"))
        .unionByName(beam.select(col("qid"), col("id")))
        .distinct()
      val next = prune(score(cand))
      if (r < rounds) {
        val cp = next.localCheckpoint()
        beam.unpersist(blocking = false) // KCore round discipline
        beam = cp
      } else {
        beam = next // declarative last round (see beamSearch)
      }
    }
    beam
  }
}
