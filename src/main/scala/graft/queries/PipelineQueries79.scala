package graft.queries

import graft.Tables
import graft.ops.VectorSearch
import graft.ops.VectorSearch.{cosine, kmeansCentroids, sampleVectors,
  toDouble, topCells}
import graft.streaming.{StreamIvfIndex, StreamIvfRefresh}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-ninth pipeline group — the IVF identity-change lifecycle:
  * what happens at 100 TB when the maintained index's CENTROID MATRIX
  * itself must change. [[graft.streaming.StreamIvfRefresh]] owns the
  * drift decision (PSI gate over occupancy, retrain from the
  * maintained bottom-K sample); [[graft.streaming.StreamIvfIndex]]
  * owns the postings and PINS the matrix as the store identity. q396
  * drives the full handoff and is the refresh loop's first
  * oracle-checked query:
  *
  *  1. matrix A trains on the corpus, the refresh store initializes
  *     with A's reference occupancy, and the postings store posts the
  *     corpus under A (two slices);
  *  2. a drifted wave arrives — the corpus collapsed into the
  *     positive orthant (per-coordinate abs), ids offset to coexist —
  *     and the PSI gate fires: retrain yields matrix B from the
  *     maintained sample (which spans BOTH modes, so B covers the new
  *     distribution). The wave is deliberately NOT a negation: k-means
  *     cells are balanced, so negating every vector permutes mass
  *     between cells while leaving the occupancy HISTOGRAM near-flat —
  *     invisible to an occupancy PSI (measured here first). The abs
  *     collapse concentrates mass into the orthant-facing cells, the
  *     histogram shift the gate exists to see;
  *  3. B is a NEW store identity: the old store REFUSES a B-keyed
  *     batch (asserted in-query — "swap, never mix" is the pin's
  *     contract, not a convention), and the corpus rebuilds into a
  *     fresh store under B;
  *  4. the standing top-k question answers off the rebuilt served
  *     postings; the oracle replays assignment/probe/top-k over the
  *     SAME union corpus with B as literals (late-bound, the q30
  *     pattern) — the lifecycle's data output is cross-engine checked,
  *     and the lifecycle's CONTROL path (drift fired exactly once,
  *     the old store refused) is require()-pinned so a silent
  *     no-drift run fails Verify loudly instead of testing nothing.
  *
  * CONCURRENCY SCOPE: drives fixed `target/` store paths — correct
  * under the strictly-single-threaded driver contract (see
  * [[PipelineQueries75]]'s scope note).
  */
object PipelineQueries79 {

  /** DuckDB fragments — kept in lockstep with VectorQueries' (the
    * house sequential-fold arithmetic, bit-identical cross-engine). */
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private def cosSql(a: String, b: String): String =
    VectorOracleSql.cos(a, b)
  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** Offset separating the drifted wave's ids from the raw corpus. */
  private val DriftOffset = 1000000L

  /** q396's late-bound oracle: the q30 replay shape over the UNION
    * corpus (raw ∪ abs-collapsed-with-offset) with the RETRAINED
    * matrix B as literals. */
  private object DriftOracle {
    @volatile var sql: Option[String] = None
  }

  private def driftOracleSql(cents: Array[Array[Double]], probes: Int,
                             topK: Int): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    val cells = cents.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + $DriftOffset,
       |    list_transform(embedding, x -> abs(x::DOUBLE))
       |  FROM embeddings),
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

  val defs: Seq[QDef] = Seq(

    QDef("q396_ivf_drift_rebuild",
      (s, dir) => {
        val K = 8
        val P = 4
        val sampleK = 256
        val refresh = new java.io.File(
          "target/stream_ivf_drift_refresh.txt").getAbsolutePath
        val storeA = new java.io.File(
          "target/stream_ivf_drift_a").getAbsolutePath
        val storeB = new java.io.File(
          "target/stream_ivf_drift_b").getAbsolutePath
        graft.ops.Fs.wipe(storeA); graft.ops.Fs.wipe(storeB)
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(refresh))
        val emb = Tables.embeddings(s, dir)
        val raw = emb.select(col("vec_id"), col("embedding"))
        // the drifted wave: the corpus collapsed into the positive
        // orthant (abs per coordinate), ids offset — occupancy
        // concentrates into the orthant-facing cells, so the PSI gate
        // must fire at any SF (a negation would NOT: balanced cells
        // permute, the histogram stays flat)
        val drifted = emb.select(
          (col("vec_id") + lit(DriftOffset)).as("vec_id"),
          transform(col("embedding"), x => abs(x)).as("embedding"))
        // 1. train A, install it with its reference occupancy
        val centsA = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 512, seed = 7),
          k = K, iters = 10, seed = 7)
        val refOcc = new Array[Long](K)
        raw.select(element_at(
            topCells(toDouble(col("embedding")), centsA, 1), 1).as("cell"))
          .groupBy("cell").agg(count(lit(1)).as("c"))
          .collect() // k rows — the occupancy vector, bounded by K
          .foreach(r => refOcc(r.getInt(0)) += r.getLong(1))
        StreamIvfRefresh.init(refresh, centsA, refOcc)
        def observe(batch: DataFrame, bid: Long): Unit =
          StreamIvfRefresh.applyBatch(batch, bid, "vec_id", "embedding",
            K, 64, sampleK, psiThresholdMilli = 100L, refresh)
        // 2. the raw corpus arrives in two slices under A — no drift
        //    (arrival occupancy tracks the reference)
        Seq(0, 1).foreach { b =>
          val slice = raw.where(pmod(col("vec_id"), lit(2)) === b)
          observe(slice, b.toLong)
          StreamIvfIndex.applyBatch(slice, b.toLong, "vec_id",
            "embedding", centsA, P, storeA)
        }
        require(StreamIvfRefresh.readStore(refresh, K, 64, sampleK)
          .refreshes == 0L,
          "same-distribution arrivals must NOT fire the PSI gate")
        // 3. the drifted wave arrives: PSI fires, B retrains from the
        //    maintained two-mode sample
        observe(drifted, 2L)
        val st = StreamIvfRefresh.readStore(refresh, K, 64, sampleK)
        require(st.refreshes == 1L,
          "the orthant-collapsed wave must fire the PSI gate exactly once")
        val centsB = st.centroids
        // B is a NEW identity: the A-pinned store must refuse it —
        // and the probe must assert it failed for THAT reason: any
        // other failure (a corrupt pin's IllegalStateException, a
        // planner error) is a real bug to surface, not a refusal to
        // report as success
        val refused =
          try {
            StreamIvfIndex.applyBatch(drifted, 2L, "vec_id",
              "embedding", centsB, P, storeA)
            false
          } catch {
            case e: IllegalArgumentException
                if e.getMessage != null &&
                  e.getMessage.contains("pinned") => true
          }
        require(refused,
          "the A-pinned postings store must refuse a B-keyed batch — " +
            "identity changes swap stores, never mix postings")
        // 4. rebuild under B into a fresh store, serve, answer
        DriftOracle.sql = Some(driftOracleSql(centsB, P, topK = 10))
        StreamIvfIndex.applyBatch(raw.unionAll(drifted), 0L, "vec_id",
          "embedding", centsB, P, storeB)
        val assign = StreamIvfIndex.servedAssign(s, storeB, centsB, P)
          .localCheckpoint() // both probe sides read it
        val qCells = broadcast(assign.filter(col("id") === 0)
          .select(col("cell")).distinct())
        val candIds = assign.filter(col("id") =!= 0)
          .join(qCells, "cell")
          .select(col("id").as("vec_id")).distinct()
        val e = raw.unionAll(drifted).select(col("vec_id"),
          toDouble(col("embedding")).as("v"))
        val q = broadcast(e.filter(col("vec_id") === 0)
          .select(col("v").as("qv")))
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
      Some(() => DriftOracle.sql)))
}
