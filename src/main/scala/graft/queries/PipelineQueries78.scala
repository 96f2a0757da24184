package graft.queries

import graft.Tables
import graft.ops.VectorSearch
import graft.ops.VectorSearch.{cosine, kmeansCentroids, sampleVectors,
  toDouble}
import graft.streaming.StreamIvfIndex
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seventy-eighth pipeline group — the maintained IVF postings index
  * ([[graft.streaming.StreamIvfIndex]]): the inline IVF probe (q30)
  * re-assigns the whole corpus per question, the maintained store
  * posts each vector ONCE on arrival and every later query is a cell
  * filter over the standing table.
  *
  *  - q395: q30's standing question answered off the MAINTAINED
  *    postings — vectors arrive in three slices with a mid-life
  *    compaction, the store serves part-addressed, the query's probe
  *    cells come off the same served table (the q30 shape), and the
  *    exact re-rank reads the corpus. Identical centroids, probes,
  *    and top-k as q30, so the oracle is q30's generator verbatim
  *    (late-bound centroid literals): maintained must equal inline
  *    bit-for-bit.
  *
  * CONCURRENCY SCOPE: drives a fixed `target/` store path — correct
  * under the strictly-single-threaded driver contract (see
  * [[PipelineQueries75]]'s scope note).
  */
object PipelineQueries78 {

  /** q395's late-bound oracle (q30's generator over the run's trained
    * centroid literals — own slot so a filtered run stands alone). */
  private object MaintainedIvfOracle {
    @volatile var sql: Option[String] = None
  }

  val defs: Seq[QDef] = Seq(

    QDef("q395_ann_ivf_maintained_served",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_ivf_serve").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val emb = Tables.embeddings(s, dir)
        // q30's exact training: the maintained index answers the SAME
        // standing question, so the same matrix is the store identity
        val sample = sampleVectors(emb, "vec_id", "embedding",
          n = 512, seed = 42)
        val cents = kmeansCentroids(sample, k = 16, iters = 10, seed = 42)
        MaintainedIvfOracle.sql = Some(
          VectorQueries.ivfOracleSql(cents, probes = 4, topK = 10))
        // arrivals in three slices, a mid-life compaction BETWEEN
        // appends — the served postings see the rollup + the late batch
        StreamIvfIndex.applyBatch(
          emb.where(pmod(col("vec_id"), lit(3)) === 0), 0L,
          "vec_id", "embedding", cents, 4, store)
        StreamIvfIndex.applyBatch(
          emb.where(pmod(col("vec_id"), lit(3)) === 1), 1L,
          "vec_id", "embedding", cents, 4, store)
        StreamIvfIndex.compact(s, store)
        StreamIvfIndex.applyBatch(
          emb.where(pmod(col("vec_id"), lit(3)) === 2), 2L,
          "vec_id", "embedding", cents, 4, store)
        // centroid-validated serve: this query derived its matrix
        // locally, so the read require-matches the store pin first
        val assign = StreamIvfIndex.servedAssign(s, store, cents, 4)
          .localCheckpoint() // both probe sides read it
        val qCells = broadcast(assign.filter(col("id") === 0)
          .select(col("cell")).distinct())
        val candIds = assign.filter(col("id") =!= 0)
          .join(qCells, "cell")
          .select(col("id").as("vec_id")).distinct()
        val e = emb.select(col("vec_id"),
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
      Some(() => MaintainedIvfOracle.sql)))
}
