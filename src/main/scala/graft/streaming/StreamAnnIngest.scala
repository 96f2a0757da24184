package graft.streaming

import graft.ops.VectorSearch.{cosine, toDouble}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming ANN ingest: continuous nearest-neighbor monitoring of an
  * ARRIVING vector stream against a standing query — the serving twin
  * of the batch IVF probe (q30) the way StreamTopK twins TopK.
  *
  * At 100 TB the corpus doesn't exist before the first search: vectors
  * land as embedding jobs finish, and "what are the query's nearest
  * neighbors so far?" must be answerable at every commit. The batch
  * probe's geometry is reused verbatim — the same trained centroid
  * literals assign each arriving vector to its top-`probes` cells
  * MAP-SIDE (a pure column expression; no shuffle before the keyed
  * state), rows outside the query's probed cells are dropped at
  * arrival (the IVF pruning, applied to the stream), and each probed
  * cell keeps a running top-k of query similarity in O(k) state via
  * [[StreamTopK.admissions]].
  *
  * The inherited guarantee (StreamTopK's prefix-dominance): any row of
  * the final per-cell top-k was admitted at its arrival, so the true
  * IVF answer is exactly the batch top-k OF the admission log — a
  * k-bounded re-rank instead of a corpus re-scan, at any point in the
  * stream's life. Similarity is micro-quantized (round(cos·1e6)) into
  * a long, the engine-portable total order every ranking here uses;
  * the spec compares against a batch side computed with the identical
  * expression.
  */
object StreamAnnIngest {

  /** The micro-quantized DESCENDING contest key: ascending (nscore,
    * id) ranks highest-cosine first, id tiebreak. One definition
    * serves the stream and the spec's batch twin. */
  def nscore(v: Column, query: Seq[Double]): Column =
    -round(cosine(v, typedLit(query)) * 1e6, 0).cast("long")

  /** The query's `probes` nearest cells, computed once driver-side
    * (O(k·dims) — the same constants the oracle would embed). */
  def queryCells(centroids: Array[Array[Double]], query: Array[Double],
                 probes: Int): Seq[Int] = {
    val qn = math.sqrt(query.map(x => x * x).sum)
    centroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val dot = c.zip(query).map { case (a, b) => a * b }.sum
      (-dot / (cn * qn), i)
    }.sorted.take(probes).map(_._2).toSeq
  }

  /** Admission log of the standing query's running per-cell top-k
    * over the arriving stream: emits (cell, nscore, id) whenever an
    * arrival enters its cell's current top-k. Works identically on a
    * streaming or batch `vecs` frame (the spec's drain == batch
    * contract). */
  def probeAdmissions(vecs: DataFrame, idCol: String, vecCol: String,
                      centroids: Array[Array[Double]], probes: Int,
                      query: Array[Double],
                      k: Int): Dataset[(Long, Long, Long)] = {
    val qCells = queryCells(centroids, query, probes)
    val v = toDouble(col(vecCol))
    val cells = centroids.zipWithIndex.map { case (c, i) =>
      struct(cosine(v, typedLit(c.toSeq)).as("sim"), lit(i).as("cell"))
    }
    val scored = vecs
      .select(col(idCol).cast("long").as("id"), v.as("v"),
        explode(slice(reverse(array_sort(array(cells: _*))), 1, probes))
          .as("e"))
      .select(col("id"), col("e.cell").as("cell"), col("v"))
      .filter(col("cell").isin(qCells: _*))
      .select(col("cell").cast("long").as("cell"),
        nscore(col("v"), query.toSeq).as("nscore"), col("id"))
    StreamTopK.admissions(scored, "cell", "nscore", "id", k)
  }
}
