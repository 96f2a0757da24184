package graft.ops

import graft.ops.VectorSearch.{dot, toDouble}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Coverage-maximizing data selection: greedy k-center (Gonzalez '85
  * farthest-point traversal, the 2-approximation every coreset /
  * "select the most diverse k examples" pipeline uses).
  *
  * Shape per round: ONE scan computes each vector's min distance to
  * the chosen centers (a least-chain of codegen'd dot products against
  * k literal vectors — no join), and a TakeOrdered(1) picks the
  * farthest point. Driver state is k vectors; per-round cost is one
  * corpus scan — the q89/q106 bounded-collect contract, never a
  * pairwise materialization.
  *
  * Determinism: squared distances quantize to integer MICRO-UNITS per
  * center BEFORE the min/argmax (floor is monotone, so per-center
  * flooring commutes with the min), and ties break on the smaller id —
  * the selection replays bit-identically in any engine that folds the
  * dot product left-to-right (the DuckDB oracle does).
  */
object Coreset {

  /** Greedy k-center over `vecCol`. Seed = the minimum id. Returns one
    * row per round: (round 1-based, selected id, the selected point's
    * min-distance-to-prior-centers in micro-units; -1 for the seed).
    */
  def kCenter(emb: DataFrame, idCol: String, vecCol: String,
              k: Int): Seq[(Long, Long, Long)] = {
    val e = emb
      .select(col(idCol).cast("long").as("id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("nsq", dot(col("v"), col("v")))
      .localCheckpoint() // k scans + the seed lookup share this
    val seed = e.orderBy(col("id")).limit(1)
      .select(col("id"), col("v"), col("nsq")).head()
    var centers = List((seed.getSeq[Double](1), seed.getDouble(2)))
    var chosenIds = List(seed.getLong(0))
    val out = Seq.newBuilder[(Long, Long, Long)]
    out += ((1L, seed.getLong(0), -1L))
    (2 to k).foreach { r =>
      val mind = centers.map { case (cv, cn) =>
        // ((nsq + cn) - 2·v·c) floored to micros per center, THEN min —
        // the exact expression the oracle's m_i CTE chain replays
        floor(lit(1e6) * ((col("nsq") + lit(cn)) -
          (lit(2.0) * dot(col("v"), typedLit(cv))))).cast("long")
      }.reduce(least(_, _))
      val sel = e.filter(!col("id").isin(chosenIds.map(x => x: Any): _*))
        .select(col("id"), col("v"), col("nsq"), mind.as("m"))
        .orderBy(col("m").desc, col("id").asc)
        .limit(1).head() // TakeOrdered(1): bounded collect per round
      out += ((r.toLong, sel.getLong(0), sel.getLong(3)))
      centers :+= ((sel.getSeq[Double](1), sel.getDouble(2)))
      chosenIds :+= sel.getLong(0)
    }
    out.result()
  }
}
