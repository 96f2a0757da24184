package graft.streaming

import graft.ops.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming sketch maintenance: cross-batch HyperLogLog registers.
  *
  * Sketches are the streaming-native aggregation — the register merge
  * is commutative, associative, and idempotent, so arrival order,
  * batching, and replays cannot change the final state. The grouping
  * key (e.g. language) is the state key; state per key is the fixed
  * 256-byte register file, NEVER per-element — the cardinality being
  * estimated can grow without bound while state stays O(keys · m).
  *
  * Batch equivalence: the registers after draining any split of the
  * stream equal the batch `groupBy(key, bucket).max(rho)` over the
  * union (spec-pinned), and the estimate goes through the same
  * fold-order-exact arithmetic ([[Sketches.hllEstimateMilliScala]] ==
  * the column expression, also spec-pinned).
  */
object StreamSketch {

  /** Per micro-batch, per key: merge the batch's (bucket, rho) stream
    * into the persistent register file and emit the running estimate.
    * Use with `outputMode("update")` — each batch re-emits the keys it
    * touched.
    *
    * @return (key, est_milli, n_buckets_seen)
    */
  def hllRunningEstimate(rows: DataFrame, keyCol: String, elemCol: String)
      : Dataset[(String, Long, Long)] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(keyCol).cast("string").as("k"),
        Sketches.hash60(col(elemCol)).as("h"))
      .select(col("k"), Sketches.hllBucket(col("h")).as("b"),
        Sketches.hllRho(col("h")).as("r"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (k: String, batch: Iterator[(String, Long, Long)],
         state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(new Array[Int](Sketches.HllM))
          batch.foreach { case (_, b, r) =>
            val bi = b.toInt
            if (r > regs(bi)) regs(bi) = r.toInt
          }
          state.update(regs)
          (k, Sketches.hllEstimateMilliScala(regs),
            regs.count(_ > 0).toLong)
      }
  }
}
