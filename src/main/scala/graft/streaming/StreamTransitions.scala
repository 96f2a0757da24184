package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q166's first-order transition matrix: per-user
  * LAST-event state carries across micro-batches, so a transition
  * whose two events land in different batches is still counted — the
  * whole point of keeping state; a per-batch window would silently
  * drop every boundary-spanning transition.
  *
  * State per user is O(1): the (ts, event_id, event_type) of the most
  * recent event. The state store partitions by the same user hash the
  * shuffle already uses — the same layout the batch window needs,
  * kept warm.
  *
  * Ordering contract: within a batch the user's rows sort by
  * (ts, event_id) — the batch operator's exact window order; ACROSS
  * batches the source must deliver each user's events in
  * nondecreasing order (the block-follower/file-arrival contract the
  * other streaming ops share). Out-of-order arrival across batches
  * would chain through the stored last event rather than re-sorting
  * history — the standard trade of O(1) state.
  */
object StreamTransitions {

  /** Per-arrival transition instances (from_type, to_type) — one row
    * per consecutive event pair per user, batch-boundary pairs
    * included. Downstream aggregation (or the q166 normalization)
    * turns instances into the matrix.
    */
  def transitions(events: DataFrame): Dataset[(String, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("u"),
        unix_micros(col("ts")).as("tsu"),
        col("event_id").cast("long").as("eid"),
        col("event_type").as("et"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val batch = rows.toSeq.sortBy(r => (r._2, r._3))
          val chain = state.getOption.toSeq ++
            batch.map(r => (r._2, r._3, r._4))
          if (chain.nonEmpty) state.update(chain.last)
          chain.zip(chain.drop(1)).map { case (a, b) => (a._3, b._3) }
            .iterator
      }
  }
}
