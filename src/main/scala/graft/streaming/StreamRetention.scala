package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q218's cohort retention: per-user state is the
  * first-active day plus a 4-BIT emission mask (offsets 0/1/7/14), so
  * cohort membership streams with O(1) state per user — the batch
  * operator re-derives the same rows from a distinct (user, day)
  * projection.
  *
  * Emits (user_id, cohort_day, day_offset) exactly once per tracked
  * offset; re-delivered or same-day events are silent (the bit is
  * already set), which makes Append-mode output replay-safe.
  *
  * Ordering contract: across batches each user's events arrive in
  * nondecreasing ts order (the shared streaming contract) — the
  * first event ever seen fixes the cohort day.
  */
object StreamRetention {

  val Offsets: Seq[Long] = Seq(0L, 1L, 7L, 14L)

  /** (user_id, cohort_day, day_offset) rows, one per first activity
    * at a tracked offset.
    */
  def activity(events: DataFrame): Dataset[(Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long").as("u"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_id").cast("long").as("eid"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (u: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Int)]) =>
          val batch = rows.toSeq.sortBy(r => (r._2, r._3))
          var (d0, mask) = state.getOption.getOrElse(
            (batch.head._2, 0))
          val out = Seq.newBuilder[(Long, Long, Long)]
          batch.foreach { r =>
            val off = r._2 - d0
            val i = Offsets.indexOf(off)
            if (i >= 0 && (mask & (1 << i)) == 0) {
              mask |= 1 << i
              out += ((u, d0, off))
            }
          }
          state.update((d0, mask))
          out.result().iterator
      }
  }
}
