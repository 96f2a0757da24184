package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q302's first-touch attribution model: every
  * purchase is credited, at arrival time, to the user's earliest
  * qualifying (non-purchase) touch.
  *
  * State per user is O(1) — the minimal (ts, event_id, type) touch
  * under the pinned (ts, event_id) total order — and the update is a
  * MIN-MERGE: order-independent and replay-idempotent by algebra
  * (a re-delivered or late touch can only re-propose an equal or
  * later element, which min discards; an EARLIER late touch corrects
  * the state the way the batch query would have seen it). Purchases
  * are emitted with the state as of their position in the per-batch
  * (ts, event_id) sort, so a same-timestamp touch is visible to a
  * purchase exactly when its event_id is smaller — q302's
  * UNBOUNDED-PRECEDING-TO-1-PRECEDING window tie rule, reproduced.
  *
  * The emitted attribution for a purchase is FINAL at emission (the
  * standard streaming trade: a touch arriving later than the purchase
  * it should have preceded cannot retract the emitted row — the same
  * chain-through-state note as StreamAsOf/StreamTransitions).
  */
object StreamAttribution {

  /** Input columns: (user_id: Long, tus: Long — event time micros,
    * eid: Long, event_type: String). Emits one row per purchase:
    * (user_id, eid, first_ty) with first_ty = "none" when no touch
    * precedes it.
    */
  def attribute(events: DataFrame): Dataset[(Long, Long, String)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("tus").cast("long"),
        col("eid").cast("long"), col("event_type").cast("string"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val batch = rows.toSeq.sortBy(r => (r._2, r._3))
          var first = state.getOption
          val out = batch.flatMap {
            case (_, ts, e, ty) if ty != "purchase" =>
              if (first.forall(f =>
                ts < f._1 || (ts == f._1 && e < f._2)))
                first = Some((ts, e, ty))
              None
            case (u, _, e, _) =>
              Some((u, e, first.map(_._3).getOrElse("none")))
          }
          first.foreach(state.update)
          out.iterator
      }
  }
}
