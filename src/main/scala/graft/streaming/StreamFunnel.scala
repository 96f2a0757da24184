package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q217's ordered conversion funnel: per-user state
  * is THREE booleans (saw view / saw qualified click / converted), so
  * arbitrarily long histories cost O(1) state — the batch operator's
  * running-min windows re-derive the same flags from the full sort.
  *
  * Emits one row per stage ADVANCE ("view", "view_click",
  * "view_click_purchase"), so the drained stream's distinct (user,
  * stage) set equals the batch q217 per-user stage flags, including a
  * funnel that completes across micro-batch boundaries. Re-delivered
  * events are silent: a stage already reached cannot be re-entered,
  * which makes the Append-mode output replay-safe for free.
  *
  * Ordering contract (the [[StreamTransitions]] one): within a batch
  * a user's rows sort by (ts, event_id); across batches the source
  * delivers each user's events in nondecreasing order.
  */
object StreamFunnel {

  /** (user_id, stage) rows, one per stage advance. */
  def stages(events: DataFrame): Dataset[(Long, String)] = {
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
        (u: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[(Boolean, Boolean, Boolean)]) =>
          var (v, c, p) = state.getOption.getOrElse((false, false, false))
          val out = Seq.newBuilder[(Long, String)]
          rows.toSeq.sortBy(r => (r._2, r._3)).foreach { r =>
            r._4 match {
              case "view" if !v =>
                v = true; out += ((u, "view"))
              case "click" if v && !c =>
                c = true; out += ((u, "view_click"))
              case "purchase" if c && !p =>
                p = true; out += ((u, "view_click_purchase"))
              case _ => ()
            }
          }
          state.update((v, c, p))
          out.result().iterator
      }
  }
}
