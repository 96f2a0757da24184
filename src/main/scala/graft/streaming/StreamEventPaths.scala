package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q344's 3-step path mining: per-user TAIL state
  * (the last TWO events) carries across micro-batches, so a trigram
  * whose three events straddle a batch boundary is still emitted —
  * [[StreamTransitions]]' argument, one order higher. State per user
  * is O(1): exactly two (ts, event_id, event_type) rows.
  *
  * Same ordering contract as StreamTransitions: within a batch the
  * user's rows sort by (ts, event_id) — the batch window's exact
  * order; across batches the source delivers each user's events in
  * nondecreasing order (the shared file-arrival contract).
  */
object StreamEventPaths {

  /** Per-arrival path instances ("a>b>c") — one row per consecutive
    * event triple per user, batch-boundary triples included.
    * Downstream counting turns instances into q344's table.
    */
  def trigrams(events: DataFrame): Dataset[String] = {
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
         state: GroupState[List[(Long, Long, String)]]) =>
          val batch = rows.toSeq.sortBy(r => (r._2, r._3))
          val chain = state.getOption.getOrElse(Nil) ++
            batch.map(r => (r._2, r._3, r._4))
          if (chain.nonEmpty) state.update(chain.takeRight(2).toList)
          chain.sliding(3).filter(_.length == 3)
            .map(_.map(_._3).mkString(">"))
            .iterator
      }
  }
}
