package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming exact dedup: emit each distinct content exactly once
  * across ALL micro-batches, attributed to its first-seen doc.
  *
  * The corpus never arrives in one batch at 100 TB — it streams in as
  * crawls land. Cross-batch dedup therefore needs persistent state:
  * the content hash is the grouping key, so Spark's state store holds
  * one boolean per distinct content, partitioned by the same hash the
  * shuffle already uses. Within a batch the FIRST row per key (by the
  * caller-chosen tiebreak column) wins, matching the batch operator's
  * min-id canonicalization; later batches hit `seen` state and emit
  * nothing. State size is O(distinct contents) spread across
  * executors — the same footprint the batch groupBy needs, kept warm
  * instead of recomputed.
  */
object StreamDedup {

  /** @param docs   streaming Dataset with `idCol` and `contentCol`
    * @return (content_hash, canonical_id) — one row per first-ever-seen
    *         content, emitted in the micro-batch that first carried it
    */
  def firstSeen(docs: DataFrame, idCol: String, contentCol: String): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(md5(col(contentCol)).as("content_hash"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((hash, rows.map(_._2).min))
          }
      }
  }
}
