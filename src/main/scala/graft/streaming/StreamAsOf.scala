package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stream twin of ops/AsOf (q8/q35):
  * a probe stream is enriched with the latest reference value whose
  * time is ≤ the probe's time, per key.
  *
  * Both inputs ride ONE tagged union stream (side 0 = reference
  * update, side 1 = probe) so a single keyed state map serves the
  * join; state per key is O(1) — the (ts, value) of the newest
  * reference update — which equals full as-of under the per-key
  * nondecreasing arrival contract every streaming op in this package
  * shares (BlockIngest's follower ordering). Within a batch, rows
  * sort by (ts, side): a reference update at time T is visible to a
  * probe at the same T — exactly AsOf.asofJoin's `<=` tie rule.
  *
  * Late (contract-violating) reference updates chain through the
  * stored newest value rather than re-sorting history — the standard
  * O(1)-state trade, identical to StreamTransitions' note.
  */
object StreamAsOf {

  /** Input columns: (key: String, ts: Long, side: Int — 0 reference /
    * 1 probe, value: Long — reference value, null/ignored for
    * probes). Emits one row per PROBE: (key, ts, asof_value) with
    * asof_value = −1 when no reference at or before it exists (a
    * sentinel keeps the tuple encoder simple; callers filter).
    */
  def enrich(tagged: DataFrame): Dataset[(String, Long, Long)] = {
    val spark = tagged.sparkSession
    import spark.implicits._
    tagged
      .select(col("key").cast("string"), col("ts").cast("long"),
        col("side").cast("int"),
        coalesce(col("value").cast("long"), lit(-1L)).as("value"))
      .as[(String, Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[(String, Long, Int, Long)],
         state: GroupState[(Long, Long)]) =>
          // (ts, side): reference-before-probe at equal ts — the
          // asofJoin tie order
          val batch = rows.toSeq.sortBy(r => (r._2, r._3))
          var last = state.getOption
          val out = batch.flatMap {
            case (_, ts, 0, v) =>
              last = Some((ts, v)); None
            case (k, ts, _, _) =>
              Some((k, ts, last.map(_._2).getOrElse(-1L)))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
