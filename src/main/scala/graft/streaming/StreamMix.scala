package graft.streaming

import graft.functions.TextAnalysis.tokenHash
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming data-mixing: the stateful twin of the batch token-budget
  * selector (q84). A corpus that streams in as crawls land cannot be
  * re-sorted globally, so admission is greedy in arrival order with
  * per-source budget STATE carried across micro-batches; within each
  * micro-batch, docs are processed in the batch operator's
  * deterministic (salted hash, id) order, so a single-batch drain
  * reproduces the batch operator exactly.
  */
object StreamMix {

  /** Per-source token-budget admission. State per source is ONE long
    * (tokens admitted so far) — O(#sources) total, the smallest state
    * any cross-batch admission can carry. A doc is admitted while the
    * source's used count is under `budget` (the boundary-crossing doc
    * is included, as in q84 — downstream truncates); everything after
    * is dropped forever, so the admitted set is a stable prefix of the
    * arrival order.
    *
    * @return (doc_id, source, n_tokens, prev_tokens) for admitted docs,
    *         prev_tokens = tokens admitted to the source before this doc
    */
  def tokenBudget(docs: DataFrame, idCol: String, srcCol: String,
                  nTokCol: String, budget: Long)
      : Dataset[(Long, String, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("id"), col(srcCol).as("src"),
        col(nTokCol).cast("long").as("n"),
        tokenHash(concat(lit("mix:"), col(idCol).cast("string"))).as("h"))
      .as[(Long, String, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (src: String, rows: Iterator[(Long, String, Long, Long)],
         state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val out = Seq.newBuilder[(Long, String, Long, Long)]
          // batch-internal determinism: same (h, id) order as q84
          rows.toSeq.sortBy(r => (r._4, r._1)).foreach { case (id, _, n, _) =>
            if (used < budget) {
              out += ((id, src, n, used))
              used += n
            }
          }
          state.update(used)
          out.result().iterator
      }
  }
}
