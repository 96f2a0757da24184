package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming bounded top-k per group — the arrival-order twin of
  * [[graft.ops.TopK]]: per-group state is the current top-k (score,
  * id) pairs (ascending sort key, the TopK convention: the caller
  * owns making the key total), and a row is EMITTED exactly when it
  * enters the running top-k at arrival (an admission log, the
  * StreamMix greedy-admission shape — a stream cannot re-rank the
  * future, so "currently in the top-k" is the only answer available
  * at arrival time).
  *
  * The guarantee the spec pins: any row of the FINAL top-k was
  * admitted at its arrival (if it beat the k-th of the whole corpus,
  * it beat the k-th of the prefix seen before it), so the true
  * per-group top-k is exactly the batch top-k OF the admission log —
  * a k-bounded re-rank instead of a corpus re-scan. State is O(k)
  * longs per group; admissions per group are bounded by the number of
  * running-top-k improvements (worst case O(n), expected O(k·log n)
  * on random arrival orders).
  */
object StreamTopK {

  /** rows: (groupCol, scoreCol, idCol) — all castable to long; emits
    * (group, score, id) for each arriving row admitted into its
    * group's running top-k (ascending (score, id) order — lowest k
    * win, negate scores for a descending contest).
    */
  def admissions(rows: DataFrame, groupCol: String, scoreCol: String,
                 idCol: String, k: Int): Dataset[(Long, Long, Long)] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select(col(groupCol).cast("long"), col(scoreCol).cast("long"),
        col(idCol).cast("long"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[List[(Long, Long)], (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (g, it, state) =>
          var cur = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[(Long, Long, Long)]
          // within a batch, arrival order = the iterator's order; each
          // row is judged against the state AT ITS OWN arrival
          it.foreach { case (_, score, id) =>
            val cand = (score, id)
            // re-arrivals of a pair already in the top-k are silent —
            // they never "enter" anything (replayed sources would
            // otherwise duplicate Append-mode admissions)
            if (!cur.contains(cand) &&
              (cur.size < k || implicitly[Ordering[(Long, Long)]]
                .lt(cand, cur.last))) {
              cur = (cand :: cur).sorted.take(k)
              if (cur.contains(cand)) out += ((g, score, id))
            }
          }
          state.update(cur)
          out.result().iterator
      }
  }
}
