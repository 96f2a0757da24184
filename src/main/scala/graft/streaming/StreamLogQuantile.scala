package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of q264's log-bucket quantile sketch: per-type
  * bucket counts carry across micro-batches, so the emitted p50/p95/
  * p99 after draining a stream equal the batch sketch over the same
  * rows — the property StreamLogQuantileSpec pins.
  *
  * This is exactly why the sketch (and not the exact histogram) is
  * the streaming path: state per event type is at most 16 sub-buckets
  * × 64 exponents of longs, REGARDLESS of how many values arrive, and
  * merging a batch into the state is plain addition — no order
  * sensitivity, no re-sort of history, restart-safe through the state
  * store. The exact histogram's state would grow with distinct values
  * forever.
  *
  * The bucket arithmetic below mirrors q264's SQL bit-for-bit:
  * e = floor(log2(vm)) via the integer bit length (length(bin(vm))-1
  * in SQL ≡ 63 - numberOfLeadingZeros here), sub-bucket = top 4 bits
  * after the leading bit, representative = exact value below 2^4 and
  * bucket midpoint above; quantile pick is the same
  * ceil(p·n/100) cumulative rule.
  */
object StreamLogQuantile {

  /** Bucket key of a micro-value (vm ≤ 0 → the (-1, 0) underflow
    * bucket) — lockstep with q264's bucketESql/bucketSbSql. */
  def bucket(vm: Long): (Int, Int) =
    if (vm >= 1) {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(vm)
      val sb = ((vm >> math.max(e - 4, 0)) & 15L).toInt
      (e, sb)
    } else (-1, 0)

  /** Bucket representative — lockstep with q264's bucketRepSql. */
  def rep(e: Int, sb: Int): Long =
    if (e < 0) 0L
    else if (e < 4) sb.toLong
    else ((16L + sb) << (e - 4)) + ((1L << (e - 4)) - 1) / 2

  /** The ceil(p·n/100) cumulative pick over sorted buckets. */
  def estimate(buckets: Seq[(Int, Int, Long)], n: Long, p: Int): Long = {
    val target = (p * n + 99) / 100
    var cum = 0L
    var out = 0L
    var found = false
    for ((e, sb, c) <- buckets.sortBy(b => (b._1, b._2)) if !found) {
      cum += c
      if (cum >= target) { out = rep(e, sb); found = true }
    }
    out
  }

  /** Continuously-updated quantile estimates. Input needs
    * (event_type, value); emits the owning type's current
    * (event_type, n, p50_est_micro, p95_est_micro, p99_est_micro)
    * after every batch that touches it.
    */
  def quantiles(events: DataFrame)
      : Dataset[(String, Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"),
        floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Long)],
         state: GroupState[Seq[(Int, Int, Long)]]) =>
          val m = collection.mutable.Map.empty[(Int, Int), Long]
          state.getOption.getOrElse(Seq.empty)
            .foreach { case (e, sb, c) => m((e, sb)) = c }
          rows.foreach { case (_, vm) =>
            val b = bucket(vm)
            m(b) = m.getOrElse(b, 0L) + 1L
          }
          val seq = m.iterator.map { case ((e, sb), c) => (e, sb, c) }
            .toSeq
          state.update(seq)
          val n = seq.iterator.map(_._3).sum
          Iterator.single((key, n, estimate(seq, n, 50),
            estimate(seq, n, 95), estimate(seq, n, 99)))
      }
  }
}
