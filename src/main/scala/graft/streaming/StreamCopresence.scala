package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming co-activity pairs: events of two DIFFERENT users within
  * ±window of each other — the stream-stream twin of the q145
  * interval-overlap family, built on a real watermarked stream-stream
  * join (the §2.9 machinery none of the other twins exercise).
  *
  * The join keeps the RangeJoin discipline instead of a pure
  * time-theta condition: the left side explodes each event to the
  * 2-3 width-W buckets its ±W reach touches, the right side posts at
  * its OWN bucket only — every qualifying event pair meets in exactly
  * one bucket (the right event's), so there is no post-join dedup,
  * and the equi key keeps per-bucket state lookups hash-partitioned
  * rather than cross-comparing all live state. Self-pairing double
  * counting is removed by the total (ts, event_id) order: the RIGHT
  * event is always the later one.
  *
  * Both sides carry the same watermark and the join condition bounds
  * ts_b to [ts_a − W, ts_a + W] ON THE EVENT-TIME COLUMNS — the form
  * Spark's UnsupportedOperationChecker and state-eviction logic
  * recognize, so expired buckets age out of the join state instead of
  * accumulating forever.
  *
  * Emits one APPEND row per qualifying event pair (the
  * StreamTransitions instance-stream contract); pair-level rollups
  * run on the drained log, where they equal the batch theta join
  * (StreamCopresenceSpec pins both).
  */
object StreamCopresence {

  def pairs(events: DataFrame, windowSec: Int = 300,
            watermark: String = "10 minutes"): DataFrame = {
    val w = windowSec * 1000000L
    val base = events.select(col("user_id").cast("long").as("u"),
      col("event_id").cast("long").as("eid"), col("ts"))
    val a = base.withWatermark("ts", watermark)
      .select(col("u").as("u_a"), col("eid").as("eid_a"),
        col("ts").as("ts_a"),
        explode(expr(s"sequence((unix_micros(ts) - ${w}L) div ${w}L, " +
          s"(unix_micros(ts) + ${w}L) div ${w}L)")).as("bk_a"))
    val b = base.withWatermark("ts", watermark)
      .select(col("u").as("u_b"), col("eid").as("eid_b"),
        col("ts").as("ts_b"),
        expr(s"unix_micros(ts) div ${w}L").as("bk_b"))
    a.join(b,
        col("bk_a") === col("bk_b") &&
          col("u_a") =!= col("u_b") &&
          col("ts_b") >= col("ts_a") - expr(s"INTERVAL $windowSec SECOND") &&
          col("ts_b") <= col("ts_a") + expr(s"INTERVAL $windowSec SECOND") &&
          (col("ts_b") > col("ts_a") ||
            (col("ts_b") === col("ts_a") && col("eid_b") > col("eid_a"))))
      .select(least(col("u_a"), col("u_b")).as("ua"),
        greatest(col("u_a"), col("u_b")).as("ub"),
        col("eid_a"), col("eid_b"))
  }
}
