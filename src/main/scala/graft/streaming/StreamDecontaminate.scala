package graft.streaming

import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming decontamination: flag (or drop) arriving docs that share a
  * winnowing fingerprint with a fixed benchmark set — the arrival-time
  * twin of q93/q98.
  *
  * Design: the benchmark fingerprint table is a STATIC artifact (eval
  * sets are small and versioned), so each micro-batch runs the exact
  * BATCH probe — fingerprint explode, broadcast join against the bench
  * set, per-doc count — via `foreachBatch`. One implementation serves
  * batch and stream; there is no second flagging semantics to drift.
  * The probe is stateless (membership against a static set), so no
  * watermark or state store is involved and a doc's verdict never
  * depends on what else arrived — replays are idempotent.
  */
object StreamDecontaminate {

  /** Batch probe — [[graft.ops.Decontaminate.flag]], the single
    * implementation shared with q93 and CuratePipeline; kept as an
    * alias here so streaming callers need only this object.
    */
  def flag(docs: DataFrame, idCol: String, textCol: String,
           benchFps: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    graft.ops.Decontaminate.flag(docs, idCol, textCol, benchFps, k, w)

  /** Wire a doc stream through the flagging probe; `sink` receives each
    * micro-batch's flagged frame (write, drop, or quarantine as the
    * pipeline dictates).
    */
  def run(stream: DataFrame, idCol: String, textCol: String,
          benchFps: DataFrame, trigger: Trigger,
          sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(flag(batch, idCol, textCol, benchFps), batchId)
      }
}
