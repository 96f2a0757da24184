package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pending-transaction submit lifecycle — the received→pending→
  * cleared/failed status machine the reference runs as a poll loop
  * (ref: src/be_db_pending_txn.erl:133-206; statement SQL :28-110;
  * table migrations/1580305069-pending-transactions.sql).
  *
  * Reference semantics reproduced exactly:
  *  - a poll round picks up `received` rows (plus `pending` on the
  *    crash-recovery init round — LIST_INIT :36-39 vs LIST_RECEIVED
  *    :42-47), decodes, and submits;
  *  - decode failure dead-letters to failed/'decoding_failure'
  *    (:217-221) without touching the rest of the round;
  *  - a successful submit sets status='pending', failed_reason=''
  *    and the decoded JSON fields (SET_PENDING :67-74);
  *  - the async submit result then maps ok → cleared (failed_reason
  *    '', SET_CLEARED :81-88), {error, duplicate_key} → no update
  *    (:200-202), any other error → failed with the error string —
  *    but NEVER overwrites a cleared row (SET_FAILED's
  *    `status != 'cleared'` guard, :53-60);
  *  - every status write touches updated_at (the table's
  *    set_updated_at trigger, migrations/1580305069:43-46).
  *
  * Spark shape: each transition is a pure projection over the state
  * table; only [[applyResults]] joins, keyed on the pending id, with
  * the (bounded, in-flight-only) result batch broadcast — so a round
  * over a 100 TB-scale backlog is scan + broadcast-join, no wide
  * shuffle. The wire codec is the same deterministic stub q51 uses.
  */
object PendingTxnLifecycle {
  val Received = "received"
  val Pending  = "pending"
  val Cleared  = "cleared"
  val Failed   = "failed"

  /** Lifecycle columns over a raw (pending_id, created_at, data) feed:
    * everything starts `received`, untouched since creation. */
  def init(raw: DataFrame): DataFrame =
    raw.withColumn("status", lit(Received))
      .withColumn("failed_reason", lit(null).cast("string"))
      .withColumn("fields", lit(null).cast("string"))
      .withColumn("updated_at", col("created_at"))

  private val txt     = col("data").cast("string")
  private val decodes = txt.isNotNull && txt.startsWith("TXNPB;")

  /** Decoded-JSON stand-in for blockchain_txn:to_json (the fields
    * payload SET_PENDING stores). */
  private val fieldsJson: Column = to_json(struct(
    regexp_extract(txt, "type=([^;]+)", 1).as("type"),
    regexp_extract(txt, "payer=([^;]+)", 1).as("payer"),
    regexp_extract(txt, "nonce=([0-9]+)", 1).cast("long").as("nonce")))

  private def step(p: DataFrame, eligible: Column, newStatus: Column,
                   newReason: Column, newFields: Column,
                   roundTime: Column): DataFrame = {
    val keep = p.columns
      .filterNot(Set("status", "failed_reason", "fields", "updated_at"))
      .map(col)
    val changed = eligible && newStatus =!= col("status")
    p.select(keep ++ Seq(
      when(eligible, newStatus).otherwise(col("status")).as("status"),
      when(eligible, newReason).otherwise(col("failed_reason"))
        .as("failed_reason"),
      when(eligible, newFields).otherwise(col("fields")).as("fields"),
      when(changed, roundTime).otherwise(col("updated_at"))
        .as("updated_at")): _*)
  }

  /** One submit round: eligible rows decode and move to `pending`
    * (fields attached) or dead-letter to `failed`/decoding_failure.
    * @param includePending true replays the init round, which re-submits
    *        rows a crash left in-flight (LIST_INIT) */
  def submitRound(p: DataFrame, roundTime: Column,
                  includePending: Boolean = false): DataFrame = {
    val eligible =
      if (includePending) col("status").isin(Received, Pending)
      else col("status") === Received
    step(p, eligible,
      newStatus = when(decodes, lit(Pending)).otherwise(lit(Failed)),
      newReason = when(decodes, lit("")).otherwise(lit("decoding_failure")),
      newFields = when(decodes, fieldsJson).otherwise(col("fields")),
      roundTime = roundTime)
  }

  /** Apply async submit results: (pending_id, result) where result is
    * 'ok', 'duplicate_key', or an error string. ok → cleared;
    * duplicate_key → untouched; error → failed — never downgrading a
    * row already cleared (the SET_FAILED guard). */
  def applyResults(p: DataFrame, results: DataFrame,
                   roundTime: Column): DataFrame = {
    val r = broadcast(
      results.select(col("pending_id"), col("result")))
    val isOk  = col("result") === "ok"
    val isErr = col("result").isNotNull && !col("result").isin("ok", "duplicate_key")
    val joined = p.join(r, Seq("pending_id"), "left")
    // SET_CLEARED is unconditional; only SET_FAILED carries the
    // status != 'cleared' guard
    step(joined,
      eligible  = isOk || (isErr && col("status") =!= Cleared),
      newStatus = when(isOk, lit(Cleared)).otherwise(lit(Failed)),
      newReason = when(isOk, lit("")).otherwise(col("result")),
      newFields = col("fields"),
      roundTime = roundTime)
      .drop("result")
  }

  /** User resubmission of a failed txn: back to `received` so the next
    * poll round picks it up (the retry path — the poll loop itself
    * never re-submits a failed row). */
  def resubmit(p: DataFrame, ids: DataFrame, roundTime: Column): DataFrame = {
    val r = broadcast(ids.select(col("pending_id"), lit(true).as("_rs")))
    val joined = p.join(r, Seq("pending_id"), "left")
    step(joined,
      eligible  = col("_rs") && col("status") === Failed,
      newStatus = lit(Received),
      newReason = lit(null).cast("string"),
      newFields = col("fields"),
      roundTime = roundTime)
      .drop("_rs")
  }
}
