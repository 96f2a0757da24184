package graft.domain

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-actor activity projection — the reference's most-queried stored
  * function, `txn_filter_actor_activity(actor, type, fields)`
  * (ref: migrations/1628075186:4-27, the 5th evolution of the function).
  *
  * Postgres semantics preserved exactly:
  *  - rewards_v1/v2 → keep only reward entries where account = actor OR
  *    gateway = actor; `jsonb_agg` over zero rows is NULL (not []).
  *  - state_channel_close_v1 → keep summaries where owner = actor OR
  *    client = actor, COALESCED to [] (the 1628075186 fix).
  *  - payment_v2 → full fields when actor is the payer, else payments
  *    filtered to payee = actor (NULL when none).
  *  - consensus_group_v1 → strip the (large) proof.
  *  - everything else → passthrough.
  *
  * Implemented as pure higher-order array ops over the parsed fields
  * struct — a `Column => Column` "SQL macro", no UDF, so Catalyst can
  * prune and push around it.
  */
object Activity {

  /** Filtered reward entries (NULL when none match — jsonb_agg semantics). */
  def keptRewards(actor: Column, f: Column): Column = {
    val kept = filter(f("rewards"),
      r => r("account") === actor || r("gateway") === actor)
    when(size(kept) > 0, kept)
  }

  /** Filtered summaries, coalesced to [] (1628075186's coalesce). */
  def keptSummaries(actor: Column, f: Column): Column =
    coalesce(
      filter(f("state_channel")("summaries"),
        s => s("owner") === actor || s("client") === actor),
      array().cast(
        "array<struct<client:string,owner:string,num_packets:bigint," +
          "num_dcs:bigint,location:string>>"))

  /** payment_v2: full payments for the payer, else filtered (NULL when
    * none match).
    */
  def keptPayments(actor: Column, f: Column): Column = {
    val kept = filter(f("payments"), p => p("payee") === actor)
    when(f("payer") === actor, f("payments"))
      .otherwise(when(size(kept) > 0, kept))
  }
}
