package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Actor extraction — the reference's central UDTF
  * (`to_actors`, ref: src/be_db_txn_actor.erl:107-453: 29 pattern-match
  * clauses, one per transaction type family).
  *
  * Spark-first: one `from_json` into a wide nullable struct (the union
  * of the fields any clause reads), a per-type `when` chain building an
  * `array<struct<role, actor>>`, then `explode` + `distinct` — the
  * whole extraction is Catalyst expressions (no UDF), so column pruning
  * reaches the JSON parse and the dedup is one hash aggregate.
  *
  * Fidelity notes:
  *  - rewards_v2 actors come from resolved reward entries carried in the
  *    fixture fields (rewards_v1 shape) — the reference recomputes them
  *    from the consensus ledger (be_db_txn_actor.erl:273-326), which is
  *    unreproducible outside a chain node; the SQL backfill
  *    (migrations/1597773017:17-36) makes the same assumption.
  *  - empty-string actors are dropped globally (the reference would
  *    insert b58(<<>>) = "" for e.g. a transfer_validator_stake with an
  *    empty new_owner; we treat empty as absent).
  */
object Actors {

  /** Union of fields read by any extraction clause. */
  val fieldsSchema: StructType = StructType(Seq(
    StructField("payee", StringType), StructField("payer", StringType),
    StructField("owner", StringType), StructField("gateway", StringType),
    StructField("address", StringType), StructField("challenger", StringType),
    StructField("closer", StringType), StructField("seller", StringType),
    StructField("buyer", StringType), StructField("new_owner", StringType),
    StructField("old_owner", StringType), StructField("validator", StringType),
    StructField("old_validator", StringType),
    StructField("new_validator", StringType),
    StructField("public_key", StringType),
    StructField("subnetwork_key", StringType),
    StructField("payments", ArrayType(StructType(Seq(
      StructField("payee", StringType), StructField("amount", LongType))))),
    StructField("addresses", ArrayType(StringType)),
    StructField("members", ArrayType(StringType)),
    StructField("failed_members", ArrayType(StringType)),
    StructField("rewards", ArrayType(StructType(Seq(
      StructField("account", StringType), StructField("gateway", StringType),
      StructField("amount", LongType), StructField("type", StringType),
      StructField("reward_account", StringType))))),
    StructField("path", ArrayType(StructType(Seq(
      StructField("challengee", StringType),
      StructField("witnesses", ArrayType(StructType(Seq(
        StructField("gateway", StringType))))))))),
    StructField("state_channel", StructType(Seq(
      StructField("owner", StringType),
      StructField("summaries", ArrayType(StructType(Seq(
        StructField("client", StringType), StructField("owner", StringType),
        StructField("num_packets", LongType),
        StructField("num_dcs", LongType),
        StructField("location", StringType)))))))),
    StructField("action", StructType(Seq(
      StructField("action", StringType),
      StructField("addresses", ArrayType(StringType)),
      StructField("subnet_size", LongType)))),
    StructField("reward_server_keys", ArrayType(StringType)),
    StructField("staking_fee", LongType), StructField("fee", LongType),
    StructField("amount", LongType), StructField("nonce", LongType),
    StructField("price", LongType),
    StructField("oui", LongType), StructField("stake", LongType),
    StructField("location", StringType), StructField("gain", LongType),
    StructField("elevation", LongType),
    StructField("vars", MapType(StringType, StringType))))

  private val pairType = "array<struct<role:string,actor:string>>"

  private def pair(role: String, actor: Column): Column =
    struct(lit(role).as("role"), actor.as("actor"))

  private def pairs(ps: Column*): Column = array(ps: _*)

  private def rolesOf(arr: Column, role: String, get: Column => Column): Column =
    transform(arr, x => pair(role, get(x)))

  private val emptyPairs: Column = array().cast(pairType)

  /** The actor array for one parsed txn struct `f` of type `typ`. */
  def actorArray(typ: Column, f: Column): Column = {
    val owner = f("owner")
    val payer = f("payer")
    val payee = f("payee")
    // undefined/<<>> payer falls back to owner
    // (ref: be_db_txn_actor.erl:148-186)
    val payerOrOwner = coalesce(nullif(payer, lit("")), owner)
    when(typ.isin("coinbase_v1", "security_coinbase_v1", "dc_coinbase_v1"),
      pairs(pair("payee", payee)))
    .when(typ === "oui_v1",
      concat(pairs(pair("owner", owner), pair("payer", payer)),
        rolesOf(f("addresses"), "router", identity)))
    .when(typ === "gen_gateway_v1",
      pairs(pair("gateway", f("gateway")), pair("owner", owner)))
    .when(typ === "routing_v1",
      concat(pairs(pair("owner", owner), pair("payer", owner)),
        when(f("action")("action") === "update_routers",
          rolesOf(f("action")("addresses"), "router", identity))
          .otherwise(emptyPairs)))
    .when(typ.isin("payment_v1", "security_exchange_v1", "token_burn_v1"),
      pairs(pair("payer", payer), pair("payee", payee)))
    .when(typ === "consensus_group_v1",
      rolesOf(f("members"), "consensus_member", identity))
    .when(typ.isin("add_gateway_v1", "assert_location_v1", "assert_location_v2"),
      pairs(pair("gateway", f("gateway")), pair("owner", owner),
        pair("payer", payerOrOwner)))
    .when(typ === "create_htlc_v1",
      pairs(pair("payer", payer), pair("payee", payee),
        pair("escrow", f("address"))))
    .when(typ === "redeem_htlc_v1",
      pairs(pair("payee", payee), pair("escrow", f("address"))))
    .when(typ === "poc_request_v1", pairs(pair("challenger", f("challenger"))))
    .when(typ === "poc_receipts_v1",
      concat(rolesOf(f("path"), "challengee", _("challengee")),
        flatten(transform(f("path"),
          e => rolesOf(e("witnesses"), "witness", _("gateway")))),
        pairs(pair("challenger", f("challenger")))))
    .when(typ === "poc_receipts_v2",
      concat(rolesOf(f("path"), "challengee", _("challengee")),
        flatten(transform(f("path"),
          e => rolesOf(e("witnesses"), "witness", _("gateway")))),
        pairs(pair("challenger", f("challenger")),
          pair("validator", f("challenger")))))
    .when(typ.isin("vars_v1", "token_burn_exchange_rate_v1",
        "gen_price_oracle_v1"), emptyPairs)
    .when(typ.isin("rewards_v1", "rewards_v2"),
      concat(rolesOf(f("rewards"), "payee", _("account")),
        transform(filter(f("rewards"), r => r("gateway").isNotNull),
          r => pair("reward_gateway", r("gateway")))))
    .when(typ === "payment_v2",
      concat(pairs(pair("payer", payer)),
        rolesOf(f("payments"), "payee", _("payee"))))
    .when(typ === "state_channel_open_v1",
      pairs(pair("sc_opener", owner), pair("payer", owner),
        pair("owner", owner)))
    .when(typ === "state_channel_close_v1",
      concat(pairs(pair("sc_closer", f("closer")), pair("payee", f("closer")),
          pair("owner", f("state_channel")("owner"))),
        rolesOf(f("state_channel")("summaries"), "packet_receiver",
          _("client"))))
    .when(typ === "price_oracle_v1", pairs(pair("oracle", f("public_key"))))
    .when(typ === "transfer_hotspot_v1",
      pairs(pair("gateway", f("gateway")), pair("payee", f("seller")),
        pair("payer", f("buyer")), pair("owner", f("buyer"))))
    .when(typ === "transfer_hotspot_v2",
      pairs(pair("gateway", f("gateway")), pair("owner", f("new_owner")),
        pair("payer", owner)))
    .when(typ === "gen_validator_v1",
      pairs(pair("validator", f("address")), pair("payer", owner),
        pair("owner", owner)))
    .when(typ === "stake_validator_v1",
      pairs(pair("validator", f("validator")), pair("payer", owner),
        pair("owner", owner)))
    .when(typ === "unstake_validator_v1",
      pairs(pair("validator", f("address")), pair("payee", owner),
        pair("owner", owner)))
    .when(typ === "transfer_validator_stake_v1",
      concat(
        pairs(pair("validator", f("old_validator")),
          pair("validator", f("new_validator")),
          pair("payer", f("new_owner")), pair("payee", f("old_owner")),
          pair("owner", f("old_owner"))),
        when(f("new_owner") =!= f("old_owner") && f("new_owner") =!= "",
          pairs(pair("owner", f("new_owner")))).otherwise(emptyPairs)))
    .when(typ === "validator_heartbeat_v1",
      pairs(pair("validator", f("address"))))
    .when(typ === "consensus_group_failure_v1",
      concat(rolesOf(f("members"), "consensus_failure_member", identity),
        rolesOf(f("failed_members"), "consensus_failure_failed_member",
          identity)))
    .when(typ === "add_subnetwork_v1",
      concat(pairs(pair("subnetwork_key", f("subnetwork_key"))),
        rolesOf(f("reward_server_keys"), "reward_server", identity)))
    .when(typ === "subnetwork_rewards_v1",
      rolesOf(f("rewards"), "payee", _("reward_account")))
    .when(typ === "subnetwork_fund_v1", pairs(pair("payer", payer)))
    .otherwise(emptyPairs)
  }

  /** transactions(block, hash, type, fields JSON) →
    * transaction_actors(block, actor, actor_role, transaction_hash),
    * deduplicated — the reference's insert-ignore on the actor PK
    * (ref: be_db_txn_actor.erl:28-49).
    */
  def transactionActors(txns: DataFrame): DataFrame = {
    val parsed = txns.select(col("block"), col("hash"),
      col("type"), from_json(col("fields"), fieldsSchema).as("f"))
    parsed
      .select(col("block"), col("hash"),
        explode(actorArray(col("type"), col("f"))).as("ra"))
      .select(col("block"), col("ra.actor").as("actor"),
        col("ra.role").as("actor_role"), col("hash").as("transaction_hash"))
      .filter(col("actor").isNotNull && col("actor") =!= "")
      .distinct()
  }
}
