package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** account_inventory semantics — balances per account maintained per
  * block (ref: migrations/1591133143-account_inventory.sql:4-70: balance,
  * nonce, dc_balance, dc_nonce, security_balance, security_nonce,
  * first_block/last_block, upserted per accounts row).
  *
  * The reference's `accounts` rows are ledger snapshots its chain node
  * writes per dirty account (src/be_db_account.erl:181-227); outside a
  * node we reconstruct the same state as the fold of the balance deltas
  * the transactions themselves carry — payments, coinbases, rewards,
  * burns, stakes, HTLCs — which is the ETL-observable part of that
  * ledger. Column shape and upsert rules (latest nonce wins, balances
  * roll forward, first/last block bookkeeping) match the migration.
  *
  * Scale shape: `deltas` is a union of type-filtered projections — each
  * branch's `type` predicate pushes to the parquet scan — and `fold` is
  * ONE hash aggregation keyed by address (map-side partial sums, no
  * window sort). The incremental [[merge]] is a single full-outer join
  * on the key, additive for balances, newest-wins for nonces — safe
  * because the ingest driver feeds batches in strict block order.
  */
object AccountLedger {

  private val DeltaTypes = Seq(
    "coinbase_v1", "dc_coinbase_v1", "security_coinbase_v1",
    "payment_v1", "payment_v2", "security_exchange_v1", "token_burn_v1",
    "rewards_v1", "rewards_v2", "subnetwork_rewards_v1",
    "subnetwork_fund_v1", "stake_validator_v1", "create_htlc_v1",
    "redeem_htlc_v1")

  private val zero = lit(0L)
  private val noL = lit(null).cast("long")

  /** One delta row per balance-moving (txn, account) pair:
    * (address, block, ver, bal, dc, sec, nonce, sec_nonce) where `ver`
    * is the (block, hash) ordering key and the nonce columns are null
    * unless this txn sets them for this address.
    *
    * Plan shape: ONE scan of the transactions table (a union of
    * type-filtered branches would scan it 17 times), a per-type
    * `when`-chain building the delta array — the Actors.actorArray
    * pattern — then a single explode. The `In(type, …)` filter still
    * reaches the scan.
    */
  def deltas(txns: DataFrame): DataFrame = {
    val parsed = txns
      .filter(col("type").isin(DeltaTypes.map(x => x: Any): _*))
      .select(col("block"), col("type"),
        Ver.key(col("block"), col("hash")).as("ver"),
        from_json(col("fields"), Actors.fieldsSchema).as("f"))
    val f = col("f")
    val typ = col("type")

    def d(addr: Column, bal: Column = zero, dc: Column = zero,
          sec: Column = zero, nonce: Column = noL,
          secNonce: Column = noL): Column =
      struct(addr.cast("string").as("address"),
        bal.cast("long").as("bal"), dc.cast("long").as("dc"),
        sec.cast("long").as("sec"), nonce.cast("long").as("nonce"),
        secNonce.cast("long").as("sec_nonce"))

    val arr =
      when(typ === "coinbase_v1", array(d(f("payee"), bal = f("amount"))))
      .when(typ === "dc_coinbase_v1", array(d(f("payee"), dc = f("amount"))))
      .when(typ === "security_coinbase_v1",
        array(d(f("payee"), sec = f("amount"))))
      .when(typ === "payment_v1", array(
        d(f("payer"), bal = -f("amount"), nonce = f("nonce")),
        d(f("payee"), bal = f("amount"))))
      .when(typ === "payment_v2", concat(
        transform(f("payments"),
          p => d(f("payer"), bal = -p("amount"), nonce = f("nonce"))),
        transform(f("payments"), p => d(p("payee"), bal = p("amount")))))
      // token burn debits HNT from the payer and credits the payee's DC
      // balance (1:1 stand-in for the oracle-price conversion)
      .when(typ === "token_burn_v1", array(
        d(f("payer"), bal = -f("amount"), nonce = f("nonce")),
        d(f("payee"), dc = f("amount"))))
      .when(typ === "security_exchange_v1", array(
        d(f("payer"), sec = -f("amount"), secNonce = f("nonce")),
        d(f("payee"), sec = f("amount"))))
      .when(typ.isin("rewards_v1", "rewards_v2"),
        transform(f("rewards"), r => d(r("account"), bal = r("amount"))))
      .when(typ === "subnetwork_rewards_v1",
        transform(f("rewards"),
          r => d(r("reward_account"), bal = r("amount"))))
      .when(typ === "subnetwork_fund_v1",
        array(d(f("payer"), bal = -f("amount"))))
      .when(typ === "stake_validator_v1",
        array(d(f("owner"), bal = -f("stake"))))
      .when(typ === "create_htlc_v1", array(d(f("payer"), bal = -f("amount"))))
      .when(typ === "redeem_htlc_v1", array(d(f("payee"), bal = f("amount"))))

    parsed.select(col("block"), col("ver"), explode(arr).as("x"))
      .select(col("x.address").as("address"), col("block"), col("ver"),
        col("x.bal").as("bal"), col("x.dc").as("dc"), col("x.sec").as("sec"),
        col("x.nonce").as("nonce"), col("x.sec_nonce").as("sec_nonce"))
      .filter(col("address").isNotNull && col("address") =!= "")
  }

  /** Collapse delta rows to one row per address. Nonces stay nullable
    * ("never set"); [[finish]] presents the NOT-NULL inventory shape.
    */
  def fold(d: DataFrame): DataFrame =
    d.groupBy("address").agg(
      sum(col("bal")).as("balance"),
      max_by(col("nonce"), when(col("nonce").isNotNull, col("ver")))
        .as("nonce"),
      sum(col("dc")).as("dc_balance"),
      sum(col("sec")).as("security_balance"),
      max_by(col("sec_nonce"), when(col("sec_nonce").isNotNull, col("ver")))
        .as("security_nonce"),
      min(col("block")).as("first_block"),
      max(col("block")).as("last_block"))

  /** The migration's NOT-NULL presentation: unset nonces are 0;
    * dc_nonce has no setter in this txn corpus and is identically 0.
    */
  def finish(inv: DataFrame): DataFrame =
    inv.select(col("address"), col("balance"),
      coalesce(col("nonce"), zero).as("nonce"),
      col("dc_balance"), zero.as("dc_nonce"),
      col("security_balance"),
      coalesce(col("security_nonce"), zero).as("security_nonce"),
      col("first_block"), col("last_block"))

  /** Incremental upsert: merge a batch fold into finished state.
    * Balances are additive; nonce takes the batch value when present
    * (batches arrive in strict block order, so batch values are always
    * newer — the trigger's `nonce = EXCLUDED.nonce` rule,
    * ref: migrations/1591133143:55-62).
    */
  def merge(state: DataFrame, batch: DataFrame): DataFrame = {
    val j = state.as("s").join(finishLess(batch).as("b"),
      Seq("address"), "full_outer")
    j.select(col("address"),
      (coalesce(col("s.balance"), zero) + coalesce(col("b.balance"), zero))
        .as("balance"),
      coalesce(col("b.nonce"), col("s.nonce"), zero).as("nonce"),
      (coalesce(col("s.dc_balance"), zero) +
        coalesce(col("b.dc_balance"), zero)).as("dc_balance"),
      zero.as("dc_nonce"),
      (coalesce(col("s.security_balance"), zero) +
        coalesce(col("b.security_balance"), zero)).as("security_balance"),
      coalesce(col("b.security_nonce"), col("s.security_nonce"), zero)
        .as("security_nonce"),
      least(col("s.first_block"), col("b.first_block")).as("first_block"),
      greatest(col("s.last_block"), col("b.last_block")).as("last_block"))
  }

  private def finishLess(batch: DataFrame): DataFrame =
    batch.select(col("address"), col("balance"), col("nonce"),
      col("dc_balance"), col("security_balance"), col("security_nonce"),
      col("first_block"), col("last_block"))

  /** One-shot inventory over a full transactions table — what the
    * incremental driver fold must equal (and what the DuckDB oracle
    * recomputes).
    */
  def inventory(txns: DataFrame): DataFrame = finish(fold(deltas(txns)))
}
