package graft.queries

import graft.domain.{Actors, Activity}
import graft.fixtures.FixtureGen
import org.apache.spark.sql.functions._

/** Domain (blockchain-ETL) query surface over the committed block
  * fixtures at /root/repo/fixtures — actor extraction, activity
  * filtering, and the derived-table operators. These queries are
  * scale-factor independent: the fixture corpus is the input, the DuckDB
  * oracle reads the same parquet by absolute path.
  */
object DomainQueries {

  private val txnsPq =
    s"read_parquet('${FixtureGen.FixtureDir}/transactions.parquet/*.parquet')"

  /** DuckDB typed view of the txn fields JSON — mirror of
    * [[Actors.fieldsSchema]].
    */
  private val fieldsTransform =
    """{"payee":"VARCHAR","payer":"VARCHAR","owner":"VARCHAR",
      |"gateway":"VARCHAR","address":"VARCHAR","challenger":"VARCHAR",
      |"closer":"VARCHAR","seller":"VARCHAR","buyer":"VARCHAR",
      |"new_owner":"VARCHAR","old_owner":"VARCHAR","validator":"VARCHAR",
      |"old_validator":"VARCHAR","new_validator":"VARCHAR",
      |"public_key":"VARCHAR","subnetwork_key":"VARCHAR",
      |"payments":[{"payee":"VARCHAR","amount":"BIGINT"}],
      |"addresses":["VARCHAR"],"members":["VARCHAR"],
      |"failed_members":["VARCHAR"],
      |"rewards":[{"account":"VARCHAR","gateway":"VARCHAR","amount":"BIGINT",
      |"type":"VARCHAR","reward_account":"VARCHAR"}],
      |"path":[{"challengee":"VARCHAR","witnesses":[{"gateway":"VARCHAR"}]}],
      |"state_channel":{"owner":"VARCHAR","summaries":[{"client":"VARCHAR",
      |"owner":"VARCHAR","num_packets":"BIGINT","num_dcs":"BIGINT",
      |"location":"VARCHAR"}]},
      |"action":{"action":"VARCHAR","addresses":["VARCHAR"]},
      |"reward_server_keys":["VARCHAR"],
      |"staking_fee":"BIGINT","fee":"BIGINT","amount":"BIGINT",
      |"price":"BIGINT"}""".stripMargin.replace("\n", "")

  private val parsedCte =
    s"""t AS (
       |  SELECT block, hash, type,
       |    json_transform(fields, '$fieldsTransform') AS f
       |  FROM $txnsPq)""".stripMargin

  private val pairsCte =
    s"""pairs AS (
        |  SELECT block, hash, 'payee' AS role, f.payee AS actor FROM t
        |    WHERE type IN ('coinbase_v1','security_coinbase_v1','dc_coinbase_v1')
        |  UNION ALL SELECT block, hash, 'owner', f.owner FROM t WHERE type = 'oui_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.payer FROM t WHERE type = 'oui_v1'
        |  UNION ALL SELECT block, hash, 'router', unnest(f.addresses) FROM t WHERE type = 'oui_v1'
        |  UNION ALL SELECT block, hash, 'gateway', f.gateway FROM t WHERE type = 'gen_gateway_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.owner FROM t WHERE type = 'gen_gateway_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.owner FROM t WHERE type = 'routing_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.owner FROM t WHERE type = 'routing_v1'
        |  UNION ALL SELECT block, hash, 'router', unnest(f.action.addresses) FROM t
        |    WHERE type = 'routing_v1' AND f.action.action = 'update_routers'
        |  UNION ALL SELECT block, hash, 'payer', f.payer FROM t
        |    WHERE type IN ('payment_v1','security_exchange_v1','token_burn_v1')
        |  UNION ALL SELECT block, hash, 'payee', f.payee FROM t
        |    WHERE type IN ('payment_v1','security_exchange_v1','token_burn_v1')
        |  UNION ALL SELECT block, hash, 'consensus_member', unnest(f.members) FROM t
        |    WHERE type = 'consensus_group_v1'
        |  UNION ALL SELECT block, hash, 'gateway', f.gateway FROM t
        |    WHERE type IN ('add_gateway_v1','assert_location_v1','assert_location_v2')
        |  UNION ALL SELECT block, hash, 'owner', f.owner FROM t
        |    WHERE type IN ('add_gateway_v1','assert_location_v1','assert_location_v2')
        |  UNION ALL SELECT block, hash, 'payer', coalesce(nullif(f.payer, ''), f.owner) FROM t
        |    WHERE type IN ('add_gateway_v1','assert_location_v1','assert_location_v2')
        |  UNION ALL SELECT block, hash, 'payer', f.payer FROM t WHERE type = 'create_htlc_v1'
        |  UNION ALL SELECT block, hash, 'payee', f.payee FROM t
        |    WHERE type IN ('create_htlc_v1','redeem_htlc_v1')
        |  UNION ALL SELECT block, hash, 'escrow', f.address FROM t
        |    WHERE type IN ('create_htlc_v1','redeem_htlc_v1')
        |  UNION ALL SELECT block, hash, 'challenger', f.challenger FROM t
        |    WHERE type IN ('poc_request_v1','poc_receipts_v1','poc_receipts_v2')
        |  UNION ALL SELECT block, hash, 'validator', f.challenger FROM t WHERE type = 'poc_receipts_v2'
        |  UNION ALL SELECT block, hash, 'challengee', unnest(list_transform(f.path, e -> e.challengee))
        |    FROM t WHERE type IN ('poc_receipts_v1','poc_receipts_v2')
        |  UNION ALL SELECT block, hash, 'witness',
        |    unnest(flatten(list_transform(f.path, e -> list_transform(e.witnesses, w -> w.gateway))))
        |    FROM t WHERE type IN ('poc_receipts_v1','poc_receipts_v2')
        |  UNION ALL SELECT block, hash, 'payee', unnest(list_transform(f.rewards, r -> r.account))
        |    FROM t WHERE type IN ('rewards_v1','rewards_v2')
        |  UNION ALL SELECT block, hash, 'reward_gateway',
        |    unnest(list_transform(list_filter(f.rewards, r -> r.gateway IS NOT NULL), r -> r.gateway))
        |    FROM t WHERE type IN ('rewards_v1','rewards_v2')
        |  UNION ALL SELECT block, hash, 'payer', f.payer FROM t WHERE type = 'payment_v2'
        |  UNION ALL SELECT block, hash, 'payee', unnest(list_transform(f.payments, p -> p.payee))
        |    FROM t WHERE type = 'payment_v2'
        |  UNION ALL SELECT block, hash, 'sc_opener', f.owner FROM t WHERE type = 'state_channel_open_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.owner FROM t WHERE type = 'state_channel_open_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.owner FROM t WHERE type = 'state_channel_open_v1'
        |  UNION ALL SELECT block, hash, 'sc_closer', f.closer FROM t WHERE type = 'state_channel_close_v1'
        |  UNION ALL SELECT block, hash, 'payee', f.closer FROM t WHERE type = 'state_channel_close_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.state_channel.owner FROM t WHERE type = 'state_channel_close_v1'
        |  UNION ALL SELECT block, hash, 'packet_receiver',
        |    unnest(list_transform(f.state_channel.summaries, s -> s.client))
        |    FROM t WHERE type = 'state_channel_close_v1'
        |  UNION ALL SELECT block, hash, 'oracle', f.public_key FROM t WHERE type = 'price_oracle_v1'
        |  UNION ALL SELECT block, hash, 'gateway', f.gateway FROM t
        |    WHERE type IN ('transfer_hotspot_v1','transfer_hotspot_v2')
        |  UNION ALL SELECT block, hash, 'payee', f.seller FROM t WHERE type = 'transfer_hotspot_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.buyer FROM t WHERE type = 'transfer_hotspot_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.buyer FROM t WHERE type = 'transfer_hotspot_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.new_owner FROM t WHERE type = 'transfer_hotspot_v2'
        |  UNION ALL SELECT block, hash, 'payer', f.owner FROM t WHERE type = 'transfer_hotspot_v2'
        |  UNION ALL SELECT block, hash, 'validator', f.address FROM t
        |    WHERE type IN ('gen_validator_v1','unstake_validator_v1','validator_heartbeat_v1')
        |  UNION ALL SELECT block, hash, 'validator', f.validator FROM t WHERE type = 'stake_validator_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.owner FROM t
        |    WHERE type IN ('gen_validator_v1','stake_validator_v1')
        |  UNION ALL SELECT block, hash, 'owner', f.owner FROM t
        |    WHERE type IN ('gen_validator_v1','stake_validator_v1','unstake_validator_v1')
        |  UNION ALL SELECT block, hash, 'payee', f.owner FROM t WHERE type = 'unstake_validator_v1'
        |  UNION ALL SELECT block, hash, 'validator', f.old_validator FROM t WHERE type = 'transfer_validator_stake_v1'
        |  UNION ALL SELECT block, hash, 'validator', f.new_validator FROM t WHERE type = 'transfer_validator_stake_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.new_owner FROM t WHERE type = 'transfer_validator_stake_v1'
        |  UNION ALL SELECT block, hash, 'payee', f.old_owner FROM t WHERE type = 'transfer_validator_stake_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.old_owner FROM t WHERE type = 'transfer_validator_stake_v1'
        |  UNION ALL SELECT block, hash, 'owner', f.new_owner FROM t
        |    WHERE type = 'transfer_validator_stake_v1' AND f.new_owner <> f.old_owner AND f.new_owner <> ''
        |  UNION ALL SELECT block, hash, 'consensus_failure_member', unnest(f.members) FROM t
        |    WHERE type = 'consensus_group_failure_v1'
        |  UNION ALL SELECT block, hash, 'consensus_failure_failed_member', unnest(f.failed_members) FROM t
        |    WHERE type = 'consensus_group_failure_v1'
        |  UNION ALL SELECT block, hash, 'subnetwork_key', f.subnetwork_key FROM t WHERE type = 'add_subnetwork_v1'
        |  UNION ALL SELECT block, hash, 'reward_server', unnest(f.reward_server_keys) FROM t
        |    WHERE type = 'add_subnetwork_v1'
        |  UNION ALL SELECT block, hash, 'payee', unnest(list_transform(f.rewards, r -> r.reward_account))
        |    FROM t WHERE type = 'subnetwork_rewards_v1'
        |  UNION ALL SELECT block, hash, 'payer', f.payer FROM t WHERE type = 'subnetwork_fund_v1'
        |)""".stripMargin

  /** Shared "typed txns + actor pairs" CTE prefix for oracles in other
    * query modules.
    */
  private[queries] def parsedAndPairsSql: String = s"$parsedCte,\n$pairsCte"

  val defs: Seq[QDef] = Seq(

    // §2.3 actor extraction — the 29-clause to_actors UDTF
    // (ref: src/be_db_txn_actor.erl:107-453) over all 34+ txn types.
    QDef("q32_actor_extract",
      (s, _) => Actors.transactionActors(
        s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")),
      Some(s"""WITH $parsedCte,
        |$pairsCte
        |SELECT DISTINCT block, actor, role AS actor_role, hash AS transaction_hash
        |FROM pairs WHERE actor IS NOT NULL AND actor <> ''""".stripMargin)),

    // §2.8 txn_filter_actor_activity — the per-actor activity projection
    // (ref: migrations/1628075186:4-27). Verified through scalar
    // projections of the filtered result (counts/sums per case), which
    // sidesteps cross-engine JSON serialization differences while
    // exercising every branch: rewards filter (NULL when empty),
    // summaries coalesce-to-[], payment_v2 payer passthrough vs payee
    // filter, consensus proof strip.
    QDef("q33_actor_activity",
      (s, _) => {
        val txns = s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
        val parsed = txns
          .filter(col("type").isin("rewards_v1", "rewards_v2",
            "state_channel_close_v1", "payment_v2", "consensus_group_v1"))
          .select(col("block"), col("hash"), col("type"),
            from_json(col("fields"), Actors.fieldsSchema).as("f"))
        val actors = Actors.transactionActors(txns)
          .select(col("transaction_hash").as("hash"), col("actor")).distinct()
        val joined = actors.join(parsed, "hash")
        val f = col("f"); val actor = col("actor")
        val kr = Activity.keptRewards(actor, f)
        val ks = Activity.keptSummaries(actor, f)
        val kp = Activity.keptPayments(actor, f)
        val isRw = col("type").isin("rewards_v1", "rewards_v2")
        val isSc = col("type") === "state_channel_close_v1"
        val isP2 = col("type") === "payment_v2"
        joined.select(
          col("block"), col("hash").as("transaction_hash"), col("type"), actor,
          when(isRw, size(kr)).as("n_rewards_kept"),
          when(isRw, aggregate(kr, lit(0L), (a, r) => a + r("amount")))
            .as("rewards_amount_kept"),
          when(isSc, size(ks)).as("n_summaries_kept"),
          when(isSc, aggregate(ks, lit(0L), (a, x) => a + x("num_packets")))
            .as("packets_kept"),
          when(isSc, aggregate(ks, lit(0L), (a, x) => a + x("num_dcs")))
            .as("dcs_kept"),
          when(isP2, f("payer") === actor).as("payer_full"),
          when(isP2, size(kp)).as("n_payments_kept"),
          when(isP2, aggregate(kp, lit(0L), (a, p) => a + p("amount")))
            .as("payments_amount_kept"),
          (col("type") === "consensus_group_v1").as("proof_stripped"))
      },
      Some(s"""WITH $parsedCte,
        |$pairsCte,
        |actors AS (
        |  SELECT DISTINCT hash, actor FROM pairs
        |  WHERE actor IS NOT NULL AND actor <> ''),
        |sel AS (
        |  SELECT t.block, t.hash, t.type, a.actor, t.f FROM t
        |  JOIN actors a ON a.hash = t.hash
        |  WHERE t.type IN ('rewards_v1','rewards_v2','state_channel_close_v1',
        |                   'payment_v2','consensus_group_v1')),
        |c1 AS (
        |  SELECT *,
        |    list_filter(f.rewards, r -> r.account = actor OR r.gateway = actor) AS kr0,
        |    coalesce(list_filter(f.state_channel.summaries,
        |      s -> s.owner = actor OR s.client = actor), []) AS ks,
        |    CASE WHEN f.payer = actor THEN f.payments
        |         ELSE list_filter(f.payments, p -> p.payee = actor) END AS kp0,
        |    (f.payer = actor) AS pf
        |  FROM sel),
        |c2 AS (
        |  SELECT *, CASE WHEN len(kr0) > 0 THEN kr0 END AS kr,
        |    CASE WHEN pf OR len(kp0) > 0 THEN kp0 END AS kp
        |  FROM c1)
        |SELECT block, hash AS transaction_hash, type, actor,
        |  CASE WHEN type IN ('rewards_v1','rewards_v2') THEN len(kr) END AS n_rewards_kept,
        |  CASE WHEN type IN ('rewards_v1','rewards_v2') AND kr IS NOT NULL
        |    THEN CAST(coalesce(list_sum(list_transform(kr, r -> r.amount)), 0) AS BIGINT)
        |    END AS rewards_amount_kept,
        |  CASE WHEN type = 'state_channel_close_v1' THEN len(ks) END AS n_summaries_kept,
        |  CASE WHEN type = 'state_channel_close_v1'
        |    THEN CAST(coalesce(list_sum(list_transform(ks, s -> s.num_packets)), 0) AS BIGINT)
        |    END AS packets_kept,
        |  CASE WHEN type = 'state_channel_close_v1'
        |    THEN CAST(coalesce(list_sum(list_transform(ks, s -> s.num_dcs)), 0) AS BIGINT)
        |    END AS dcs_kept,
        |  CASE WHEN type = 'payment_v2' THEN pf END AS payer_full,
        |  CASE WHEN type = 'payment_v2' THEN len(kp) END AS n_payments_kept,
        |  CASE WHEN type = 'payment_v2' AND kp IS NOT NULL
        |    THEN CAST(coalesce(list_sum(list_transform(kp, p -> p.amount)), 0) AS BIGINT)
        |    END AS payments_amount_kept,
        |  (type = 'consensus_group_v1') AS proof_stripped
        |FROM c2""".stripMargin)),

    // §2.2 trigger-maintained inventory upsert, exercised incrementally:
    // three ver-ordered batches folded through Inventory.mergeBatch must
    // equal the single-shot latest-per-key AND the DuckDB oracle. The
    // nullable `k` column (json props.$.k) exercises the reference's
    // `reward_scale = coalesce(EXCLUDED, old)` rule
    // (ref: migrations/1610634227:27, 1590689602:32-62): its final value
    // is the k of the latest row where k was NON-null.
    QDef("q34_inventory_merge",
      (s, dir) => {
        val e = graft.Tables.events(s, dir)
          .withColumn("value",
            col("value").cast("decimal(18,2)").cast("double"))
          .withColumn("k",
            get_json_object(col("props"), "$.k").cast("long"))
        val maxId = e.agg(max("event_id")).head().getLong(0)
        val key = Seq("user_id")
        val cols = Seq("event_type", "value", "k")
        val co = Set("k")
        val b1 = e.filter(col("event_id") <= maxId / 3)
        val b2 = e.filter(col("event_id") > maxId / 3 &&
          col("event_id") <= 2 * maxId / 3)
        val b3 = e.filter(col("event_id") > 2 * maxId / 3)
        val st1 = graft.ops.Inventory.latestPerKey(b1, key, "event_id", cols, co)
        val st2 = graft.ops.Inventory.mergeBatch(st1, b2, key, "event_id", cols, co)
        graft.ops.Inventory.mergeBatch(st2, b3, key, "event_id", cols, co)
      },
      Some("""WITH e AS (
        |  SELECT *, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT user_id,
        |  arg_max(event_type, event_id) AS last_event_type,
        |  CAST(arg_max(CAST(value AS DECIMAL(18,2)), event_id) AS DOUBLE) AS last_value,
        |  last(k ORDER BY event_id) FILTER (WHERE k IS NOT NULL) AS last_k,
        |  min(event_id) AS first_event_id, max(event_id) AS last_event_id,
        |  count(*) AS n_rows
        |FROM e GROUP BY user_id""".stripMargin))
  )
}
