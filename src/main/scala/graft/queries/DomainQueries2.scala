package graft.queries

import graft.domain.Actors
import graft.fixtures.FixtureGen
import graft.functions.{CodecColumns, MergeAgg}
import org.apache.spark.sql.functions._

/** Second tranche of domain coverage over the block fixtures: burn
  * extraction, rewards rollup from JSON fields, search-word derivation,
  * state_channel_counts, the election detector, dirty-set builders, the
  * gateway payer backfill, SQL-expressible codecs, and jsonb_merge_agg.
  */
object DomainQueries2 {

  private val txnsPq =
    s"read_parquet('${FixtureGen.FixtureDir}/transactions.parquet/*.parquet')"
  private val gwPq =
    s"read_parquet('${FixtureGen.FixtureDir}/ledger_gateways.parquet/*.parquet')"
  private val locPq =
    s"read_parquet('${FixtureGen.FixtureDir}/locations.parquet/*.parquet')"

  private def txns(s: org.apache.spark.sql.SparkSession) =
    s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")

  private def parsed(s: org.apache.spark.sql.SparkSession) =
    txns(s).select(col("block"), col("hash"), col("type"),
      from_json(col("fields"), Actors.fieldsSchema).as("f"))

  /** Typed-fields CTE for the oracles below (subset of the full
    * transform — only what these queries read).
    */
  private val tCte =
    s"""t AS (
       |  SELECT block, hash, type, json_transform(fields,
       |    '{"payer":"VARCHAR","owner":"VARCHAR","payee":"VARCHAR",
       |      "staking_fee":"BIGINT","fee":"BIGINT","price":"BIGINT",
       |      "rewards":[{"account":"VARCHAR","gateway":"VARCHAR",
       |        "amount":"BIGINT","type":"VARCHAR"}],
       |      "state_channel":{"owner":"VARCHAR","summaries":[
       |        {"client":"VARCHAR","owner":"VARCHAR","num_packets":"BIGINT",
       |         "num_dcs":"BIGINT"}]}}') AS f
       |  FROM $txnsPq)""".stripMargin.replaceAll("\n\\s*\"", "\"")

  val defs: Seq[QDef] = Seq(

    // §2.3 burn extraction (ref: src/be_db_dc_burn.erl:43-125): staking
    // burns per type, per-gateway DC totals from state-channel
    // summaries, the implicit fee burn (skip fee 0/undefined payer), and
    // the as-of oracle-price tag (latest price_oracle_v1 at or before
    // the block; ref: src/be_db_oracle_price.erl:64-70).
    QDef("q35_dc_burns",
      (s, _) => {
        val p = parsed(s)
        val f = col("f")
        val payerOrOwner = coalesce(nullif(f("payer"), lit("")), f("owner"))
        val staking: org.apache.spark.sql.DataFrame = p.filter(col("type").isin("oui_v1", "add_gateway_v1",
            "assert_location_v1", "assert_location_v2", "routing_v1"))
          .select(col("block"), col("hash"),
            when(col("type") === "oui_v1", f("payer"))
              .when(col("type") === "routing_v1", f("owner"))
              .otherwise(payerOrOwner).as("actor"),
            when(col("type") === "oui_v1", lit("oui"))
              .when(col("type") === "routing_v1", lit("routing"))
              .when(col("type") === "add_gateway_v1", lit("add_gateway"))
              .otherwise(lit("assert_location")).as("burn_type"),
            coalesce(f("staking_fee"), lit(0L)).as("amount"))
        val scDc = p.filter(col("type") === "state_channel_close_v1")
          .select(col("block"), col("hash"),
            explode(f("state_channel")("summaries")).as("sm"))
          .groupBy(col("block"), col("hash"),
            col("sm.client").as("actor"))
          .agg(sum(col("sm.num_dcs")).as("amount"))
          .withColumn("burn_type", lit("state_channel"))
          .select("block", "hash", "actor", "burn_type", "amount")
        val fees = p
          .select(col("block"), col("hash"), payerOrOwner.as("actor"),
            lit("fee").as("burn_type"), f("fee").as("amount"))
          .filter(col("amount").isNotNull && col("amount") > 0 &&
            col("actor").isNotNull)
        val burns = staking.unionByName(scDc).unionByName(fees)
        // as-of oracle price: the price table is tiny — broadcast range
        // join + argmax (the reference's "current price" scalar lookup)
        val prices = p.filter(col("type") === "price_oracle_v1")
          .groupBy(col("block").as("pblock"))
          .agg(max_by(f("price"), col("hash")).as("pprice"))
        val withPrice = burns.join(broadcast(prices),
            burns("block") >= prices("pblock"), "left_outer")
          .groupBy(col("block"), col("hash"), col("actor"), col("burn_type"),
            col("amount"))
          .agg(max_by(col("pprice"), col("pblock")).as("price"))
        withPrice.select(col("block"), col("hash").as("transaction_hash"),
          col("actor"), col("burn_type"), col("amount"), col("price"))
      },
      Some(s"""WITH $tCte,
        |prices AS (
        |  SELECT block AS pblock, arg_max(f.price, hash) AS pprice
        |  FROM t WHERE type = 'price_oracle_v1' GROUP BY block),
        |burns AS (
        |  SELECT block, hash,
        |    CASE WHEN type = 'oui_v1' THEN f.payer
        |         WHEN type = 'routing_v1' THEN f.owner
        |         ELSE coalesce(nullif(f.payer, ''), f.owner) END AS actor,
        |    CASE WHEN type = 'oui_v1' THEN 'oui'
        |         WHEN type = 'routing_v1' THEN 'routing'
        |         WHEN type = 'add_gateway_v1' THEN 'add_gateway'
        |         ELSE 'assert_location' END AS burn_type,
        |    coalesce(f.staking_fee, 0) AS amount
        |  FROM t WHERE type IN ('oui_v1','add_gateway_v1',
        |    'assert_location_v1','assert_location_v2','routing_v1')
        |  UNION ALL
        |  SELECT block, hash, sm.client, 'state_channel',
        |    CAST(sum(sm.num_dcs) AS BIGINT)
        |  FROM (SELECT block, hash, unnest(f.state_channel.summaries) AS sm
        |        FROM t WHERE type = 'state_channel_close_v1')
        |  GROUP BY block, hash, sm.client
        |  UNION ALL
        |  SELECT block, hash, coalesce(nullif(f.payer, ''), f.owner), 'fee', f.fee
        |  FROM t WHERE f.fee IS NOT NULL AND f.fee > 0
        |    AND coalesce(nullif(f.payer, ''), f.owner) IS NOT NULL)
        |SELECT b.block, b.hash AS transaction_hash, b.actor, b.burn_type,
        |  b.amount,
        |  (SELECT arg_max(pprice, pblock) FROM prices p
        |   WHERE p.pblock <= b.block) AS price
        |FROM burns b""".stripMargin)),

    // §2.4 rewards rollup from JSON fields (the SQL backfill shape,
    // ref: migrations/1597773017:17-36): explode the rewards array,
    // sum per (block, txn, account, gateway).
    QDef("q36_rewards_rollup",
      (s, _) => {
        parsed(s).filter(col("type").isin("rewards_v1", "rewards_v2"))
          .select(col("block"), col("hash"), explode(col("f")("rewards")).as("r"))
          .groupBy(col("block"), col("hash").as("transaction_hash"),
            col("r.account").as("account"), col("r.gateway").as("gateway"))
          .agg(sum(col("r.amount")).as("amount"),
            count(lit(1)).as("n_entries"))
      },
      Some(s"""WITH $tCte
        |SELECT block, hash AS transaction_hash, r.account AS account,
        |  r.gateway AS gateway, CAST(sum(r.amount) AS BIGINT) AS amount,
        |  count(*) AS n_entries
        |FROM (SELECT block, hash, unnest(f.rewards) AS r FROM t
        |      WHERE type IN ('rewards_v1','rewards_v2'))
        |GROUP BY 1, 2, 3, 4""".stripMargin)),

    // §2.4 ordered de-duplicated search words + ordinality
    // (ref: migrations/1628163172:4-18 location_city_words): lowercase,
    // split, length>=3, dedup keeping FIRST occurrence order.
    QDef("q37_search_words",
      (s, _) => {
        val loc = s.read.parquet(s"${FixtureGen.FixtureDir}/locations.parquet")
        val blob = lower(concat_ws(" ",
          col("long_city"), col("short_city"), col("long_state"),
          col("short_state"), col("long_country"), col("short_country")))
        loc.select(col("location"),
          array_join(array_distinct(filter(split(blob, "\\s+"),
            w => length(w) >= 3)), " ").as("search_city"),
          // city_id (ref: migrations/1593782722:24-29)
          lower(concat(coalesce(col("long_city"), lit("")),
            coalesce(col("long_state"), lit("")),
            coalesce(col("long_country"), lit("")))).as("city_id"))
      },
      Some(s"""WITH l AS (
        |  SELECT location, string_split_regex(lower(
        |    coalesce(long_city,'') || ' ' || coalesce(short_city,'') || ' ' ||
        |    coalesce(long_state,'') || ' ' || coalesce(short_state,'') || ' ' ||
        |    coalesce(long_country,'') || ' ' || coalesce(short_country,'')),
        |    '\\s+') AS words
        |  FROM $locPq),
        |u AS (
        |  SELECT location, unnest(words) AS word,
        |    unnest(generate_series(1, len(words))) AS rn
        |  FROM l),
        |d AS (
        |  SELECT location, word, min(rn) AS rn FROM u
        |  WHERE length(word) >= 3 GROUP BY location, word),
        |sc AS (
        |  SELECT location,
        |    coalesce(string_agg(word, ' ' ORDER BY rn), '') AS search_city
        |  FROM d GROUP BY location)
        |SELECT sc.location, sc.search_city,
        |  lower(coalesce(l.long_city, '') || coalesce(l.long_state, '') ||
        |    coalesce(l.long_country, '')) AS city_id
        |FROM sc JOIN $locPq l ON sc.location = l.location""".stripMargin)),

    // §2.8 state_channel_counts (ref: migrations/1591282933:4-16):
    // packet/DC sums per txn; NULL for an scc with no summaries (the
    // `select into` no-rows case), 0 for every other type.
    QDef("q38_sc_counts",
      (s, _) => {
        val f = col("f")
        val sums = f("state_channel")("summaries")
        val isSc = col("type") === "state_channel_close_v1"
        parsed(s).select(col("block"), col("hash").as("transaction_hash"),
          when(isSc, when(size(sums) > 0,
              aggregate(sums, lit(0L), (a, x) => a + x("num_packets"))))
            .otherwise(lit(0L)).as("num_packets"),
          when(isSc, when(size(sums) > 0,
              aggregate(sums, lit(0L), (a, x) => a + x("num_dcs"))))
            .otherwise(lit(0L)).as("num_dcs"))
      },
      Some(s"""WITH $tCte
        |SELECT block, hash AS transaction_hash,
        |  CASE WHEN type = 'state_channel_close_v1' THEN
        |    CASE WHEN len(f.state_channel.summaries) > 0 THEN
        |      CAST(list_sum(list_transform(f.state_channel.summaries,
        |        x -> x.num_packets)) AS BIGINT) END
        |  ELSE 0 END AS num_packets,
        |  CASE WHEN type = 'state_channel_close_v1' THEN
        |    CASE WHEN len(f.state_channel.summaries) > 0 THEN
        |      CAST(list_sum(list_transform(f.state_channel.summaries,
        |        x -> x.num_dcs)) AS BIGINT) END
        |  ELSE 0 END AS num_dcs
        |FROM t""".stripMargin)),

    // §2.3 election detector (ref: src/be_db_gateway.erl:99-103):
    // exists() over the block's txn types, with the conditional column
    // the reference derives on election blocks.
    QDef("q39_election_blocks",
      (s, _) => {
        txns(s).groupBy(col("block"))
          .agg(count(lit(1)).as("n_txns"),
            max(when(col("type") === "consensus_group_v1", 1).otherwise(0))
              .cast("boolean").as("has_election"))
          .withColumn("election_epoch_marker",
            when(col("has_election"), col("block")).otherwise(lit(null)))
      },
      Some(s"""SELECT block, count(*) AS n_txns,
        |  bool_or(type = 'consensus_group_v1') AS has_election,
        |  CASE WHEN bool_or(type = 'consensus_group_v1') THEN block END
        |    AS election_epoch_marker
        |FROM $txnsPq GROUP BY block""".stripMargin)),

    // §2.3 dirty-set builders (ref: src/be_db_account.erl:95-163,
    // be_db_gateway.erl:78-124): the distinct per-block key sets the
    // handlers re-snapshot, by role family.
    QDef("q40_dirty_sets",
      (s, _) => {
        val actors = Actors.transactionActors(txns(s))
        val accountRoles = Seq("payer", "payee", "owner", "escrow")
        val gatewayRoles = Seq("gateway", "reward_gateway", "witness",
          "challenger", "challengee", "packet_receiver")
        val validatorRoles = Seq("validator", "consensus_member",
          "consensus_failure_member", "consensus_failure_failed_member")
        actors.select(col("block"), col("actor"),
            when(col("actor_role").isin(accountRoles.map(x => x: Any): _*),
              "account")
              .when(col("actor_role").isin(gatewayRoles.map(x => x: Any): _*),
                "gateway")
              .when(col("actor_role").isin(validatorRoles.map(x => x: Any): _*),
                "validator")
              .as("kind"))
          .filter(col("kind").isNotNull)
          .distinct()
      },
      Some(s"""WITH $parsedAndPairs,
        |roles AS (
        |  SELECT DISTINCT block, actor, role FROM pairs
        |  WHERE actor IS NOT NULL AND actor <> '')
        |SELECT DISTINCT block, actor,
        |  CASE WHEN role IN ('payer','payee','owner','escrow') THEN 'account'
        |       WHEN role IN ('gateway','reward_gateway','witness',
        |                     'challenger','challengee','packet_receiver')
        |         THEN 'gateway'
        |       WHEN role IN ('validator','consensus_member',
        |                     'consensus_failure_member',
        |                     'consensus_failure_failed_member')
        |         THEN 'validator' END AS kind
        |FROM roles WHERE kind IS NOT NULL""".stripMargin)),

    // §2.2 deferred-enrichment payer backfill
    // (ref: migrations/1627043667:7-29): for each gateway, the payer of
    // its earliest add_gateway txn.
    QDef("q41_payer_backfill",
      (s, _) => {
        val gw = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        val adds = parsed(s).filter(col("type") === "add_gateway_v1")
          .select(col("block"), col("hash"),
            col("f")("gateway").as("gateway"),
            coalesce(nullif(col("f")("payer"), lit("")), col("f")("owner"))
              .as("add_payer"))
        val firstAdd = adds.groupBy("gateway")
          .agg(min_by(struct(col("block"), col("hash"), col("add_payer")),
            struct(col("block"), col("hash"))).as("fst"))
          .select(col("gateway"), col("fst.add_payer").as("payer"),
            col("fst.block").as("payer_block"))
        gw.select(col("address"), col("owner"))
          .join(firstAdd, gw("address") === firstAdd("gateway"), "left_outer")
          .select(col("address"), col("owner"), col("payer"),
            col("payer_block"))
      },
      Some(s"""WITH $tCte,
        |adds AS (
        |  SELECT f.gateway AS gateway, block, hash,
        |    coalesce(nullif(f.payer, ''), f.owner) AS add_payer
        |  FROM (SELECT block, hash, type, json_transform(fields,
        |      '{"payer":"VARCHAR","owner":"VARCHAR","gateway":"VARCHAR"}') AS f
        |    FROM $txnsPq WHERE type = 'add_gateway_v1') x),
        |mn AS (
        |  SELECT gateway, min(block) AS payer_block FROM adds GROUP BY gateway),
        |fst AS (
        |  SELECT a.gateway, arg_min(a.add_payer, a.hash) AS payer,
        |    m.payer_block
        |  FROM adds a JOIN mn m
        |    ON a.gateway = m.gateway AND a.block = m.payer_block
        |  GROUP BY a.gateway, m.payer_block)
        |SELECT g.address, g.owner, fst.payer, fst.payer_block
        |FROM $gwPq g LEFT JOIN fst ON g.address = fst.gateway""".stripMargin)),

    // §2.8 SQL-expressible codecs as Column ops: base64url, H3 parent
    // (bit math), subnet unpack — applied over fixture gateways (the
    // pseudo-subnet is md5-derived so both engines compute the same
    // 48-bit value).
    QDef("q42_codec_cols",
      (s, _) => {
        val gw = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        val subnet = conv(substring(md5(col("address")), 1, 12), 16, 10)
          .cast("long")
        gw.select(col("address"),
          CodecColumns.base64Url(col("address")).as("address_b64"),
          CodecColumns.h3ParentLong(CodecColumns.h3FromHex(col("location")), 8)
            .as("location_res8"),
          CodecColumns.subnetBase(subnet).as("subnet_base"),
          CodecColumns.subnetMask(subnet).as("subnet_mask"))
      },
      Some(s"""WITH g AS (
        |  SELECT address, location,
        |    CAST('0x' || location AS BIGINT) AS h3,
        |    CAST('0x' || substr(md5(address), 1, 12) AS BIGINT) AS subnet
        |  FROM $gwPq)
        |SELECT address,
        |  rtrim(replace(replace(base64(encode(address)), '+', '-'), '/', '_'),
        |    '=') AS address_b64,
        |  ${CodecColumns.h3ParentSql("h3", 8)} AS location_res8,
        |  (subnet >> 23) & ${0x1FFFFFFL} AS subnet_base,
        |  subnet & ${0x7FFFFFL} AS subnet_mask
        |FROM g""".stripMargin)),

    // §2.4 jsonb_merge_agg (ref: migrations/1609356128:4-9): ordered
    // json-object concatenation per block over vars_v1 txns, via a
    // custom Aggregator (order carried explicitly, replayed at finish —
    // deterministic under any partitioning). Result exploded to rows so
    // the oracle (last value per key in hash order) is engine-portable.
    QDef("q43_jsonb_merge",
      (s, _) => {
        import s.implicits._
        val vars = parsed(s).filter(col("type") === "vars_v1")
          .select(col("block"), col("hash"), col("f")("vars").as("vars"))
          .as[(Long, String, Map[String, String])]
        val merged = vars.groupByKey(_._1)
          .agg(MergeAgg.jsonbMergeAgg.toColumn.name("merged"))
        merged.toDF("block", "merged")
          .select(col("block"), explode(col("merged")).as(Seq("name", "value")))
      },
      Some(s"""WITH v AS (
        |  SELECT block, hash, fields FROM $txnsPq WHERE type = 'vars_v1'),
        |u AS (
        |  SELECT block, hash, unnest(json_keys(fields, '$$.vars')) AS name
        |  FROM v),
        |kv AS (
        |  SELECT u.block, u.hash, u.name,
        |    json_extract_string(v.fields, '$$.vars.' || u.name) AS value
        |  FROM u JOIN v ON u.block = v.block AND u.hash = v.hash)
        |SELECT block, name, arg_max(value, hash) AS value
        |FROM kv GROUP BY block, name""".stripMargin))
  )

  /** q40's oracle reuses the q32 pairs CTE (kept in DomainQueries). */
  private def parsedAndPairs: String = DomainQueries.parsedAndPairsSql
}
