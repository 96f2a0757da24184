package graft.queries

import graft.domain.{AccountLedger, Actors, OuiLedger}
import graft.fixtures.FixtureGen
import graft.functions.{CodecColumns, Geo}
import org.apache.spark.sql.functions._

/** Fourth tranche: the last two first-class derived tables —
  * account_inventory (balance fold) and oui_inventory (routing state
  * with array columns) — as one-shot oracle-checked queries; their
  * incremental twins live in the ingest driver
  * (streaming/BlockIngest.scala) and BlockIngestSpec asserts the
  * 3-batch fold equals these single-shot results.
  */
object DomainQueries4 {

  private val txnsPq =
    s"read_parquet('${FixtureGen.FixtureDir}/transactions.parquet/*.parquet')"

  /** Shared DuckDB fragment: txns with the (block, hash) ordering key. */
  private val txSql =
    s"""tx AS (
       |  SELECT block, hash, type, fields, ${graft.domain.Ver.sql} AS ver
       |  FROM $txnsPq)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // §2.2 account_inventory (ref: migrations/1591133143:4-70):
    // balances/nonces rolled forward per account from the txn deltas,
    // first/last block bookkeeping — the most-queried inventory table.
    QDef("q63_account_inventory",
      (s, _) => AccountLedger.inventory(
        s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")),
      Some(s"""WITH $txSql,
        |pv2 AS (
        |  SELECT block, ver, json_extract_string(fields,'$$.payer') AS payer,
        |    CAST(json_extract_string(fields,'$$.nonce') AS BIGINT) AS pnonce,
        |    unnest(json_transform(fields,
        |      '{"payments":[{"payee":"VARCHAR","amount":"BIGINT"}]}').payments)
        |      AS p
        |  FROM tx WHERE type = 'payment_v2'),
        |rw AS (
        |  SELECT block, ver, unnest(json_transform(fields,
        |    '{"rewards":[{"account":"VARCHAR","amount":"BIGINT","reward_account":"VARCHAR"}]}').rewards)
        |    AS r
        |  FROM tx WHERE type IN ('rewards_v1','rewards_v2')),
        |srw AS (
        |  SELECT block, ver, unnest(json_transform(fields,
        |    '{"rewards":[{"account":"VARCHAR","amount":"BIGINT","reward_account":"VARCHAR"}]}').rewards)
        |    AS r
        |  FROM tx WHERE type = 'subnetwork_rewards_v1'),
        |d AS (
        |  SELECT json_extract_string(fields,'$$.payee') AS address, block, ver,
        |    CAST(json_extract_string(fields,'$$.amount') AS BIGINT) AS bal,
        |    0::BIGINT AS dc, 0::BIGINT AS sec,
        |    NULL::BIGINT AS nonce, NULL::BIGINT AS sec_nonce
        |  FROM tx WHERE type = 'coinbase_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payee'), block, ver,
        |    0, CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'dc_coinbase_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payee'), block, ver,
        |    0, 0, CAST(json_extract_string(fields,'$$.amount') AS BIGINT),
        |    NULL, NULL
        |  FROM tx WHERE type = 'security_coinbase_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payer'), block, ver,
        |    -CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0, 0,
        |    CAST(json_extract_string(fields,'$$.nonce') AS BIGINT), NULL
        |  FROM tx WHERE type = 'payment_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payee'), block, ver,
        |    CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0, 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'payment_v1'
        |  UNION ALL SELECT payer, block, ver, -p.amount, 0, 0, pnonce, NULL
        |  FROM pv2
        |  UNION ALL SELECT p.payee, block, ver, p.amount, 0, 0, NULL, NULL
        |  FROM pv2
        |  UNION ALL SELECT json_extract_string(fields,'$$.payer'), block, ver,
        |    -CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0, 0,
        |    CAST(json_extract_string(fields,'$$.nonce') AS BIGINT), NULL
        |  FROM tx WHERE type = 'token_burn_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payee'), block, ver,
        |    0, CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'token_burn_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payer'), block, ver,
        |    0, 0, -CAST(json_extract_string(fields,'$$.amount') AS BIGINT),
        |    NULL, CAST(json_extract_string(fields,'$$.nonce') AS BIGINT)
        |  FROM tx WHERE type = 'security_exchange_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payee'), block, ver,
        |    0, 0, CAST(json_extract_string(fields,'$$.amount') AS BIGINT),
        |    NULL, NULL
        |  FROM tx WHERE type = 'security_exchange_v1'
        |  UNION ALL SELECT r.account, block, ver, r.amount, 0, 0, NULL, NULL
        |  FROM rw
        |  UNION ALL SELECT r.reward_account, block, ver, r.amount, 0, 0,
        |    NULL, NULL
        |  FROM srw
        |  UNION ALL SELECT json_extract_string(fields,'$$.payer'), block, ver,
        |    -CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0, 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'subnetwork_fund_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.owner'), block, ver,
        |    -CAST(json_extract_string(fields,'$$.stake') AS BIGINT), 0, 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'stake_validator_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payer'), block, ver,
        |    -CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0, 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'create_htlc_v1'
        |  UNION ALL SELECT json_extract_string(fields,'$$.payee'), block, ver,
        |    CAST(json_extract_string(fields,'$$.amount') AS BIGINT), 0, 0,
        |    NULL, NULL
        |  FROM tx WHERE type = 'redeem_htlc_v1'),
        |dd AS (SELECT * FROM d WHERE address IS NOT NULL AND address <> ''),
        |agg AS (
        |  SELECT address, CAST(sum(bal) AS BIGINT) AS balance,
        |    CAST(sum(dc) AS BIGINT) AS dc_balance,
        |    CAST(sum(sec) AS BIGINT) AS security_balance,
        |    min(block) AS first_block, max(block) AS last_block
        |  FROM dd GROUP BY address),
        |nn AS (SELECT address, arg_max(nonce, ver) AS nonce FROM dd
        |       WHERE nonce IS NOT NULL GROUP BY address),
        |sn AS (SELECT address, arg_max(sec_nonce, ver) AS security_nonce
        |       FROM dd WHERE sec_nonce IS NOT NULL GROUP BY address)
        |SELECT a.address, a.balance, coalesce(nn.nonce, 0) AS nonce,
        |  a.dc_balance, 0::BIGINT AS dc_nonce, a.security_balance,
        |  coalesce(sn.security_nonce, 0) AS security_nonce,
        |  a.first_block, a.last_block
        |FROM agg a LEFT JOIN nn ON a.address = nn.address
        |LEFT JOIN sn ON a.address = sn.address""".stripMargin)),

    // §2.2 oui_inventory (ref: migrations/1612480010:16-57,
    // src/be_db_oui.erl:66-121): routing state per OUI. The array
    // columns (addresses TEXT[], subnets INT[][]) are presented as JSON
    // strings HERE because the driver's hash gate cannot sort/hash
    // list-typed cells; the ingest-driver twin persists them as genuine
    // parquet LIST columns (BlockIngestSpec asserts the round-trip).
    QDef("q64_oui_inventory",
      (s, _) => {
        val inv = OuiLedger.inventory(
          s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet"))
        inv.select(col("oui"), col("owner"), col("nonce"),
          to_json(col("addresses")).as("addresses_json"),
          to_json(col("subnets")).as("subnets_json"),
          col("first_block"), col("last_block"))
      },
      Some(s"""WITH $txSql,
        |r AS (
        |  SELECT
        |    CASE WHEN type = 'oui_v1' THEN
        |      CASE WHEN CAST(json_extract_string(fields,'$$.oui') AS BIGINT) <= 1
        |        THEN 1
        |        ELSE CAST(json_extract_string(fields,'$$.oui') AS BIGINT) + 1 END
        |    ELSE CAST(json_extract_string(fields,'$$.oui') AS BIGINT) END AS oui,
        |    block, ver,
        |    json_extract_string(fields,'$$.owner') AS owner,
        |    CASE WHEN type = 'oui_v1' THEN 0
        |      ELSE CAST(json_extract_string(fields,'$$.nonce') AS BIGINT) END
        |      AS nonce,
        |    CASE WHEN type = 'oui_v1'
        |      THEN json_transform(fields, '{"addresses":["VARCHAR"]}').addresses
        |      WHEN json_extract_string(fields,'$$.action.action') = 'update_routers'
        |      THEN json_transform(fields,
        |        '{"action":{"addresses":["VARCHAR"]}}').action.addresses
        |      END AS addresses,
        |    CASE WHEN type = 'oui_v1'
        |      THEN [CAST(block AS INT), 8]
        |      WHEN json_extract_string(fields,'$$.action.action') = 'request_subnet'
        |      THEN [CAST(block AS INT),
        |            CAST(json_extract_string(fields,'$$.action.subnet_size') AS INT)]
        |      END AS subnet
        |  FROM tx WHERE type IN ('oui_v1','routing_v1')),
        |base AS (
        |  SELECT oui, arg_max(owner, ver) AS owner, arg_max(nonce, ver) AS nonce,
        |    min(block) AS first_block, max(block) AS last_block
        |  FROM r GROUP BY oui),
        |addr AS (SELECT oui, arg_max(addresses, ver) AS addresses FROM r
        |         WHERE addresses IS NOT NULL GROUP BY oui),
        |sub AS (SELECT oui, list_sort(list(subnet)) AS subnets FROM r
        |        WHERE subnet IS NOT NULL GROUP BY oui)
        |SELECT b.oui, b.owner, b.nonce,
        |  to_json(coalesce(a.addresses, CAST([] AS VARCHAR[])))
        |    AS addresses_json,
        |  to_json(coalesce(s.subnets, CAST([] AS INT[][]))) AS subnets_json,
        |  b.first_block, b.last_block
        |FROM base b LEFT JOIN addr a ON b.oui = a.oui
        |LEFT JOIN sub s ON b.oui = s.oui""".stripMargin)),

    // §2.8 geo scalars (ref: src/be_db_geocoder.erl:49-51,204-225):
    // cells resolved to (lat, lon) through the geocode store (the
    // to_geo surface), then nearest-gateway-within-radius by haversine.
    // Plan shape: broadcast point-lookup + a self pair join + one
    // min_by aggregation. At 100 TB the pair join buckets by an
    // H3-parent grid cell so each task only scores its neighborhood;
    // at fixture scale the direct pair join is the right plan.
    QDef("q65_geo_nearest",
      (s, _) => {
        val gw = s.read
          .parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        val loc = s.read
          .parquet(s"${FixtureGen.FixtureDir}/locations.parquet")
        val pts = Geo.toGeo(loc, gw.select(col("address"), col("location")),
            "location")
          .filter(col("lat").isNotNull)
          .select(col("address"), col("lat"), col("lon"))
        val d = Geo.haversineKm(col("a.lat"), col("a.lon"),
          col("b.lat"), col("b.lon"))
        pts.as("a").join(pts.as("b"), col("a.address") =!= col("b.address"))
          .select(col("a.address").as("address"),
            col("b.address").as("neighbor"), d.as("d"))
          .filter(col("d") <= 500.0)
          .groupBy("address")
          .agg(min_by(col("neighbor"), struct(col("d"), col("neighbor")))
            .as("nearest"),
            round(min(col("d")), 6).as("distance_km"))
      },
      Some {
        val hav = Geo.haversineSql("a.lat", "a.lon", "b.lat", "b.lon")
        s"""WITH pts AS (
        |  SELECT g.address, l.lat, l.lon
        |  FROM read_parquet('${FixtureGen.FixtureDir}/ledger_gateways.parquet/*.parquet') g
        |  JOIN read_parquet('${FixtureGen.FixtureDir}/locations.parquet/*.parquet') l
        |    ON g.location = l.location),
        |pairs AS (
        |  SELECT a.address AS address, b.address AS neighbor, $hav AS d
        |  FROM pts a JOIN pts b ON a.address <> b.address
        |  WHERE $hav <= 500),
        |mins AS (SELECT address, min(d) AS dmin FROM pairs GROUP BY address),
        |pick AS (
        |  SELECT p.address, min(p.neighbor) AS nearest
        |  FROM pairs p JOIN mins m ON p.address = m.address AND p.d = m.dmin
        |  GROUP BY p.address)
        |SELECT p.address, p.nearest, round(m.dmin, 6) AS distance_km
        |FROM pick p JOIN mins m ON p.address = m.address""".stripMargin
      }),

    // §1.2/§2.8 location_hex — the hex-search backfill (ref:
    // src/be_db_backfill.erl:244-294; migration 1616328011): every
    // gateway's H3 cell coarsened to its res-8 parent, the column the
    // reference's hotspot hex search indexes. Pure 64-bit bit math on
    // both engines (set the resolution field, fill digits 9..res with
    // the H3 "unused" digit 7) — no geo libraries involved.
    QDef("q67_location_hex",
      (s, _) => {
        val gw = s.read
          .parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        gw.select(col("address"), col("location"),
          lower(hex(CodecColumns.h3ParentLong(
            CodecColumns.h3FromHex(col("location")), 8))).as("location_hex"))
      },
      Some(s"""WITH g AS (
        |  SELECT address, location,
        |    CAST('0x' || location AS BIGINT) AS h
        |  FROM read_parquet('${FixtureGen.FixtureDir}/ledger_gateways.parquet/*.parquet'))
        |SELECT address, location,
        |  printf('%x', ${CodecColumns.h3ParentSql("h", 8)})
        |    AS location_hex
        |FROM g""".stripMargin)),

    // §2.3 receipts-path repair — the reversed-path backfill (ref:
    // src/be_db_backfill.erl:62-137): the stored txn json's challengee
    // sequence is compared against the authoritative chain block; rows
    // whose stored path is exactly the REVERSE of the valid one are
    // rewritten. The historical corruption is simulated
    // deterministically (stored = reversed for block % 3 == 0) so both
    // engines derive the same differential; the operator shape — a
    // per-hash compare-reverse-rewrite join — is the reference's.
    QDef("q68_receipts_path_repair",
      (s, _) => {
        val p = s.read
          .parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
          .filter(col("type") === "poc_receipts_v1")
          .select(col("block"), col("hash"),
            from_json(col("fields"), Actors.fieldsSchema).as("f"))
        val valid = transform(col("f")("path"), e => e("challengee"))
        val withPaths = p.select(col("block"), col("hash"), valid.as("valid"))
          .withColumn("stored",
            when(col("block") % 3 === 0, reverse(col("valid")))
              .otherwise(col("valid")))
        withPaths.select(col("block"), col("hash"),
            (col("stored") === reverse(col("valid")) &&
              !(col("stored") === col("valid"))).as("was_reversed"),
            to_json(col("stored")).as("stored_path"),
            to_json(col("valid")).as("repaired_path"))
      },
      Some(s"""WITH t AS (
        |  SELECT block, hash,
        |    list_transform(json_transform(fields,
        |      '{"path":[{"challengee":"VARCHAR"}]}').path,
        |      e -> e.challengee) AS valid
        |  FROM $txnsPq WHERE type = 'poc_receipts_v1'),
        |w AS (
        |  SELECT block, hash, valid,
        |    CASE WHEN block % 3 = 0 THEN list_reverse(valid)
        |         ELSE valid END AS stored
        |  FROM t)
        |SELECT block, hash,
        |  (stored = list_reverse(valid) AND NOT stored = valid)
        |    AS was_reversed,
        |  to_json(stored) AS stored_path,
        |  to_json(valid) AS repaired_path
        |FROM w""".stripMargin)),

    // §3.2 pending-txn submit lifecycle
    // (ref: src/be_db_pending_txn.erl:133-206): one poll round over the
    // received backlog — decode failures dead-letter, the rest go
    // pending with decoded fields — then the async submit results land:
    // ok → cleared, duplicate_key → untouched, error → failed with the
    // reason. Results are derived deterministically from pending_id so
    // the whole replay is oracle-expressible; updated_at proves the
    // touch-on-transition semantics (t1 = submit, t2 = result).
    QDef("q76_pending_lifecycle",
      (s, _) => {
        import graft.ops.PendingTxnLifecycle._
        val raw = s.read.parquet(s"${FixtureGen.FixtureDir}/pending_txns.parquet")
        val (t1, t2) = (lit(1600010000L), lit(1600020000L))
        val p1 = submitRound(init(raw), t1)
        val results = p1.filter(col("status") === Pending)
          .select(col("pending_id"),
            when(col("pending_id") % 5 === 1, lit("txn_queue_full"))
              .when(col("pending_id") % 5 === 2, lit("duplicate_key"))
              .otherwise(lit("ok")).as("result"))
        applyResults(p1, results, t2)
          .select(col("pending_id"), col("status"), col("failed_reason"),
            get_json_object(col("fields"), "$.type").as("txn_type"),
            get_json_object(col("fields"), "$.nonce").cast("long").as("nonce"),
            col("updated_at"))
      },
      Some(s"""WITH p0 AS (
        |  SELECT pending_id, TRY_CAST(data AS VARCHAR) AS raw
        |  FROM read_parquet('${FixtureGen.FixtureDir}/pending_txns.parquet/*.parquet')),
        |d AS (
        |  SELECT pending_id,
        |    CASE WHEN raw IS NOT NULL AND position('TXNPB;' IN raw) = 1
        |      THEN raw END AS txt
        |  FROM p0)
        |SELECT pending_id,
        |  CASE WHEN txt IS NULL THEN 'failed'
        |       WHEN pending_id % 5 = 1 THEN 'failed'
        |       WHEN pending_id % 5 = 2 THEN 'pending'
        |       ELSE 'cleared' END AS status,
        |  CASE WHEN txt IS NULL THEN 'decoding_failure'
        |       WHEN pending_id % 5 = 1 THEN 'txn_queue_full'
        |       ELSE '' END AS failed_reason,
        |  regexp_extract(txt, 'type=([^;]+)', 1) AS txn_type,
        |  CAST(regexp_extract(txt, 'nonce=([0-9]+)', 1) AS BIGINT) AS nonce,
        |  CAST(CASE WHEN txt IS NULL THEN 1600010000
        |       WHEN pending_id % 5 = 2 THEN 1600010000
        |       ELSE 1600020000 END AS BIGINT) AS updated_at
        |FROM d""".stripMargin))
  )
}
