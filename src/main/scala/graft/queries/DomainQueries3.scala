package graft.queries

import graft.domain.Actors
import graft.fixtures.FixtureGen
import graft.functions.Codecs
import org.apache.spark.sql.functions._

/** Third tranche: ledger-join txn enrichment, witness-map JSON, trigram
  * name search, the stats-inventory shape, pending-txn decode with
  * dead-lettering, and geocode candidates.
  */
object DomainQueries3 {

  private val txnsPq =
    s"read_parquet('${FixtureGen.FixtureDir}/transactions.parquet/*.parquet')"
  private val gwPq =
    s"read_parquet('${FixtureGen.FixtureDir}/ledger_gateways.parquet/*.parquet')"
  private val valPq =
    s"read_parquet('${FixtureGen.FixtureDir}/ledger_validators.parquet/*.parquet')"
  private val locPq =
    s"read_parquet('${FixtureGen.FixtureDir}/locations.parquet/*.parquet')"
  private val pendPq =
    s"read_parquet('${FixtureGen.FixtureDir}/pending_txns.parquet/*.parquet')"

  private def parsed(s: org.apache.spark.sql.SparkSession) =
    s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
      .select(col("block"), col("hash"), col("type"),
        from_json(col("fields"), Actors.fieldsSchema).as("f"))

  val defs: Seq[QDef] = Seq(

    // §2.3 txn JSON enrichment (ref: src/be_txn.erl:14-126): poc path
    // actors enriched with ledger-derived owner + location via a
    // broadcast ledger point-lookup join (§2.1).
    QDef("q47_txn_enrich",
      (s, _) => {
        val gw = broadcast(s.read
          .parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
          .select(col("address"), col("owner").as("gw_owner"),
            col("location").as("gw_location")))
        val p = parsed(s).filter(col("type").isin("poc_receipts_v1",
          "poc_receipts_v2"))
        val challengees = p.select(col("block"), col("hash"),
            lit("challengee").as("role"),
            explode(col("f")("path")).as("e"))
          .select(col("block"), col("hash"), col("role"),
            col("e.challengee").as("gateway"))
        val witnesses = p.select(col("block"), col("hash"),
            lit("witness").as("role"), explode(col("f")("path")).as("e"))
          .select(col("block"), col("hash"), col("role"),
            explode(col("e.witnesses")).as("w"))
          .select(col("block"), col("hash"), col("role"),
            col("w.gateway").as("gateway"))
        challengees.unionByName(witnesses).distinct()
          .join(gw, col("gateway") === gw("address"), "left_outer")
          .select(col("block"), col("hash").as("transaction_hash"),
            col("role"), col("gateway"), col("gw_owner"), col("gw_location"))
      },
      Some(s"""WITH t AS (
        |  SELECT block, hash, type, json_transform(fields,
        |    '{"path":[{"challengee":"VARCHAR",
        |      "witnesses":[{"gateway":"VARCHAR"}]}]}') AS f
        |  FROM $txnsPq
        |  WHERE type IN ('poc_receipts_v1','poc_receipts_v2')),
        |roles AS (
        |  SELECT DISTINCT block, hash, 'challengee' AS role,
        |    unnest(list_transform(f.path, e -> e.challengee)) AS gateway
        |  FROM t
        |  UNION
        |  SELECT DISTINCT block, hash, 'witness',
        |    unnest(flatten(list_transform(f.path,
        |      e -> list_transform(e.witnesses, w -> w.gateway))))
        |  FROM t)
        |SELECT r.block, r.hash AS transaction_hash, r.role, r.gateway,
        |  g.owner AS gw_owner, g.location AS gw_location
        |FROM roles r LEFT JOIN $gwPq g ON r.gateway = g.address""".stripMargin)),

    // §2.8 witness map -> JSON (ref: src/be_db_gateway.erl:239-259):
    // per challengee, the witness histogram serialized as sorted JSON —
    // full reference shape: per-witness count plus first_time/recent_time
    // carried as strings (the reference stores timestamps stringly in
    // the witness jsonb).
    QDef("q48_witness_json",
      (s, _) => {
        val p = s.read
          .parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
          .filter(col("type").isin("poc_receipts_v1", "poc_receipts_v2"))
          .select(col("time"),
            from_json(col("fields"), Actors.fieldsSchema).as("f"))
        p.select(col("time"), explode(col("f")("path")).as("e"))
          .select(col("e.challengee").as("challengee"), col("time"),
            explode(col("e.witnesses")).as("w"))
          .groupBy(col("challengee"), col("w.gateway").as("witness"))
          .agg(count(lit(1)).as("n"),
            min(col("time")).cast("string").as("first_time"),
            max(col("time")).cast("string").as("recent_time"))
          .groupBy("challengee")
          .agg(to_json(sort_array(collect_list(
            struct(col("witness"), col("n"), col("first_time"),
              col("recent_time"))))).as("witnesses_json"),
            sum(col("n")).as("n_witness_reports"))
      },
      Some(s"""WITH t AS (
        |  SELECT time, json_transform(fields, '{"path":[{"challengee":"VARCHAR",
        |    "witnesses":[{"gateway":"VARCHAR"}]}]}') AS f
        |  FROM $txnsPq
        |  WHERE type IN ('poc_receipts_v1','poc_receipts_v2')),
        |w AS (
        |  SELECT time, e.challengee AS challengee,
        |    unnest(list_transform(e.witnesses, x -> x.gateway)) AS witness
        |  FROM (SELECT time, unnest(f.path) AS e FROM t)),
        |h AS (
        |  SELECT challengee, witness, count(*) AS n,
        |    CAST(min(time) AS VARCHAR) AS first_time,
        |    CAST(max(time) AS VARCHAR) AS recent_time
        |  FROM w GROUP BY challengee, witness)
        |SELECT challengee,
        |  to_json(list_sort(list({'witness': witness, 'n': n,
        |    'first_time': first_time, 'recent_time': recent_time})))
        |    AS witnesses_json,
        |  CAST(sum(n) AS BIGINT) AS n_witness_reports
        |FROM h GROUP BY challengee""".stripMargin)),

    // §2.8 trigram similarity (pg_trgm shape,
    // ref: migrations/1616176828:3): gateway-name fuzzy search against
    // a probe name, sim = |A∩B| / |A∪B| over padded char trigrams —
    // served from the inverted posting table (ops/TrigramIndex, the GIN
    // index shape): probe cost is the probe grams' posting lists, not a
    // full scan of every name.
    QDef("q49_trigram_search",
      (s, _) => {
        val probe = Codecs.animalName(FixtureGen.gateways(0))
        val gw = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        val index = graft.ops.TrigramIndex.build(gw, "name", "address", "name")
        graft.ops.TrigramIndex.search(index, probe, 0.2, "address", "name")
          .select(col("address"), col("name"), round(col("sim"), 6).as("sim"))
      },
      Some {
        val probe = Codecs.animalName(FixtureGen.gateways(0))
        val probePadded = "  " + probe.toLowerCase + " "
        val probeGrams = probePadded.sliding(3).toSeq.distinct
          .map(g => s"'${g}'").mkString("[", ",", "]")
        s"""WITH g AS (
        |  SELECT address, name, '  ' || lower(name) || ' ' AS p FROM $gwPq),
        |tg AS (
        |  SELECT address, name, list_distinct(list_transform(
        |    generate_series(1, len(p) - 2), i -> substr(p, CAST(i AS INT), 3)))
        |    AS grams
        |  FROM g),
        |sim AS (
        |  SELECT address, name,
        |    len(list_intersect(grams, $probeGrams))::DOUBLE /
        |    (len(grams) + len($probeGrams)
        |      - len(list_intersect(grams, $probeGrams))) AS sim
        |  FROM tg)
        |SELECT address, name, round(sim, 6) AS sim FROM sim
        |WHERE sim > 0.2""".stripMargin
      }),

    // §2.4 stats-inventory shape (ref: src/be_db_stats.erl:63-217):
    // chain + ledger counts as (name, value) rows — the recompute form
    // of the incremental counters (BlockIngest maintains the additive
    // form; IngestStatsSpec asserts they agree).
    QDef("q50_chain_stats",
      (s, _) => {
        val t = s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
        val gw = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        val vl = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_validators.parquet")
        val loc = s.read.parquet(s"${FixtureGen.FixtureDir}/locations.parquet")
        Seq(
          t.agg(countDistinct(col("block")).as("value"))
            .select(lit("blocks").as("name"), col("value")),
          t.agg(count(lit(1)).as("value"))
            .select(lit("transactions").as("name"), col("value")),
          t.filter(col("type") === "consensus_group_v1")
            .agg(count(lit(1)).as("value"))
            .select(lit("consensus_groups").as("name"), col("value")),
          t.filter(col("type") === "poc_request_v1")
            .agg(count(lit(1)).as("value"))
            .select(lit("challenges").as("name"), col("value")),
          gw.agg(count(lit(1)).as("value"))
            .select(lit("hotspots").as("name"), col("value")),
          gw.filter(col("mode") === "dataonly")
            .agg(count(lit(1)).as("value"))
            .select(lit("hotspots_dataonly").as("name"), col("value")),
          vl.filter(col("status") === "staked")
            .agg(count(lit(1)).as("value"))
            .select(lit("validators_staked").as("name"), col("value")),
          gw.join(loc, gw("location") === loc("location"))
            .agg(countDistinct(col("long_city")).as("value"))
            .select(lit("cities").as("name"), col("value")),
          gw.join(loc, gw("location") === loc("location"))
            .agg(countDistinct(col("long_country")).as("value"))
            .select(lit("countries").as("name"), col("value"))
        ).reduce(_ unionByName _)
      },
      Some(s"""SELECT 'blocks' AS name, count(DISTINCT block) AS value FROM $txnsPq
        |UNION ALL SELECT 'transactions', count(*) FROM $txnsPq
        |UNION ALL SELECT 'consensus_groups', count(*) FROM $txnsPq
        |  WHERE type = 'consensus_group_v1'
        |UNION ALL SELECT 'challenges', count(*) FROM $txnsPq
        |  WHERE type = 'poc_request_v1'
        |UNION ALL SELECT 'hotspots', count(*) FROM $gwPq
        |UNION ALL SELECT 'hotspots_dataonly', count(*) FROM $gwPq
        |  WHERE mode = 'dataonly'
        |UNION ALL SELECT 'validators_staked', count(*) FROM $valPq
        |  WHERE status = 'staked'
        |UNION ALL SELECT 'cities', count(DISTINCT long_city)
        |  FROM $gwPq g JOIN $locPq l ON g.location = l.location
        |UNION ALL SELECT 'countries', count(DISTINCT long_country)
        |  FROM $gwPq g JOIN $locPq l ON g.location = l.location""".stripMargin)),

    // §2.1 pending-txn decode with dead-lettering
    // (ref: src/be_db_pending_txn.erl:211-227): binary payloads decoded
    // by the stub wire codec; failures become status
    // 'failed'/'decoding_failure' instead of crashing the batch.
    QDef("q51_pending_decode",
      (s, _) => {
        val p = s.read.parquet(s"${FixtureGen.FixtureDir}/pending_txns.parquet")
        val txt = col("data").cast("string")
        val ok = txt.startsWith("TXNPB;")
        p.select(col("pending_id"), col("created_at"),
          when(ok, lit("pending")).otherwise(lit("failed")).as("status"),
          when(ok, lit(null).cast("string"))
            .otherwise(lit("decoding_failure")).as("failed_reason"),
          when(ok, regexp_extract(txt, "type=([^;]+)", 1)).as("txn_type"),
          when(ok, regexp_extract(txt, "payer=([^;]+)", 1)).as("payer"),
          when(ok, regexp_extract(txt, "nonce=([0-9]+)", 1).cast("long"))
            .as("nonce"))
      },
      Some(s"""WITH p0 AS (
        |  SELECT pending_id, created_at, TRY_CAST(data AS VARCHAR) AS raw
        |  FROM $pendPq),
        |p AS (
        |  SELECT pending_id, created_at,
        |    CASE WHEN raw IS NOT NULL AND position('TXNPB;' IN raw) = 1
        |      THEN raw END AS txt
        |  FROM p0)
        |SELECT pending_id, created_at,
        |  CASE WHEN txt IS NOT NULL THEN 'pending' ELSE 'failed' END AS status,
        |  CASE WHEN txt IS NOT NULL THEN NULL
        |       ELSE 'decoding_failure' END AS failed_reason,
        |  regexp_extract(txt, 'type=([^;]+)', 1) AS txn_type,
        |  regexp_extract(txt, 'payer=([^;]+)', 1) AS payer,
        |  CAST(regexp_extract(txt, 'nonce=([0-9]+)', 1) AS BIGINT) AS nonce
        |FROM p""".stripMargin)),

    // §2.1 geocode candidates (ref: src/be_db_geocoder.erl:28-59): the
    // anti-join finding locations with no geocode yet, rate-limited
    // oldest-first (here: by address for determinism).
    QDef("q52_geocode_candidates",
      (s, _) => {
        val gw = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        val loc = s.read.parquet(s"${FixtureGen.FixtureDir}/locations.parquet")
          .select(col("location"))
        gw.select(col("address"), col("location")).distinct()
          .join(loc, Seq("location"), "left_anti")
          .orderBy(col("address")).limit(100)
      },
      Some(s"""SELECT location, address FROM (
        |  SELECT DISTINCT g.location, g.address FROM $gwPq g
        |  WHERE NOT EXISTS (SELECT 1 FROM $locPq l
        |    WHERE l.location = g.location))
        |ORDER BY address LIMIT 100""".stripMargin)),

    // §2.8 penalty JSON construction (ref: src/be_db_validator.erl:126-148
    // shape {type, height, amount}): per failed validator, penalty events
    // from consensus_group_failure txns serialized as sorted JSON.
    QDef("q53_penalty_json",
      (s, _) => {
        val fails = parsed(s)
          .filter(col("type") === "consensus_group_failure_v1")
          .select(col("block"), explode(col("f")("failed_members")).as("validator"))
          .groupBy(col("validator"), col("block"))
          .agg(count(lit(1)).as("amount"))
          .select(col("validator"),
            struct(lit("performance").as("type"), col("block").as("height"),
              col("amount")).as("p"))
        fails.groupBy("validator")
          .agg(to_json(sort_array(collect_list(col("p")))).as("penalties"),
            sum(col("p.amount")).as("total_penalties"))
      },
      Some(s"""WITH t AS (
        |  SELECT block, json_transform(fields,
        |    '{"failed_members":["VARCHAR"]}') AS f
        |  FROM $txnsPq WHERE type = 'consensus_group_failure_v1'),
        |ev0 AS (
        |  SELECT unnest(f.failed_members) AS validator, block FROM t),
        |ev AS (
        |  SELECT validator, block, count(*) AS amount FROM ev0 GROUP BY 1, 2)
        |SELECT validator,
        |  to_json(list_sort(list({'type': 'performance', 'height': block,
        |    'amount': amount}))) AS penalties,
        |  CAST(sum(amount) AS BIGINT) AS total_penalties
        |FROM ev GROUP BY validator""".stripMargin)),

    // §2.9/§2.8 gateway status computation
    // (ref: src/be_db_gateway_status.erl:247-281): online iff the
    // gateway had poc activity within the interactivity window of the
    // chain tip — derived from transaction_actors, the ledger-math part
    // of the status refresh loop.
    QDef("q54_gateway_status",
      (s, _) => {
        val txnsDf = s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
        // poc roles only come from the poc txn types — filtering BEFORE
        // extraction pushes In(type,…) to the parquet scan instead of
        // running the 29-clause extraction over every txn and discarding
        // most of the output after the explode+distinct shuffle
        val actors = Actors.transactionActors(txnsDf.filter(col("type").isin(
          "poc_request_v1", "poc_receipts_v1", "poc_receipts_v2")))
        val tip = txnsDf.agg(max(col("block"))).head().getLong(0)
        val gw = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_gateways.parquet")
        // shared with the periodic refresh loop (streaming/StatusRefresh)
        graft.streaming.StatusRefresh.computeStatus(gw, actors, tip,
          window = 20L)
      },
      Some(s"""WITH ${DomainQueries.parsedAndPairsSql},
        |tip AS (SELECT max(block) AS tip FROM t),
        |activity AS (
        |  SELECT actor AS address, max(block) AS last_poc_block
        |  FROM pairs WHERE role IN ('challenger','challengee','witness')
        |  GROUP BY actor)
        |SELECT g.address, g.name, a.last_poc_block,
        |  CASE WHEN a.last_poc_block IS NOT NULL
        |         AND a.last_poc_block >= (SELECT tip FROM tip) - 20
        |    THEN 'online' ELSE 'offline' END AS online
        |FROM $gwPq g LEFT JOIN activity a ON g.address = a.address""".stripMargin)),

    // §2.1 peer-book status probe (stubbed,
    // ref: src/be_peer_status.erl:20-68) + §2.5 validator status left
    // join with per-column coalesce defaults
    // (ref: src/be_db_validator_status.erl:66-105): a validator is
    // online iff staked AND its peer entry is within 50 blocks of the
    // chain tip (height 60 in the fixtures).
    QDef("q55_validator_status",
      (s, _) => {
        val vl = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_validators.parquet")
        val pb = broadcast(
          s.read.parquet(s"${FixtureGen.FixtureDir}/peerbook.parquet"))
        vl.join(pb, Seq("address"), "left_outer")
          .select(col("address"), col("name"), col("status"),
            when(col("status") === "staked" &&
              col("peer_height").isNotNull && col("peer_height") >= 60L - 50L,
              lit("online")).otherwise(lit("offline")).as("online"),
            coalesce(col("release_version"), lit("unknown"))
              .as("release_version"),
            coalesce(col("peer_height"), lit(0L)).as("peer_height"))
      },
      Some(s"""SELECT v.address, v.name, v.status,
        |  CASE WHEN v.status = 'staked' AND p.peer_height IS NOT NULL
        |         AND p.peer_height >= 60 - 50
        |    THEN 'online' ELSE 'offline' END AS online,
        |  coalesce(p.release_version, 'unknown') AS release_version,
        |  coalesce(p.peer_height, 0) AS peer_height
        |FROM $valPq v LEFT JOIN
        |  read_parquet('${FixtureGen.FixtureDir}/peerbook.parquet/*.parquet') p
        |  ON v.address = p.address""".stripMargin)),

    // §2.3 OUI dirty-set builder with the oui+1 renumber quirk
    // (ref: src/be_db_oui.erl:66-98: oui_v1 touches oui+1 — or 1 when
    // oui <= 1 — while routing_v1 touches the oui as-is).
    QDef("q56_oui_dirty",
      (s, _) => {
        val p = parsed(s).filter(col("type").isin("oui_v1", "routing_v1"))
        p.select(col("block"),
            when(col("type") === "oui_v1",
              when(col("f")("oui") <= 1, lit(1L))
                .otherwise(col("f")("oui") + 1))
              .otherwise(col("f")("oui")).as("oui"))
          .distinct()
      },
      Some(s"""WITH o AS (
        |  SELECT block, type,
        |    CAST(json_extract_string(fields, '$$.oui') AS BIGINT) AS oui
        |  FROM $txnsPq WHERE type IN ('oui_v1','routing_v1'))
        |SELECT DISTINCT block,
        |  CASE WHEN type = 'oui_v1' THEN
        |    CASE WHEN oui <= 1 THEN 1 ELSE oui + 1 END
        |  ELSE oui END AS oui
        |FROM o""".stripMargin)),

    // §2.5 sc_closer JSON-projection join
    // (ref: migrations/1599584290:7-10): owner actors derived by joining
    // the sc_closer actor rows back to the txn JSON.
    QDef("q57_sc_closer_owner",
      (s, _) => {
        val txnsDf = s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
        // sc_closer only arises from state_channel_close_v1 — filter the
        // type at the scan (pushed filter) before the wide extraction
        val closers = Actors.transactionActors(
            txnsDf.filter(col("type") === "state_channel_close_v1"))
          .filter(col("actor_role") === "sc_closer")
          .select(col("block"), col("transaction_hash"))
        // every closer hash IS an sc_close txn — the enrichment side
        // prunes to the same type, so at scale the join reads (and can
        // broadcast) only that slice instead of the whole fact table
        val scTxns = txnsDf.filter(col("type") === "state_channel_close_v1")
        closers.join(scTxns, closers("transaction_hash") === scTxns("hash"))
          .select(closers("block"), col("transaction_hash"),
            get_json_object(col("fields"), "$.state_channel.owner")
              .as("actor"),
            lit("owner").as("actor_role"))
          .filter(col("actor").isNotNull)
          .distinct()
      },
      Some(s"""WITH ${DomainQueries.parsedAndPairsSql},
        |closers AS (
        |  SELECT DISTINCT block, hash FROM pairs
        |  WHERE role = 'sc_closer' AND actor IS NOT NULL AND actor <> '')
        |SELECT DISTINCT c.block, c.hash AS transaction_hash,
        |  json_extract_string(x.fields, '$$.state_channel.owner') AS actor,
        |  'owner' AS actor_role
        |FROM closers c JOIN $txnsPq x ON c.hash = x.hash
        |WHERE json_extract_string(x.fields, '$$.state_channel.owner')
        |  IS NOT NULL""".stripMargin)),

    // §2.5 txn-height continuity check
    // (ref: src/be_db_backfill.erl:49-54): blocks ⟕ transactions on
    // height — the backfill's orphan/continuity audit join.
    QDef("q58_height_continuity",
      (s, _) => {
        val blocks = s.read.parquet(s"${FixtureGen.FixtureDir}/blocks.parquet")
        val txnsDf = s.read.parquet(s"${FixtureGen.FixtureDir}/transactions.parquet")
          .groupBy(col("block")).agg(count(lit(1)).as("n_txns"))
        blocks.select(col("height"), col("block_hash"))
          .join(txnsDf, blocks("height") === txnsDf("block"), "left_outer")
          .select(col("height"), col("block_hash"),
            coalesce(col("n_txns"), lit(0L)).as("n_txns"),
            col("n_txns").isNotNull.as("has_txns"))
      },
      Some(s"""WITH bt AS (
        |  SELECT block, count(*) AS n_txns FROM $txnsPq GROUP BY block)
        |SELECT b.height, b.block_hash,
        |  coalesce(bt.n_txns, 0) AS n_txns,
        |  bt.n_txns IS NOT NULL AS has_txns
        |FROM read_parquet('${FixtureGen.FixtureDir}/blocks.parquet/*.parquet') b
        |LEFT JOIN bt ON b.height = bt.block""".stripMargin)),

    // §2.1 genesis load (ref: src/be_cli_genesis.erl:59-66): the gen_*
    // transactions seed the initial inventory state.
    QDef("q59_genesis_load",
      (s, _) => {
        val p = parsed(s).filter(col("type").isin("gen_gateway_v1",
          "gen_validator_v1", "gen_price_oracle_v1"))
        val f = col("f")
        p.select(col("block"), col("type"),
            when(col("type") === "gen_gateway_v1", f("gateway"))
              .when(col("type") === "gen_validator_v1", f("address"))
              .as("entity"),
            f("owner").as("owner"),
            when(col("type") === "gen_validator_v1", f("stake")).as("stake"),
            when(col("type") === "gen_price_oracle_v1", f("price")).as("price"))
      },
      Some(s"""SELECT block, type,
        |  CASE WHEN type = 'gen_gateway_v1'
        |         THEN json_extract_string(fields, '$$.gateway')
        |       WHEN type = 'gen_validator_v1'
        |         THEN json_extract_string(fields, '$$.address') END AS entity,
        |  json_extract_string(fields, '$$.owner') AS owner,
        |  CASE WHEN type = 'gen_validator_v1'
        |    THEN CAST(json_extract_string(fields, '$$.stake') AS BIGINT)
        |    END AS stake,
        |  CASE WHEN type = 'gen_price_oracle_v1'
        |    THEN CAST(json_extract_string(fields, '$$.price') AS BIGINT)
        |    END AS price
        |FROM $txnsPq
        |WHERE type IN ('gen_gateway_v1','gen_validator_v1',
        |  'gen_price_oracle_v1')""".stripMargin)),

    // §1.1 vars_inventory — the dynamic-typed key/value table
    // (ref: src/be_db_vars.erl:84-99, migrations/1592306954): latest
    // value per var name across the chain, set/unset semantics in
    // (block, hash) order.
    QDef("q60_vars_inventory",
      (s, _) => {
        val p = parsed(s).filter(col("type") === "vars_v1")
        val sets = p.select(col("block"), col("hash"),
            explode(col("f")("vars")).as(Seq("name", "value")))
        sets.groupBy("name")
          .agg(max_by(col("value"), struct(col("block"), col("hash")))
            .as("value"),
            max(col("block")).as("last_block"),
            count(lit(1)).as("n_sets"))
      },
      Some(s"""WITH v AS (
        |  SELECT block, hash, fields FROM $txnsPq WHERE type = 'vars_v1'),
        |u AS (
        |  SELECT block, hash, unnest(json_keys(fields, '$$.vars')) AS name
        |  FROM v),
        |kv AS (
        |  SELECT u.block, u.hash, u.name,
        |    json_extract_string(v.fields, '$$.vars.' || u.name) AS value
        |  FROM u JOIN v ON u.block = v.block AND u.hash = v.hash),
        |mx AS (SELECT name, max(block) AS last_block, count(*) AS n_sets
        |       FROM kv GROUP BY name),
        |pick AS (
        |  SELECT kv.name, arg_max(kv.value, kv.hash) AS value
        |  FROM kv JOIN mx ON kv.name = mx.name AND kv.block = mx.last_block
        |  GROUP BY kv.name)
        |SELECT p.name, p.value, m.last_block, m.n_sets
        |FROM pick p JOIN mx m ON p.name = m.name""".stripMargin)),

    // §2.4 staked-balance rollup (ref: src/be_db_account.erl:73-88):
    // sum validator stakes per owner, broadcast-joined onto accounts.
    QDef("q61_staked_balance",
      (s, _) => {
        val acct = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_accounts.parquet")
        val vl = s.read.parquet(s"${FixtureGen.FixtureDir}/ledger_validators.parquet")
        val staked = vl.filter(col("status") === "staked")
          .groupBy(col("owner")).agg(sum(col("stake")).as("staked_balance"))
        acct.select(col("address"), col("balance"))
          .join(broadcast(staked), acct("address") === staked("owner"),
            "left_outer")
          .select(col("address"), col("balance"),
            coalesce(col("staked_balance"), lit(0L)).as("staked_balance"))
      },
      Some(s"""WITH staked AS (
        |  SELECT owner, CAST(sum(stake) AS BIGINT) AS staked_balance
        |  FROM $valPq WHERE status = 'staked' GROUP BY owner)
        |SELECT a.address, a.balance,
        |  coalesce(s.staked_balance, 0) AS staked_balance
        |FROM read_parquet('${FixtureGen.FixtureDir}/ledger_accounts.parquet/*.parquet') a
        |LEFT JOIN staked s ON a.address = s.owner""".stripMargin))
  )
}
