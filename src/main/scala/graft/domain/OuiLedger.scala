package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** oui_inventory semantics — the routing table per OUI
  * (ref: migrations/1612480010-ouis.sql:16-57: oui, owner, nonce,
  * addresses TEXT[], subnets INT[][], first/last block, latest-row
  * upsert per oui; row values from the ledger's routing entry,
  * src/be_db_oui.erl:100-121; the oui_v1 → oui+1 renumber quirk,
  * src/be_db_oui.erl:66-98; subnet [base, mask] unpack
  * src/be_db_oui.erl:100-102).
  *
  * The reference reads each dirty OUI's routing entry from its ledger;
  * we reconstruct the same state as a fold over the routing lifecycle
  * txns: `oui_v1` creates the entry (owner, router addresses, an initial
  * subnet), `routing_v1/update_routers` replaces the address list,
  * `routing_v1/request_subnet` appends a subnet, every routing txn
  * advances the nonce. Subnet allocation is deterministic ([block,
  * size] — the real allocator lives in the chain ledger we don't model).
  *
  * This is the only inventory carrying nested array columns
  * (ArrayType(StringType), ArrayType(ArrayType(IntegerType)) — SURVEY
  * §1.2); the ingest driver persists them as genuine parquet LIST
  * columns (round-trip asserted in BlockIngestSpec).
  */
object OuiLedger {

  /** One row per (txn, oui) with the per-column settings this txn
    * carries; nulls mean "does not set".
    */
  def rows(txns: DataFrame): DataFrame = {
    val parsed = txns.filter(col("type").isin("oui_v1", "routing_v1"))
      .select(col("block"), col("type"),
        Ver.key(col("block"), col("hash")).as("ver"),
        from_json(col("fields"), Actors.fieldsSchema).as("f"))
    val f = col("f")
    val isOui = col("type") === "oui_v1"
    val action = f("action")("action")
    parsed.select(
      // oui_v1 allocates the NEXT oui: <=1 -> 1, else oui+1
      // (ref: src/be_db_oui.erl:74-80)
      when(isOui, when(f("oui") <= 1, lit(1L)).otherwise(f("oui") + 1))
        .otherwise(f("oui")).as("oui"),
      col("block"), col("ver"),
      f("owner").as("owner"),
      when(isOui, lit(0L)).otherwise(f("nonce")).as("nonce"),
      when(isOui, f("addresses"))
        .when(action === "update_routers", f("action")("addresses"))
        .as("addresses"),
      when(isOui, array(col("block").cast("int"), lit(8)))
        .when(action === "request_subnet",
          array(col("block").cast("int"),
            f("action")("subnet_size").cast("int")))
        .as("subnet"))
  }

  /** Collapse to one row per oui: latest owner/nonce, last non-null
    * address list, sorted accumulated subnets. One hash aggregation —
    * `max_by` with a null-skipping order key for the coalesce columns,
    * `collect_list` (null-skipping) + `array_sort` for the subnet set;
    * the sort makes the accumulated list independent of merge order.
    */
  def fold(r: DataFrame): DataFrame =
    r.groupBy("oui").agg(
      max_by(col("owner"), when(col("owner").isNotNull, col("ver")))
        .as("owner"),
      max_by(col("nonce"), when(col("nonce").isNotNull, col("ver")))
        .as("nonce"),
      max_by(col("addresses"), when(col("addresses").isNotNull, col("ver")))
        .as("addresses"),
      array_sort(collect_list(col("subnet"))).as("subnets"),
      min(col("block")).as("first_block"),
      max(col("block")).as("last_block"))

  private val emptyAddrs = array().cast("array<string>")
  private val emptySubnets = array().cast("array<array<int>>")

  /** The migration's NOT-NULL presentation (TEXT[] / INT[][] default
    * empty).
    */
  def finish(inv: DataFrame): DataFrame =
    inv.select(col("oui"), col("owner"), col("nonce"),
      coalesce(col("addresses"), emptyAddrs).as("addresses"),
      coalesce(col("subnets"), emptySubnets).as("subnets"),
      col("first_block"), col("last_block"))

  /** Incremental upsert of a batch fold into finished state: scalar
    * columns newest-wins (strict block order), address list replaced
    * when the batch set one, subnets unioned + re-sorted.
    */
  def merge(state: DataFrame, batch: DataFrame): DataFrame = {
    val j = state.as("s").join(batch.as("b"), Seq("oui"), "full_outer")
    j.select(col("oui"),
      coalesce(col("b.owner"), col("s.owner")).as("owner"),
      coalesce(col("b.nonce"), col("s.nonce")).as("nonce"),
      coalesce(col("b.addresses"), col("s.addresses"), emptyAddrs)
        .as("addresses"),
      array_sort(concat(coalesce(col("s.subnets"), emptySubnets),
        coalesce(col("b.subnets"), emptySubnets))).as("subnets"),
      least(col("s.first_block"), col("b.first_block")).as("first_block"),
      greatest(col("s.last_block"), col("b.last_block")).as("last_block"))
  }

  /** One-shot inventory over a full transactions table. */
  def inventory(txns: DataFrame): DataFrame = finish(fold(rows(txns)))
}
