package graft

import graft.domain.{Activity, Actors}
import org.apache.spark.sql.functions._

/** Spot checks of the to_actors clause semantics
  * (ref: src/be_db_txn_actor.erl:107-453) and the activity filter
  * (ref: migrations/1628075186:4-27).
  */
class ActorsSpec extends SparkSpec {
  import spark.implicits._

  private def actorsOf(typ: String, fields: String): Set[(String, String)] =
    Actors.transactionActors(
      Seq((1L, "h1", typ, fields)).toDF("block", "hash", "type", "fields"))
      .select("actor_role", "actor").as[(String, String)].collect().toSet

  test("payment self-pay dedups to two rows, not three") {
    val out = actorsOf("payment_v1", """{"payer":"A","payee":"A"}""")
    assert(out === Set(("payer", "A"), ("payee", "A")))
  }

  test("add_gateway payer falls back to owner when missing or empty") {
    assert(actorsOf("add_gateway_v1",
      """{"gateway":"G","owner":"O"}""") ===
      Set(("gateway", "G"), ("owner", "O"), ("payer", "O")))
    assert(actorsOf("add_gateway_v1",
      """{"gateway":"G","owner":"O","payer":""}""") ===
      Set(("gateway", "G"), ("owner", "O"), ("payer", "O")))
    assert(actorsOf("add_gateway_v1",
      """{"gateway":"G","owner":"O","payer":"P"}""") ===
      Set(("gateway", "G"), ("owner", "O"), ("payer", "P")))
  }

  test("poc_receipts_v2 adds validator role for the challenger") {
    val f = """{"challenger":"C","path":[{"challengee":"E1","witnesses":
      [{"gateway":"W1"},{"gateway":"W2"}]},{"challengee":"E2","witnesses":
      [{"gateway":"W1"}]}]}""".replace("\n", "")
    val v1 = actorsOf("poc_receipts_v1", f)
    assert(v1 === Set(("challenger", "C"), ("challengee", "E1"),
      ("challengee", "E2"), ("witness", "W1"), ("witness", "W2")))
    val v2 = actorsOf("poc_receipts_v2", f)
    assert(v2 === v1 + (("validator", "C")))
  }

  test("routing_v1 emits routers only for update_routers actions") {
    assert(actorsOf("routing_v1",
      """{"owner":"O","action":{"action":"update_routers","addresses":["R1","R2"]}}""") ===
      Set(("owner", "O"), ("payer", "O"), ("router", "R1"), ("router", "R2")))
    assert(actorsOf("routing_v1",
      """{"owner":"O","action":{"action":"new_xor"}}""") ===
      Set(("owner", "O"), ("payer", "O")))
  }

  test("transfer_validator_stake owner set depends on owner equality") {
    val base = """"old_validator":"V1","new_validator":"V2""""
    assert(actorsOf("transfer_validator_stake_v1",
      s"""{$base,"old_owner":"A","new_owner":"A"}""")
      .count(_._1 == "owner") === 1)
    assert(actorsOf("transfer_validator_stake_v1",
      s"""{$base,"old_owner":"A","new_owner":"B"}""")
      .collect { case ("owner", o) => o } === Set("A", "B"))
  }

  test("rewards gateway entries emit reward_gateway only when present") {
    val out = actorsOf("rewards_v1",
      """{"rewards":[{"account":"A1","gateway":"G1","amount":5,"type":"poc"},
        {"account":"A2","amount":6,"type":"consensus"}]}""".replace("\n", ""))
    assert(out === Set(("payee", "A1"), ("payee", "A2"),
      ("reward_gateway", "G1")))
  }

  test("vars and exchange-rate txns have no actors") {
    assert(actorsOf("vars_v1", """{"vars":{"a":1},"nonce":2}""").isEmpty)
    assert(actorsOf("token_burn_exchange_rate_v1", """{"rate":5}""").isEmpty)
  }

  test("activity filter: rewards NULL-when-empty, summaries coalesce-[]") {
    val f = from_json(lit(
      """{"rewards":[{"account":"A","amount":3,"type":"poc"}],
        "state_channel":{"owner":"O","summaries":[]}}""".replace("\n", "")),
      Actors.fieldsSchema)
    val df = spark.range(1).select(
      Activity.keptRewards(lit("NOBODY"), f).as("kr"),
      Activity.keptRewards(lit("A"), f).as("kr2"),
      Activity.keptSummaries(lit("X"), f).as("ks"))
    val r = df.collect().head
    assert(r.getAs[Any]("kr") == null, "no matching rewards -> NULL")
    assert(r.getAs[Seq[Any]]("kr2").length === 1)
    assert(r.getAs[Seq[Any]]("ks") === Seq.empty, "summaries coalesce to []")
  }

  test("activity filter: payment_v2 payer passthrough vs payee filter") {
    val f = from_json(lit(
      """{"payer":"P","payments":[{"payee":"X","amount":1},
        {"payee":"Y","amount":2}]}""".replace("\n", "")),
      Actors.fieldsSchema)
    val r = spark.range(1).select(
      Activity.keptPayments(lit("P"), f).as("full"),
      Activity.keptPayments(lit("Y"), f).as("one"),
      Activity.keptPayments(lit("Z"), f).as("none")).collect().head
    assert(r.getAs[Seq[Any]]("full").length === 2)
    assert(r.getAs[Seq[Any]]("one").length === 1)
    assert(r.getAs[Any]("none") == null)
  }
}
