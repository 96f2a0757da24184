package graft

import graft.ops.PendingTxnLifecycle._
import org.apache.spark.sql.functions._

/** Replays the reference's pending-txn status machine
  * (src/be_db_pending_txn.erl:133-206) through a submit → fail →
  * resubmit → clear sequence, plus the guards: decode dead-letter,
  * duplicate_key no-op, SET_FAILED never downgrading a cleared row,
  * and the crash-recovery init round re-submitting in-flight rows.
  */
class PendingTxnLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def wire(typ: String, nonce: Int): Array[Byte] =
    s"TXNPB;type=$typ;payer=p1;nonce=$nonce;".getBytes("US-ASCII")

  private val raw = Seq(
    (1L, 100L, wire("payment_v2", 1)),           // fails submit, retried, clears
    (2L, 101L, wire("payment_v1", 2)),           // clears first round
    (3L, 102L, Array[Byte](1, 2, 3)),            // corrupt → dead-letter
    (4L, 103L, wire("token_burn_v1", 4)),        // duplicate_key → stays pending
    (5L, 104L, wire("payment_v2", 5))            // clears; late error must not downgrade
  ).toDF("pending_id", "created_at", "data")

  private def statuses(df: org.apache.spark.sql.DataFrame): Map[Long, (String, String)] =
    df.select(col("pending_id"), col("status"),
        coalesce(col("failed_reason"), lit("<null>")))
      .as[(Long, String, String)].collect()
      .map { case (id, st, fr) => id -> (st, fr) }.toMap

  test("submit-fail-retry sequence lands every row in its reference state") {
    val p1 = submitRound(init(raw), lit(10L))
    val s1 = statuses(p1)
    assert(s1(1L) === (Pending, "")); assert(s1(2L) === (Pending, ""))
    assert(s1(3L) === (Failed, "decoding_failure"))
    assert(s1(4L) === (Pending, "")); assert(s1(5L) === (Pending, ""))

    val results1 = Seq((1L, "txn_queue_full"), (2L, "ok"),
      (4L, "duplicate_key"), (5L, "ok")).toDF("pending_id", "result")
    val p2 = applyResults(p1, results1, lit(20L))
    val s2 = statuses(p2)
    assert(s2(1L) === (Failed, "txn_queue_full"))
    assert(s2(2L) === (Cleared, ""))
    assert(s2(3L) === (Failed, "decoding_failure"), "no result for dead-letter")
    assert(s2(4L) === (Pending, ""), "duplicate_key is a no-op")
    assert(s2(5L) === (Cleared, ""))

    // late/dup failure result after cleared: SET_FAILED's guard holds
    val p2b = applyResults(p2, Seq((5L, "timeout")).toDF("pending_id", "result"),
      lit(25L))
    assert(statuses(p2b)(5L) === (Cleared, ""))

    // user resubmits txn 1; the next poll round re-submits it and the
    // chain accepts → cleared. Txn 3 was not resubmitted: stays failed.
    val p3 = resubmit(p2b, Seq(Tuple1(1L)).toDF("pending_id"), lit(30L))
    assert(statuses(p3)(1L) === (Received, "<null>"))
    val p4 = submitRound(p3, lit(40L))
    assert(statuses(p4)(1L) === (Pending, ""))
    val p5 = applyResults(p4, Seq((1L, "ok")).toDF("pending_id", "result"),
      lit(50L))
    val s5 = statuses(p5)
    assert(s5(1L) === (Cleared, ""))
    assert(s5(3L) === (Failed, "decoding_failure"))
    assert(s5 === Map(
      1L -> (Cleared, ""), 2L -> (Cleared, ""),
      3L -> (Failed, "decoding_failure"),
      4L -> (Pending, ""), 5L -> (Cleared, "")))
  }

  test("updated_at touches only on status transitions") {
    val p1 = submitRound(init(raw), lit(10L))
    val results1 = Seq((1L, "txn_queue_full"), (2L, "ok"),
      (4L, "duplicate_key")).toDF("pending_id", "result")
    val p2 = applyResults(p1, results1, lit(20L))
    val touched = p2.select(col("pending_id"), col("updated_at"))
      .as[(Long, Long)].collect().toMap
    assert(touched(1L) === 20L, "error result is a transition")
    assert(touched(2L) === 20L, "clear is a transition")
    assert(touched(3L) === 10L, "dead-letter happened at submit time")
    assert(touched(4L) === 10L, "duplicate_key no-op leaves updated_at")
    assert(touched(5L) === 10L, "no result yet")
  }

  test("random event sequences match a driver-side interpreter") {
    // property-style: 30 txns (some corrupt), 12 random rounds of
    // submit / results / resubmit, checked against a straightforward
    // in-memory interpretation of the reference's statement semantics
    val rnd = new scala.util.Random(99)
    val txns = (1L to 30L).map { id =>
      val data = if (rnd.nextInt(6) == 0) Array[Byte](9, 9)
        else wire("payment_v2", id.toInt)
      (id, 100L + id, data)
    }
    val decodable = txns.filter(_._3.startsWith("TXNPB;".getBytes("US-ASCII")))
      .map(_._1).toSet
    // model state: id -> (status, failed_reason)
    val model = scala.collection.mutable.Map[Long, (String, String)]()
    txns.foreach { case (id, _, _) => model(id) = (Received, null) }
    var df = init(txns.toDF("pending_id", "created_at", "data"))
    for (round <- 1 to 12) {
      val t = lit(1000L + round)
      rnd.nextInt(3) match {
        case 0 => // poll round
          df = submitRound(df, t)
          val received = model.collect { case (id, (st, _)) if st == Received => id }.toSeq
          received.foreach { id =>
            model(id) = if (decodable(id)) (Pending, "")
              else (Failed, "decoding_failure")
          }
        case 1 => // async results for a random subset of pending rows
          val pend = model.collect { case (id, (st, _)) if st == Pending => id }
          val res = pend.filter(_ => rnd.nextBoolean()).toSeq.map { id =>
            (id, rnd.nextInt(3) match {
              case 0 => "ok"
              case 1 => "duplicate_key"
              case _ => "some_error"
            })
          }
          if (res.nonEmpty) {
            df = applyResults(df, res.toDF("pending_id", "result"), t)
            res.foreach {
              case (id, "ok") => model(id) = (Cleared, "")
              case (id, "duplicate_key") =>
              case (id, err) if model(id)._1 != Cleared => model(id) = (Failed, err)
              case _ =>
            }
          }
        case 2 => // user resubmits a random subset of failed rows
          val failed = model.collect { case (id, (st, _)) if st == Failed => id }
          val ids = failed.filter(_ => rnd.nextBoolean()).toSeq
          if (ids.nonEmpty) {
            df = resubmit(df, ids.map(Tuple1(_)).toDF("pending_id"), t)
            ids.foreach(id => model(id) = (Received, null))
          }
      }
      // cut lineage: 12 rounds of chained joins would otherwise make
      // Catalyst re-analysis quadratic (PLANS.md lesson #4)
      df = df.localCheckpoint()
    }
    val got = statuses(df)
    val want = model.toMap.map { case (id, (st, fr)) =>
      id -> (st, if (fr == null) "<null>" else fr) }
    assert(got === want)
  }

  test("init round (crash recovery) re-submits in-flight pending rows") {
    val state = Seq(
      (1L, 100L, wire("payment_v2", 1), Received, null.asInstanceOf[String],
        null.asInstanceOf[String], 100L),
      (2L, 101L, wire("payment_v1", 2), Pending, "",
        """{"type":"payment_v1"}""", 105L),
      (3L, 102L, wire("payment_v1", 3), Failed, "txn_queue_full",
        """{"type":"payment_v1"}""", 106L)
    ).toDF("pending_id", "created_at", "data", "status", "failed_reason",
      "fields", "updated_at")
    val steady = submitRound(state, lit(200L))
    assert(statuses(steady).view.mapValues(_._1).toMap ===
      Map(1L -> Pending, 2L -> Pending, 3L -> Failed),
      "steady-state round picks up received only")
    val recovery = submitRound(state, lit(200L), includePending = true)
    val fields = recovery.select(col("pending_id"), col("fields"))
      .as[(Long, String)].collect().toMap
    assert(statuses(recovery)(2L) === (Pending, ""))
    assert(fields(2L).contains("\"nonce\":2"),
      "init round re-decoded the in-flight row's fields")
    assert(statuses(recovery)(3L) === (Failed, "txn_queue_full"),
      "failed rows are never auto-resubmitted")
  }
}
