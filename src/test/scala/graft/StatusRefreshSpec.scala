package graft

import graft.domain.Actors
import graft.streaming.StatusRefresh
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Periodic status-refresh side job: adaptive rate, stalest-first
  * spread, full coverage after a refresh period, and the streaming
  * shell itself.
  */
class StatusRefreshSpec extends SparkSpec {

  private lazy val gw =
    spark.read.parquet("/root/repo/fixtures/ledger_gateways.parquet")
  private lazy val txns =
    spark.read.parquet("/root/repo/fixtures/transactions.parquet")
  private lazy val actors = Actors.transactionActors(txns.filter(
    col("type").isin("poc_request_v1", "poc_receipts_v1", "poc_receipts_v2")))

  test("adaptive request rate matches the reference's formula") {
    assert(StatusRefresh.requestRate(0) === 1)
    assert(StatusRefresh.requestRate(600) === 1)
    assert(StatusRefresh.requestRate(6000) === 10)
    assert(StatusRefresh.requestRate(1000000) === 200, "capped")
  }

  test("ticks cover the inventory stalest-first; later ticks rotate") {
    val stateDir = Files.createTempDirectory("status").toString + "/state"
    val n = gw.count().toInt
    val budget = (n + 2) / 3
    Seq(100L, 200L, 300L).foreach(now =>
      StatusRefresh.tick(gw, actors, tip = 60L, window = 20L,
        stateDir, budget, now))
    val st = spark.read.parquet(stateDir)
    assert(st.count() === n, "every gateway refreshed after one period")
    assert(st.filter(col("updated_at") === 0L).count() === 0L)
    // statuses equal the one-shot computation (q54's oracle-checked math)
    val oneShot = StatusRefresh.computeStatus(gw, actors, 60L, 20L)
    assert(st.drop("updated_at").except(oneShot).count() === 0L)
    assert(oneShot.except(st.drop("updated_at")).count() === 0L)
    // a fourth tick refreshes the stalest rows: the whole t=100 cohort
    // goes first (budget > cohort size, so it tops up from t=200)
    StatusRefresh.tick(gw, actors, 60L, 20L, stateDir, budget, 400L)
    val st2 = spark.read.parquet(stateDir)
    assert(st2.filter(col("updated_at") === 100L).count() === 0L)
    assert(st2.filter(col("updated_at") === 400L).count() === budget.toLong)
  }

  test("streaming shell fires ProcessingTime ticks") {
    val base = Files.createTempDirectory("statusrun").toString
    val stateDir = s"$base/state"
    val q = StatusRefresh.run(spark, () => gw, () => actors, () => 60L,
      window = 20L, stateDir, s"$base/ckpt", intervalMs = 200)
    val success = java.nio.file.Paths.get(s"$stateDir/_SUCCESS")
    val ticked =
      try {
        val deadline = System.currentTimeMillis() + 15000
        while (!Files.exists(success) &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
        Files.exists(success)
      } finally q.stop()
    assert(ticked, "at least one tick must have produced complete state")
    // stop() may interrupt an in-flight state swap (the side job is
    // rebuildable by design, like the reference's status cache) — one
    // deterministic tick repairs before reading
    StatusRefresh.tick(gw, actors, 60L, 20L, stateDir,
      budget = gw.count().toInt, nowSec = 999L)
    val st = spark.read.parquet(stateDir)
    assert(st.count() > 0)
    assert(st.columns.contains("updated_at"))
  }
}
