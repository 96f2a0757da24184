package graft

import graft.streaming.StreamFunnel
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

/** The drained streaming funnel must equal batch q217's per-user
  * stage flags — including a funnel that completes ACROSS micro-batch
  * boundaries (only carried state can convert it) — and replayed
  * events must not re-emit stages.
  */
class StreamFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
    "event_type STRING, value DOUBLE, props STRING"

  test("drain == batch stages; the cross-batch purchase converts") {
    val src = Files.createTempDirectory("sfun").toString
    // u1 views+clicks in batch 1, purchases in batch 2; u2's click
    // arrives before any view (no qualified click ever); u3 replays
    // its view in batch 2 (must stay silent)
    val b1 = Seq(
      (1L, ts(1), 1L, "view", 0.0, "{}"),
      (2L, ts(2), 1L, "click", 0.0, "{}"),
      (3L, ts(1), 2L, "click", 0.0, "{}"),
      (4L, ts(2), 2L, "view", 0.0, "{}"),
      (5L, ts(1), 3L, "view", 0.0, "{}"))
    val b2 = Seq(
      (6L, ts(3), 1L, "purchase", 0.0, "{}"),
      (7L, ts(3), 2L, "purchase", 0.0, "{}"),
      (5L, ts(1), 3L, "view", 0.0, "{}")) // replay of event 5
    b1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    b2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0b.parquet")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamFunnel.stages(stream.toDF())
      .toDF("user_id", "stage")
      .writeStream.format("memory").queryName("sfun")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sfun")
      .as[(Long, String)].collect().toSet
    val expect = Set(
      (1L, "view"), (1L, "view_click"), (1L, "view_click_purchase"),
      (2L, "view"), // the pre-view click and the purchase never qualify
      (3L, "view")) // replay emitted nothing new
    assert(got == expect, s"got $got")
    // and the emission count shows no replay duplicates
    assert(spark.table("sfun").count() == expect.size)
  }
}
