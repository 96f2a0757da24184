package graft

import graft.streaming.StreamRetention
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

/** The drained streaming retention rows must equal batch q218's
  * (cohort, offset) activity — with the cohort day fixed by the FIRST
  * batch a user appears in, offset activity arriving in LATER batches
  * still attributed, and same-day replays silent.
  */
class StreamRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int) =
    new Timestamp(86400000L * (19000L + day) + 3600000L * h)

  private val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
    "event_type STRING, value DOUBLE, props STRING"

  test("drain == batch cohort rows across batch boundaries") {
    val src = Files.createTempDirectory("sret").toString
    // u1: first day 0 (batch 1), active day 1 (batch 2), day 2
    // (untracked offset), day 7 (batch 2) — rows for off 0, 1, 7.
    // u2: first day 1, two same-day events (one emission), day 15
    // (untracked) — row for off 0 only.
    val b1 = Seq(
      (1L, ts(0, 1), 1L, "view", 0.0, "{}"),
      (2L, ts(1, 2), 2L, "view", 0.0, "{}"),
      (3L, ts(1, 3), 2L, "click", 0.0, "{}"))
    val b2 = Seq(
      (4L, ts(1, 1), 1L, "view", 0.0, "{}"),
      (5L, ts(2, 1), 1L, "view", 0.0, "{}"),
      (6L, ts(7, 1), 1L, "view", 0.0, "{}"),
      (7L, ts(16, 1), 2L, "view", 0.0, "{}"))
    b1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    b2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0b.parquet")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamRetention.activity(stream.toDF())
      .toDF("user_id", "cohort_day", "day_offset")
      .writeStream.format("memory").queryName("sret")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sret")
      .as[(Long, Long, Long)].collect().toSet
    val d = 19000L
    val expect = Set(
      (1L, d, 0L), (1L, d, 1L), (1L, d, 7L),
      (2L, d + 1, 0L))
    assert(got == expect, s"got $got")
    assert(spark.table("sret").count() == expect.size) // no dup emits
  }
}
