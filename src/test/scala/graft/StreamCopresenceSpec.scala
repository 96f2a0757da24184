package graft

import graft.streaming.StreamCopresence
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

/** The drained stream-stream co-presence join must equal the batch
  * theta join on the same events — including pairs whose two events
  * arrive in DIFFERENT micro-batches (the whole point of join state),
  * and excluding same-user and out-of-window pairs.
  */
class StreamCopresenceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int, s: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  private val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
    "event_type STRING, value DOUBLE, props STRING"

  test("drained pairs == batch theta join; cross-batch pair found; " +
    "same-user and out-of-window excluded") {
    val src = Files.createTempDirectory("scop").toString
    // window = 300 s. Planted: u1@10:00 & u2@10:02 (in-window, same
    // batch); u2@10:02 & u3@10:04 (in-window, SPLIT across batches);
    // u1@10:00 & u3@10:20 (out of window); u1@10:00 & u1@10:01 (same
    // user — excluded); u4@10:03:30 & u2@10:02 (in-window, bucket-
    // boundary neighbors).
    val b1 = Seq(
      (1L, ts(0), 1L, "a", 0.0, "{}"),
      (2L, ts(1), 1L, "a", 0.0, "{}"),
      (3L, ts(2), 2L, "a", 0.0, "{}"))
    val b2 = Seq(
      (4L, ts(4), 3L, "a", 0.0, "{}"),
      (5L, ts(3, 30), 4L, "a", 0.0, "{}"),
      (6L, ts(20), 3L, "a", 0.0, "{}"))
    b1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    b2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0b.parquet")

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamCopresence.pairs(stream.toDF(), windowSec = 300)
      .writeStream.format("memory").queryName("scop")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("scop")
      .select("ua", "ub", "eid_a", "eid_b")
      .as[(Long, Long, Long, Long)].collect().toSet

    // batch truth: naive theta self-join, later event on the right
    val all = (b1 ++ b2).map(r => (r._1, r._2, r._3))
    val expect = (for {
      (ea, ta, ua) <- all
      (eb, tb, ub) <- all
      if ua != ub
      if math.abs(tb.getTime - ta.getTime) <= 300000L
      if tb.getTime > ta.getTime || (tb.getTime == ta.getTime && eb > ea)
    } yield (math.min(ua, ub), math.max(ua, ub), ea, eb)).toSet
    assert(got === expect)
    // the planted shapes actually occurred
    assert(expect.exists { case (a, b, _, _) => a == 2L && b == 3L },
      "cross-batch pair missing from the fixture itself")
    assert(!expect.exists { case (a, b, _, _) => a == b })
  }

  test("every unordered event pair is emitted exactly once (bucket " +
    "anchoring needs no dedup)") {
    val src = Files.createTempDirectory("scop2").toString
    // a cluster of 4 users inside one window — 6 unordered user pairs,
    // every event pair in range; duplicates would inflate the count
    val rows = (1 to 4).map(i =>
      (i.toLong, ts(0, 10 * i), i.toLong, "a", 0.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamCopresence.pairs(stream.toDF(), windowSec = 300)
      .writeStream.format("memory").queryName("scop2")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("scop2")
      .select("ua", "ub", "eid_a", "eid_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size == got.toSet.size, "duplicate pair rows emitted")
    assert(got.size == 6, s"expected all 6 event pairs once, got $got")
  }
}
