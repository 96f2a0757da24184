package graft

import graft.streaming.StreamTransitions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

/** Streaming transition counts must equal the batch q166 matrix, and
  * the per-user last-event state must chain transitions ACROSS
  * micro-batch boundaries.
  */
class StreamTransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("drained stream == batch transitions, including the batch-" +
    "boundary pair") {
    val src = Files.createTempDirectory("strans").toString
    // user 1's a→b transition SPANS the two files: the 'a' event is in
    // b1, the 'b' event in b2 — only carried state can count it.
    // 0-prefixed file names pin the arrival order.
    val b1 = Seq(
      (1L, ts(1), 1L, "a", 0.0, "{}"),
      (2L, ts(1), 2L, "c", 0.0, "{}"),
      (3L, ts(2), 2L, "d", 0.0, "{}"))
    val b2 = Seq(
      (4L, ts(3), 1L, "b", 0.0, "{}"),
      (5L, ts(4), 1L, "a", 0.0, "{}"),
      (6L, ts(5), 2L, "c", 0.0, "{}"))
    // one part-file per logical batch: the ordering contract is
    // per-ARRIVAL, and a multi-part directory under maxFilesPerTrigger=1
    // would split a batch into arbitrarily-ordered micro-batches
    b1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    b2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0b.parquet")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamTransitions.transitions(stream.toDF())
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("strans")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("strans")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    // batch truth: u1: a→b→a; u2: c→d→c
    val expect = Set(("a", "b", 1L), ("b", "a", 1L),
      ("c", "d", 1L), ("d", "c", 1L))
    assert(got === expect)
  }

  test("single-batch drain matches the batch operator on a larger mix") {
    val src = Files.createTempDirectory("strans2").toString
    val rows = (0 until 60).map { i =>
      (i.toLong, ts(i % 50), (i % 5).toLong,
        Seq("a", "b", "c")(i % 3), 0.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$src/all.parquet")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$src/*.parquet")
    val q = StreamTransitions.transitions(stream.toDF())
      .toDF("from_type", "to_type")
      .writeStream.format("memory").queryName("strans2")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("strans2")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    // q166 reads <dir>/events.parquet — stage the same rows there
    val dir2 = Files.createTempDirectory("strans2b").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir2/events.parquet")
    val expect = SparkEntry.queries("q166_markov_transitions")(spark, dir2)
      .select(col("from_type"), col("to_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(got === expect)
  }
}
