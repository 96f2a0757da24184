package graft

import graft.streaming.StreamEventPaths
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

/** Streaming path instances must aggregate to q344's batch table on
  * the real fixture, and the two-event tail state must emit the
  * trigram that straddles a micro-batch boundary.
  */
class StreamEventPathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("a trigram spanning the batch boundary is still emitted") {
    val src = Files.createTempDirectory("spaths").toString
    // user 1: a, b in batch 1; c in batch 2 — a>b>c needs the carried
    // two-event tail
    val b1 = Seq(
      (1L, ts(1), 1L, "a", 0.0, "{}"),
      (2L, ts(2), 1L, "b", 0.0, "{}"))
    val b2 = Seq(
      (3L, ts(3), 1L, "c", 0.0, "{}"),
      (4L, ts(4), 1L, "d", 0.0, "{}"))
    b1.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    b2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$src/0b.parquet")
    val stream = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, " +
        "event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamEventPaths.trigrams(stream.toDF())
      .toDF("path")
      .writeStream.format("memory").queryName("spaths")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("spaths").as[String].collect().sorted.toSeq
    assert(got === Seq("a>b>c", "b>c>d"))
  }

  test("drained instances aggregate to the batch q344 table on the " +
    "sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val src = Files.createTempDirectory("spaths2").toString
    val ev = Tables.events(spark, dir)
    // three arrival files, each holding every user's events for a
    // contiguous time range (per-user nondecreasing across batches —
    // the source contract)
    val bounds = ev.select(unix_micros(col("ts")).as("t"))
      .agg(min("t").as("lo"), max("t").as("hi")).collect().head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val step = (hi - lo) / 3 + 1
    (0 until 3).foreach { i =>
      ev.filter(((unix_micros(col("ts")) - lo) / step).cast("int") === i)
        .coalesce(1).write.parquet(f"$src/$i%02d.parquet")
    }
    val stream = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamEventPaths.trigrams(stream.toDF())
      .toDF("path")
      .writeStream.format("memory").queryName("spaths2")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("spaths2")
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val batch = SparkEntry.queries("q344_event_paths")(spark, dir)
      .select("path", "n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(streamed === batch, "drain == batch top-20 paths")
  }
}
