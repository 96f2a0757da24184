package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

case class UserAgg(n: Long, maxTs: Timestamp)

/** Structured-Streaming forms of the windowed aggregations (§2.9):
  * the streaming plan with watermarks must produce exactly the batch
  * result once the stream drains, and custom per-key state via
  * mapGroupsWithState must match a batch aggregate.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("watermarked tumbling window over a drained stream == batch q17") {
    val batchEvents = Tables.events(spark, dir)
    // stage the events as a parquet stream source (same schema)
    val src = Files.createTempDirectory("stream_src").toString
    batchEvents.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(batchEvents.schema).parquet(src)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("event_type"), col("n"))
    val q = stream.writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("tumbling")
      .select(col("day"), col("event_type"), col("n"))
    val batch = batchEvents
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("event_type"), col("n"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("watermarked session window over a drained stream == batch q18") {
    val batchEvents = Tables.events(spark, dir)
    val src = Files.createTempDirectory("stream_src_sess").toString
    batchEvents.write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(batchEvents.schema).parquet(src)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start"), col("n_events"))
    val q = stream.writeStream.format("memory").queryName("sessioned")
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("sessioned")
    val batch = batchEvents
      .groupBy(session_window(col("ts"), "30 minutes").as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("start"), col("n_events"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
    assert(batch.except(streamed).count() === 0L)
  }

  test("mapGroupsWithState running per-user stats == batch aggregate") {
    val batchEvents = Tables.events(spark, dir)
    val src = Files.createTempDirectory("stream_src2").toString
    batchEvents.write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(batchEvents.schema).parquet(src)
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp)],
         state: GroupState[UserAgg]) =>
          val prev = state.getOption.getOrElse(UserAgg(0L, new Timestamp(0)))
          val it = rows.toSeq
          val next = UserAgg(prev.n + it.size,
            (it.map(_._2) :+ prev.maxTs).max(Ordering.by((t: Timestamp) => t.getTime)))
          state.update(next)
          (user, next.n, next.maxTs)
      }
      .toDF("user_id", "n", "max_ts")
    val q = stream.writeStream.format("memory").queryName("peruser")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // last update per user == batch counts
    val streamed = spark.table("peruser")
      .groupBy("user_id").agg(max(col("n")).as("n"), max("max_ts").as("max_ts"))
    val batch = batchEvents.groupBy(col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n"), max("ts").as("max_ts"))
    assert(streamed.count() === batch.count())
    assert(streamed.except(batch).count() === 0L)
  }
}
