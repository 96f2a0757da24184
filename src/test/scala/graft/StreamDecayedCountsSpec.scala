package graft

import graft.streaming.StreamDecayedCounts
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Drained decayed counters == q348's batch table; horizon eviction
  * bounds the state; replayed batch ids are skipped (additive state).
  */
class StreamDecayedCountsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("drained store decays to the batch q348 table exactly") {
    val src = Files.createTempDirectory("sdec-src").toString
    val ev = Tables.events(spark, dir)
    (0 until 3).foreach { j =>
      ev.filter(pmod(col("event_id"), lit(3)) === j)
        .coalesce(1).write.parquet(f"$src/b$j.parquet")
    }
    val store = Files.createTempDirectory("sdec").toString + "/d.txt"
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamDecayedCounts.run(stream.toDF(), store,
      Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = StreamDecayedCounts.decayed(store)
    val want = SparkEntry.queries("q348_decayed_counts")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === want, "drain == batch decayed counters")
  }

  test("horizon eviction bounds the state; replay gate skips a " +
    "re-delivered batch") {
    import spark.implicits._
    val store = Files.createTempDirectory("sdec2").toString + "/d.txt"
    def day(d: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00")
    val b0 = Seq((1L, day(0), 1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .localCheckpoint()
    StreamDecayedCounts.applyBatch(b0, 0L, store)
    // 40 days later: the day-0 bucket falls past the horizon
    val b1 = Seq((2L, java.sql.Timestamp.valueOf("2024-02-10 10:00:00"),
        1L, "a", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    StreamDecayedCounts.applyBatch(b1, 1L, store)
    val (_, m) = StreamDecayedCounts.readStore(store)
    assert(m.size === 1, "past-horizon buckets must evict")
    assert(StreamDecayedCounts.decayed(store)("a") === 1000L)
    // replayed id: no-op
    StreamDecayedCounts.applyBatch(b1, 1L, store)
    assert(StreamDecayedCounts.decayed(store)("a") === 1000L,
      "gated replay must be a no-op")
    StreamDecayedCounts.applyBatch(b1, 1L, store, gate = false)
    assert(StreamDecayedCounts.decayed(store)("a") === 2000L,
      "ungated replay double-adds (the hazard the gate prevents)")
  }
}
