package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files
import java.sql.Timestamp

/** Pins the watermark late-data contract for windowed aggregation —
  * the §2.9 semantics every streaming twin implicitly relies on,
  * asserted with the PRECISE rule (probed, not assumed):
  *
  *  - a late row is filtered iff its WINDOW's end ≤ the watermark as
  *    of the PREVIOUS batch (the pre-advance value — Spark applies
  *    the input filter before folding the batch's own max event time
  *    into the watermark);
  *  - rows above that line still merge, even when the CURRENT batch's
  *    advanced watermark will finalize their window in the same
  *    commit;
  *  - dropping below the line is what prevents a finalized window
  *    from re-emitting under append mode (exactly-one-result per
  *    window).
  *
  * Note the documented best-effort caveat goes the other way: while a
  * window's state is still live, an under-watermark straggler MAY be
  * absorbed; this fixture advances the watermark past the window end
  * in an earlier batch so the drop is the guaranteed branch.
  */
class StreamLateDataSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int) =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("post-eviction late row dropped; window-end-above-prior-" +
    "watermark straggler still merges into its final result") {
    val src = Files.createTempDirectory("slate").toString
    // 10-min tumbling windows, 15-min watermark. Batch timeline:
    //  b1: 10:41, 10:42, 11:00            (watermark after: 10:45)
    //  b2: 11:30                          (watermark after: 11:15 —
    //      finalizes [10:00,10:10) if it existed, and [10:40,10:50)
    //      is still OPEN going into b3's input filter, whose line is
    //      b2's PRE-advance watermark 10:45)
    //  b3: 10:05 (window end 10:10 ≤ 10:45 → DROPPED — its window
    //      can never appear), 10:44 (window end 10:50 > 10:45 →
    //      MERGES, and [10:40,10:50) finalizes at 3 in this commit)
    val b1 = Seq((1L, ts(10, 41)), (2L, ts(10, 42)), (3L, ts(11, 0)))
    val b2 = Seq((6L, ts(11, 30)))
    val b3 = Seq((5L, ts(10, 5)), (7L, ts(10, 44)))
    b1.toDF("event_id", "ts").coalesce(1).write.parquet(s"$src/0a.parquet")
    Thread.sleep(1100) // distinct mtimes pin the file-arrival order
    b2.toDF("event_id", "ts").coalesce(1).write.parquet(s"$src/0b.parquet")
    Thread.sleep(1100)
    b3.toDF("event_id", "ts").coalesce(1).write.parquet(s"$src/0c.parquet")
    val stream = spark.readStream.schema("event_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = stream.withWatermark("ts", "15 minutes")
      .groupBy(window(col("ts"), "10 minutes")).agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))
      .writeStream.format("memory").queryName("slate")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("slate").as[(String, Long)].collect().toMap
    assert(!got.contains("2024-01-01 10:00:00"),
      s"dropped-branch late row resurrected its window: $got")
    assert(got.get("2024-01-01 10:40:00").contains(3L),
      s"above-the-line straggler lost from its final window: $got")
    assert(got.get("2024-01-01 11:00:00").contains(1L), s"bad: $got")
    // each emitted window appears exactly once (append-mode contract)
    assert(got.size === spark.table("slate").count())
  }
}
