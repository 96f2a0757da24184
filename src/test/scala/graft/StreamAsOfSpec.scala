package graft

import graft.ops.AsOf
import graft.streaming.StreamAsOf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Drained StreamAsOf == batch AsOf.asofJoin on the same rows —
  * including a reference update consumed by a probe in a LATER
  * micro-batch (carried state), the equal-time tie (reference
  * visible), and the no-prior-reference sentinel.
  */
class StreamAsOfSpec extends SparkSpec {
  import spark.implicits._

  test("drain == batch as-of join; state carries across batches") {
    val src = Files.createTempDirectory("sasof").toString
    // batch 1: k1 ref@10=100, probe@10 (tie -> 100), probe@15 (-> 100)
    //          k2 probe@5 (no ref yet -> sentinel)
    val b1 = Seq(
      ("k1", 10L, 0, 100L), ("k1", 10L, 1, -1L), ("k1", 15L, 1, -1L),
      ("k2", 5L, 1, -1L))
    // batch 2: k1 ref@20=200, probe@25 (-> 200, ref in SAME batch),
    //          k2 probe@30 with k2 ref@8=7 arriving batch 2 BEFORE it
    //          (per-key order holds: 8 <= 30), k1 probe@18 (-> 100:
    //          the batch sorts by ts so the @20 ref is not visible)
    val b2 = Seq(
      ("k2", 8L, 0, 7L), ("k1", 18L, 1, -1L), ("k1", 20L, 0, 200L),
    ("k1", 25L, 1, -1L), ("k2", 30L, 1, -1L))
    b1.toDF("key", "ts", "side", "value")
      .coalesce(1).write.parquet(s"$src/0a.parquet")
    b2.toDF("key", "ts", "side", "value")
      .coalesce(1).write.parquet(s"$src/0b.parquet")
    val stream = spark.readStream
      .schema("key STRING, ts LONG, side INT, value LONG")
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamAsOf.enrich(stream.toDF())
      .toDF("key", "ts", "asof_value")
      .writeStream.format("memory").queryName("sasof")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sasof")
      .as[(String, Long, Long)].collect().toSet

    // batch truth via ops/AsOf on the same rows
    val all = (b1 ++ b2).toDF("key", "ts", "side", "value")
    val probes = all.filter(col("side") === 1).select("key", "ts")
    val refs = all.filter(col("side") === 0).select("key", "ts", "value")
    val expect = AsOf.asofJoin(probes, refs, Seq("key"), "ts",
        Seq("value"))
      .select(col("key"), col("ts"),
        coalesce(col("asof_value"), lit(-1L)).as("asof_value"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === expect)
    // the planted shapes really occurred
    assert(got.contains(("k1", 10L, 100L)), "equal-time tie broken")
    assert(got.contains(("k2", 5L, -1L)), "sentinel missing")
    assert(got.contains(("k2", 30L, 7L)), "cross-batch state missing")
    assert(got.contains(("k1", 18L, 100L)), "future ref leaked backward")
  }
}
