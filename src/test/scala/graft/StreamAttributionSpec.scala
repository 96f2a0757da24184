package graft

import graft.streaming.StreamAttribution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Drained StreamAttribution == q302's first-touch model on the same
  * events — state carries across batch boundaries, the same-timestamp
  * tie follows the (ts, event_id) window rule, and a late EARLIER
  * touch corrects the state (min-merge) for subsequent purchases.
  */
class StreamAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("drain over ts-ordered batches == batch q302 first-touch " +
    "channel counts") {
    val src = Files.createTempDirectory("sattr").toString
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_id").cast("long").as("eid"), col("event_type"))
    // three ts-ordered splits (the follower contract every streaming
    // twin shares)
    val cuts = ev.selectExpr(
      "percentile_approx(tus, array(0.33, 0.66), 10000) as c")
      .head().getSeq[Long](0)
    Seq(
      ev.filter(col("tus") <= cuts(0)),
      ev.filter(col("tus") > cuts(0) && col("tus") <= cuts(1)),
      ev.filter(col("tus") > cuts(1))
    ).zipWithIndex.foreach { case (b, i) =>
      b.coalesce(1).write.parquet(s"$src/b$i.parquet")
    }
    val stream = spark.readStream
      .schema("user_id LONG, tus LONG, eid LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamAttribution.attribute(stream.toDF())
      .toDF("user_id", "eid", "first_ty")
      .writeStream.format("memory").queryName("sattr")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sattr")
      .groupBy("first_ty").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap

    val expect = SparkEntry.queries("q302_attribution_models")(
      spark, dir)
      .filter(col("model") === "first_touch")
      .select(col("channel"), col("n"))
      .as[(String, Long)].collect().toMap
    assert(got === expect)
    assert(got.values.sum ===
      Tables.events(spark, dir)
        .filter(col("event_type") === "purchase").count())
  }

  test("tie rule and min-merge: same-ts touch visible iff its " +
    "event_id is smaller; a late earlier touch corrects later " +
    "purchases but never the already-emitted ones") {
    val src = Files.createTempDirectory("sattr2").toString
    // batch 1: u1 purchase@10/e5 with touch click@10/e4 (visible: same
    //          ts, smaller eid) and touch view@10/e9 (not visible and
    //          LOSES the state min to e4)
    Seq((1L, 10L, 4L, "click"), (1L, 10L, 5L, "purchase"),
      (1L, 10L, 9L, "view"))
      .toDF("user_id", "tus", "eid", "event_type")
      .coalesce(1).write.parquet(s"$src/b0.parquet")
    // batch 2: a LATE touch view@3/e1 (earlier than everything) then
    //          purchase@20/e6 — credited to the corrected min (view),
    //          while batch 1's purchase stays credited to click
    Seq((1L, 3L, 1L, "view"), (1L, 20L, 6L, "purchase"))
      .toDF("user_id", "tus", "eid", "event_type")
      .coalesce(1).write.parquet(s"$src/b1.parquet")
    val stream = spark.readStream
      .schema("user_id LONG, tus LONG, eid LONG, event_type STRING")
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*.parquet")
    val q = StreamAttribution.attribute(stream.toDF())
      .toDF("user_id", "eid", "first_ty")
      .writeStream.format("memory").queryName("sattr2")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sattr2")
      .as[(Long, Long, String)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got === Map(5L -> "click", 6L -> "view"))
  }
}
