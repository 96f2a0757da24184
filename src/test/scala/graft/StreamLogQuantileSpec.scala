package graft

import graft.streaming.StreamLogQuantile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Drain == batch for the streaming log-bucket quantile sketch: after
  * consuming the whole event table across three micro-batches, the
  * LAST emitted estimate per type equals q264's batch sketch columns
  * on the same rows — the mergeability claim, exercised through the
  * actual state-store path.
  */
class StreamLogQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("drained stream estimates == q264 batch sketch estimates") {
    val src = Files.createTempDirectory("slq-src").toString
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    (0 until 3).foreach { j =>
      ev.filter(pmod(col("event_id"), lit(3)) === j)
        .select("event_type", "value")
        .coalesce(1).write.parquet(s"$src/b$j.parquet")
    }
    val out = Files.createTempDirectory("slq-out").toString
    val stream = spark.readStream
      .schema("event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamLogQuantile.quantiles(stream)
      .toDF("event_type", "n", "p50", "p95", "p99")
      .writeStream.trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", s"$out-ck")
      .start()
    q.awaitTermination()

    // last emit per type (emits are cumulative; the final one has seen
    // every batch). maxFilesPerTrigger=1 over 3 files → multiple emits
    // per type; pick the one with the largest n (strictly increasing).
    val fin = spark.read.parquet(out)
      .groupBy("event_type")
      .agg(max(struct(col("n"), col("p50"), col("p95"), col("p99")))
        .as("s"))
      .select(col("event_type"), col("s.n"), col("s.p50"),
        col("s.p95"), col("s.p99"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

    val batch = SparkEntry.queries("q264_logbucket_quantiles")(spark, dir)
      .select("event_type", "n", "p50_est_micro", "p95_est_micro",
        "p99_est_micro")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap

    assert(fin.keySet === batch.keySet)
    batch.foreach { case (t, exp) =>
      assert(fin(t) === exp, s"type $t: stream ${fin(t)} != batch $exp")
    }
  }

  test("bucket arithmetic is lockstep with the SQL definition and " +
    "rep stays within the bucket's value range") {
    // exactness below 2^4, containment + ≤2^-5 relative width above
    for (vm <- 1L to 2000L) {
      val (e, sb) = StreamLogQuantile.bucket(vm)
      val r = StreamLogQuantile.rep(e, sb)
      if (vm < 16) assert(r === vm, s"vm=$vm not exact")
      else {
        val lo = (16L + sb) << (e - 4)
        val hi = lo + (1L << (e - 4)) - 1
        assert(vm >= lo && vm <= hi, s"vm=$vm outside [$lo,$hi]")
        assert(r >= lo && r <= hi, s"rep=$r outside [$lo,$hi]")
        assert(hi - lo + 1 <= math.max(vm / 16, 1),
          s"bucket width ${hi - lo + 1} too wide at vm=$vm")
      }
    }
    assert(StreamLogQuantile.bucket(0L) === (-1, 0))
    assert(StreamLogQuantile.bucket(-5L) === (-1, 0))
    assert(StreamLogQuantile.rep(-1, 0) === 0L)
  }
}
