package graft

import graft.ops.Sketches
import graft.streaming.StreamSketch
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Cross-batch streaming HLL: the drained register state over any
  * split of the stream must equal the batch sketch over the union, and
  * the Scala estimate twin must be bit-identical to the column
  * expression q111 runs.
  */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private def elems(lang: String, n: Int, salt: String) =
    (0 until n).map(i => (lang, s"$salt-$lang-$i"))

  test("streaming HLL across micro-batches == batch registers on the union") {
    val src = Files.createTempDirectory("shll").toString
    val b1 = elems("en", 400, "a") ++ elems("de", 50, "a")
    // batch 2 overlaps batch 1 (idempotent merge) and adds new elements
    val b2 = elems("en", 300, "a") ++ elems("en", 200, "b") ++
      elems("de", 70, "b")
    b1.toDF("lang", "g").write.parquet(s"$src/b1.parquet")
    b2.toDF("lang", "g").write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("lang STRING, g STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamSketch.hllRunningEstimate(stream.toDF(), "lang", "g")
      .toDF("lang", "est_milli", "n_seen")
      .writeStream.format("memory").queryName("shll")
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // update mode re-emits per batch: the LAST row per lang is final
    val got = spark.table("shll")
      .groupBy("lang").agg(last("est_milli").as("est_milli"))
      .as[(String, Long)].collect().toMap

    val batch = (b1 ++ b2).toDF("lang", "g")
      .select(col("lang"), Sketches.hash60(col("g")).as("h"))
      .select(col("lang"), Sketches.hllBucket(col("h")).as("bucket"),
        Sketches.hllRho(col("h")).as("rho"))
      .groupBy("lang", "bucket").agg(max("rho").as("r"))
      .groupBy("lang")
      .agg(sort_array(collect_list(struct(col("bucket"), col("r"))))
        .as("regs"))
      .select(col("lang"), Sketches.hllEstimateMilli(col("regs")))
      .as[(String, Long)].collect().toMap

    assert(got === batch,
      "stream-drained estimates must equal the batch sketch")
  }

  test("Scala estimate twin == column expression, including both branches") {
    // dense case (raw branch) and sparse case (linear counting)
    Seq(5000, 20).foreach { n =>
      val keys = (0 until n).map(i => s"tw-$i").toDF("g")
      val colEst = keys
        .select(Sketches.hash60(col("g")).as("h"))
        .select(Sketches.hllBucket(col("h")).as("bucket"),
          Sketches.hllRho(col("h")).as("rho"))
        .groupBy("bucket").agg(max("rho").as("r"))
        .agg(sort_array(collect_list(struct(col("bucket"), col("r"))))
          .as("regs"))
        .select(Sketches.hllEstimateMilli(col("regs")))
        .as[Long].head()
      val regs = new Array[Int](Sketches.HllM)
      keys.select(Sketches.hash60(col("g")).as("h"))
        .select(Sketches.hllBucket(col("h")), Sketches.hllRho(col("h")))
        .as[(Long, Long)].collect()
        .foreach { case (b, r) =>
          if (r > regs(b.toInt)) regs(b.toInt) = r.toInt
        }
      assert(Sketches.hllEstimateMilliScala(regs) === colEst,
        s"twin diverged at n=$n")
    }
  }
}
