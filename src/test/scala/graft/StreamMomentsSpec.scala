package graft

import graft.ops.Moments
import graft.streaming.StreamMoments
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Drain == batch for the streaming moment store: after three
  * micro-batches the merged vector equals the one-pass batch
  * aggregation over the same rows EXACTLY (integer merge — no
  * tolerance), so everything derived from moments (correlation, PCA)
  * is identical whether trained in batch or continuously.
  */
class StreamMomentsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val d = 64

  test("drained moment store == one-pass batch moments, exactly") {
    val src = Files.createTempDirectory("smom-src").toString
    val emb = Tables.embeddings(spark, dir)
    (0 until 3).foreach { j =>
      emb.filter(pmod(col("vec_id"), lit(3)) === j)
        .select("embedding")
        .coalesce(1).write.parquet(s"$src/b$j.parquet")
    }
    val store = Files.createTempDirectory("smom-store").toString + "/m.txt"
    val stream = spark.readStream
      .schema("embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamMoments.run(stream, "embedding", d, store,
      Trigger.AvailableNow()).start()
    q.awaitTermination()

    val (applied, got) = StreamMoments.readStore(store, d)
    val exp = Moments.secondMomentsMilli(emb, "embedding", d)
    assert(applied === 2L, "three batches -> highest applied id is 2")
    assert(got.toSeq === exp.toSeq)
  }

  test("batch-id gate: replaying the last micro-batch is a no-op with " +
    "the gate, double-adds without it (addition is not idempotent)") {
    val emb = Tables.embeddings(spark, dir).select("embedding").limit(30)
      .localCheckpoint()
    val store = Files.createTempDirectory("smom-gate").toString + "/m.txt"
    StreamMoments.applyBatch(emb, 0L, "embedding", d, store, gate = true)
    val (_, once) = StreamMoments.readStore(store, d)
    // a restart re-delivers batch 0: the gate must skip it
    StreamMoments.applyBatch(emb, 0L, "embedding", d, store, gate = true)
    val (applied, gated) = StreamMoments.readStore(store, d)
    assert(gated.toSeq === once.toSeq, "gated replay must be a no-op")
    assert(applied === 0L)
    // without the gate the same replay double-adds — the hazard the
    // gate exists for
    StreamMoments.applyBatch(emb, 0L, "embedding", d, store, gate = false)
    val (_, ungated) = StreamMoments.readStore(store, d)
    assert(ungated.toSeq !== once.toSeq, "ungated replay double-adds")
    assert(ungated.toSeq === once.map(_ * 2).toSeq)
  }

  test("a store written for a different dimension fails fast instead " +
    "of mis-indexing") {
    val emb = Tables.embeddings(spark, dir).select("embedding").limit(10)
    val store = Files.createTempDirectory("smom-dim").toString + "/m.txt"
    StreamMoments.applyBatch(emb, 0L, "embedding", d, store, gate = true)
    val ex = intercept[IllegalArgumentException] {
      StreamMoments.readStore(store, d + 1)
    }
    assert(ex.getMessage.contains("different dimension"))
  }
}
