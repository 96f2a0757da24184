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

    val got = StreamMoments.readStore(store, d)
    val exp = Moments.secondMomentsMilli(emb, "embedding", d)
    assert(got.toSeq === exp.toSeq)
  }
}
