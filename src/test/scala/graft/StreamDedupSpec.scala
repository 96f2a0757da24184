package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Cross-batch streaming dedup: a content seen in batch 1 must not be
  * re-emitted by batch 2, and the drained stream must equal the batch
  * exact-dedup operator.
  */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming first-seen dedup across micro-batches == batch exact dedup") {
    val src = Files.createTempDirectory("sdedup").toString
    // batch 1: contents A, B; batch 2: B again (new id), C
    Seq((1L, "alpha text"), (2L, "beta text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    val stream1 = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    // stage batch 2 before starting so AvailableNow drains both files
    Seq((3L, "beta text"), (4L, "gamma text"))
      .toDF("doc_id", "text").write.parquet(s"$src/b2.parquet")
    val q = StreamDedup.firstSeen(stream1.toDF(), "doc_id", "text")
      .toDF("content_hash", "canonical_id")
      .writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sdedup")
      .as[(String, Long)].collect().toMap
    // one row per distinct content; "beta text" attributed to its
    // first-seen id regardless of which batch carried which file
    val batch = Seq((1L, "alpha text"), (2L, "beta text"),
        (3L, "beta text"), (4L, "gamma text"))
      .toDF("doc_id", "text")
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min("doc_id").as("canonical_id"))
      .as[(String, Long)].collect().toMap
    // b1 lands before b2 (file mtime order), so "beta text" must be
    // attributed to id 2, not re-emitted for id 3
    assert(got === batch)
  }
}
