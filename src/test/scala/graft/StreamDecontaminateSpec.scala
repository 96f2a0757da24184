package graft

import graft.functions.TextAnalysis._
import graft.streaming.StreamDecontaminate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Streaming decontamination must equal the batch probe (q93's
  * semantics) — same bench set, same flags, regardless of micro-batch
  * boundaries (the probe is stateless by design).
  */
class StreamDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("streamed flags == batch q93 flags, across two micro-batches") {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 31 === 0)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(gramHashesPositional(col("toks"), 5).as("gh"))
      .select(explode(winnowFingerprints(col("gh"), 4)).as("fp"))
      .distinct().localCheckpoint()
    val probeDocs = docs.filter(col("doc_id") % 31 =!= 0)
      .select(col("doc_id"), col("text"))

    val src = Files.createTempDirectory("sdecon").toString
    probeDocs.filter(col("doc_id") % 2 === 0).write.parquet(s"$src/b1.parquet")
    Thread.sleep(1100) // parquet mtimes are second-granular; force 2 batches
    probeDocs.filter(col("doc_id") % 2 =!= 0).write.parquet(s"$src/b2.parquet")

    val collected = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Boolean)]
    val q = StreamDecontaminate.run(
      spark.readStream.schema("doc_id LONG, text STRING")
        .option("maxFilesPerTrigger", 1).parquet(s"$src/*.parquet"),
      "doc_id", "text", bench, Trigger.AvailableNow(),
      (flagged, _) => collected.synchronized {
        collected ++= flagged.as[(Long, Long, Boolean)].collect()
      }).start()
    q.awaitTermination()

    val batch = StreamDecontaminate
      .flag(probeDocs, "doc_id", "text", bench)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    val got = collected.sortBy(_._1).toSeq
    assert(got == batch)
    assert(got.exists(_._3), "fixture should contain contaminated docs")
    assert(got.exists(!_._3))
  }
}
