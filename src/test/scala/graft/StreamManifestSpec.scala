package graft

import graft.streaming.StreamManifest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Streaming shard manifests: the drained stream's final per-shard
  * rows must equal the batch aggregation, and a replayed batch must be
  * a no-op (the xor checksum is NOT idempotent on its own — the
  * first-seen gate is what makes the stream replay-proof).
  */
class StreamManifestSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0 until 40).map(i => (i.toLong, s"tok$i word$i end"))

  private def batchManifest(rows: Seq[(Long, String)], nShards: Int) =
    rows.toDF("doc_id", "text")
      .select(
        pmod(graft.functions.TextAnalysis.tokenHash(
          concat(lit("shard:"), col("doc_id").cast("string"))),
          lit(nShards.toLong)).cast("long").as("shard"),
        graft.ops.Sketches.hash60(col("text")).as("h60"),
        size(graft.functions.TextAnalysis.tokens(col("text")))
          .cast("long").as("n"))
      .groupBy("shard")
      .agg(count(lit(1)).as("nd"), sum("n").as("nt"),
        expr("bit_xor(h60)").as("cs"))
      .as[(Long, Long, Long, Long)].collect().toSet

  private def drainFinal(src: String): Set[(Long, Long, Long, Long)] = {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val name = s"smanifest${src.hashCode.abs}"
    val q = StreamManifest.manifests(stream.toDF(), "doc_id", "text")
      .toDF("shard", "nd", "nt", "cs")
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the latest emission per shard is the manifest: counts are
    // monotone, so max nd wins
    spark.table(name)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }.toSet
  }

  test("drained streaming manifests == batch aggregation over all batches") {
    val src = Files.createTempDirectory("smanifest1").toString
    docs.take(25).toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    docs.drop(25).toDF("doc_id", "text").write.parquet(s"$src/b2.parquet")
    assert(drainFinal(src) === batchManifest(docs, 16))
  }

  test("replayed documents are a no-op: checksum does not toggle") {
    val src = Files.createTempDirectory("smanifest2").toString
    docs.take(25).toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    // batch 2 replays 10 of batch 1's docs verbatim plus the rest
    (docs.slice(5, 15) ++ docs.drop(25))
      .toDF("doc_id", "text").write.parquet(s"$src/b2.parquet")
    assert(drainFinal(src) === batchManifest(docs, 16))
  }

  test("distinct docs with duplicate texts all count (batch q122 " +
    "semantics); replay of one of them is still a no-op") {
    // 12 doc_ids share only 3 texts -> duplicates land in the same
    // AND different shards; the gate must key on (doc_id, content),
    // not content alone
    val dup = (100 until 112).map(i => (i.toLong, s"same text ${i % 3}"))
    val all = docs.take(10) ++ dup
    val src = Files.createTempDirectory("smanifest3").toString
    all.take(16).toDF("doc_id", "text").write.parquet(s"$src/b1.parquet")
    // batch 2: the rest, plus verbatim replays of 4 duplicate-text docs
    (all.drop(16) ++ dup.take(4))
      .toDF("doc_id", "text").write.parquet(s"$src/b2.parquet")
    assert(drainFinal(src) === batchManifest(all, 16))
  }
}
