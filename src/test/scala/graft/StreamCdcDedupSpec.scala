package graft

import graft.ops.CdcChunks
import graft.streaming.StreamCdcDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import java.nio.file.Files

/** Streaming chunk dedup: a re-crawl with one edited neighborhood
  * ships only its changed chunks; the drained stream equals the batch
  * chunk-dedup canonicalization (same hashes, same min-doc
  * attribution under doc-ordered arrival).
  */
class StreamCdcDedupSpec extends SparkSpec {
  import spark.implicits._

  private val toksA = (0 until 300).map(i => s"w${(i * 7919) % 9973}")
  private val textA = toksA.mkString(" ")
  // re-crawl: one token replaced at position 150 — only that
  // neighborhood's chunks differ
  private val textB =
    ((toksA.take(150) :+ "EDITED") ++ toksA.drop(151)).mkString(" ")

  test("stream drain == batch chunk canonicalization; re-crawl ships " +
    "only its changed chunks") {
    val src = Files.createTempDirectory("scdc").toString
    Seq((1L, textA)).toDF("doc_id", "text")
      .write.parquet(s"$src/b1.parquet")
    Seq((2L, textB)).toDF("doc_id", "text")
      .write.parquet(s"$src/b2.parquet")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamCdcDedup.firstSeenChunks(stream, "doc_id", "text")
      .toDF("ch", "chunk_len", "first_doc")
      .writeStream.format("memory").queryName("scdc")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("scdc")
      .as[(Long, Long, Long)].collect().toSet
    // batch reference: distinct chunk contents, min-doc attribution
    val batch = CdcChunks.chunks(
        Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
        "doc_id", "text")
      .groupBy("ch")
      .agg(min("chunk_len").as("chunk_len"), min("doc_id").as("first_doc"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === batch)
    // the edit shipped SOME new chunks, but far fewer than a full
    // re-chunk: doc 2 contributes only its changed neighborhood
    val fromDoc2 = got.count(_._3 == 2L)
    assert(fromDoc2 >= 1 && fromDoc2 <= 3,
      s"edit should ship 1-3 chunks, shipped $fromDoc2")
  }
}
