package graft

import graft.ops.ArtifactStore
import graft.streaming.StreamTokenCounts
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The incremental count store: the FOLDED view is slicing-invariant
  * (drain == batch, exactly — addition commutes), replay is a no-op,
  * sidecars reproduce the scan fingerprint, and compaction preserves
  * the fold while honestly CHANGING the fingerprint (rows merged =
  * new content for downstream addresses).
  */
class StreamTokenCountsSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[(Long, String, String)] = Seq(
    (0L, "web", "the quick brown fox"),
    (1L, "web", "the lazy dog"),
    (2L, "web", "quick quick fox"),
    (3L, "book", "the fox and the dog"),
    (4L, "book", "a dog a fox a bird"),
    (5L, "wiki", "bird song"),
    (6L, "wiki", ""),            // zero-token doc
    (7L, "wiki", "the the the"))

  private def df(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")

  private def freshStore(): String =
    Files.createTempDirectory("stc").toString + "/c"

  private def fold(store: String): Map[(String, String), Long] =
    StreamTokenCounts.counts(spark, store)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap

  private val truth: Map[(String, String), Long] = docs
    .flatMap { case (_, s, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (s, tok)) }
    .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("drain == batch EXACTLY: any slicing of the corpus folds to " +
    "the same counts (addition commutes), and replay is a no-op") {
    // one-shot
    val s1 = freshStore()
    StreamTokenCounts.applyBatch(df(docs), 0L, "source", "text", s1)
    assert(fold(s1) === truth)
    // three interleaved slices
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamTokenCounts.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "source", "text", s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    // replay of an applied batch changes nothing (meta gate)
    StreamTokenCounts.applyBatch(df(docs.take(2)), 1L, "source", "text", s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    // a null-text poison row drops; a later batch still applies
    StreamTokenCounts.applyBatch(
      Seq((9L, "web", null.asInstanceOf[String]), (10L, "web", "fox"))
        .toDF("doc_id", "source", "text"),
      3L, "source", "text", s3)
    assert(fold(s3) === (truth + (("web", "fox") ->
      (truth(("web", "fox")) + 1L))))
  }

  test("sidecar fold == scan fingerprint; compaction preserves the " +
    "FOLD, collapses the dirs, changes the fingerprint (merged rows " +
    "are new content), and recovers from a crash between renames") {
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamTokenCounts.applyBatch(df(docs.filter(_._1 % 4 == b)),
        b.toLong, "source", "text", store)
    }
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamTokenCounts.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamTokenCounts.parts(spark, store), s"stc:$store:a"),
      "sidecar fold must equal the scan fingerprint")
    val foldBefore = fold(store)
    assert(foldBefore === truth)

    assert(StreamTokenCounts.compact(spark, store), "must rewrite")
    def bidDirs(): Int = {
      val d = java.nio.file.Paths.get(s"$store/parts")
      val s = Files.list(d)
      try s.filter(_.getFileName.toString.startsWith("bid=")).count().toInt
      finally s.close()
    }
    assert(bidDirs() === 1, "compaction must collapse to one dir")
    assert(fold(store) === foldBefore,
      "compaction must preserve the folded view exactly")
    ArtifactStore.clearFingerprintMemo()
    val fpAfter = StreamTokenCounts.storeFingerprint(store)
    assert(fpAfter !== fpBefore,
      "merged rows are NEW content — the fingerprint must change")
    assert(fpAfter === ArtifactStore.fingerprint(
      StreamTokenCounts.parts(spark, store), s"stc:$store:b"),
      "post-compaction sidecar must hash the rows as written")

    // crash between the two renames: parts at .compact.old only
    val pdir = java.nio.file.Paths.get(s"$store/parts")
    java.nio.file.Files.move(pdir,
      java.nio.file.Paths.get(s"$store/parts.compact.old"))
    assert(fold(store) === foldBefore,
      "recovery must restore the pre-rename store")

    // inserts after compaction keep folding
    StreamTokenCounts.applyBatch(
      Seq((11L, "web", "fox fox")).toDF("doc_id", "source", "text"),
      9L, "source", "text", store)
    assert(fold(store) === (foldBefore + (("web", "fox") ->
      (foldBefore(("web", "fox")) + 2L))))
  }

  test("streaming wiring drains the same store the batch API builds, " +
    "with auto-compaction bounding the partition count") {
    val src = Files.createTempDirectory("stc-src").toString
    val store = freshStore()
    (0 until 4).foreach { j =>
      df(docs.filter(_._1 % 4 == j)).coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, source STRING, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamTokenCounts.run(stream, "source", "text", store,
      Trigger.AvailableNow(), compactAfterBatches = 2).start()
    q.awaitTermination()
    assert(fold(store) === truth, "drained fold must equal the truth")
    val d = java.nio.file.Paths.get(s"$store/parts")
    val s = Files.list(d)
    val dirs = try s.filter(_.getFileName.toString.startsWith("bid="))
      .count().toInt finally s.close()
    assert(dirs <= 3, s"auto-compaction must bound the dirs, got $dirs")
  }
}
