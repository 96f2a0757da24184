package graft

import graft.ops.{ArtifactStore, Decontaminate}
import graft.streaming.StreamWinnowIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The maintained winnow index: the fold is slicing-invariant EXACTLY
  * (fingerprints are per-doc — the union fold cannot see arrival
  * order), replay is a no-op, sidecars reproduce the scan fingerprint,
  * compaction is a REPACK (rows AND fingerprint invariant — the dual
  * of the count store's merge-changes-rows trade), and the maintained
  * index serves part-addressed through the ArtifactStore.
  */
class StreamWinnowIndexSpec extends SparkSpec {
  import spark.implicits._

  private val docs: Seq[(Long, String)] = Seq(
    (0L, "the quick brown fox jumps over the lazy dog tonight"),
    (1L, "a completely different sentence with many unusual words here"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // dup of 0
    (3L, "short doc"),                                  // < k tokens: no fps
    (4L, "one two three four five six seven eight nine ten"),
    (5L, "pack my box with five dozen liquor jugs right now please"),
    (6L, "the quick brown fox naps under the lazy dog tonight"))

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def freshStore(): String =
    Files.createTempDirectory("swi").toString + "/w"

  private def fold(store: String): Set[(Long, Long)] =
    StreamWinnowIndex.fps(spark, store)
      .as[(Long, Long)].collect().toSet

  private def rows(store: String): Seq[(Long, Long)] =
    StreamWinnowIndex.fps(spark, store)
      .as[(Long, Long)].collect().toSeq

  private lazy val truth: Set[(Long, Long)] =
    Decontaminate.fingerprints(df(docs), "doc_id", "text")
      .as[(Long, Long)].collect().toSet

  test("drain == batch EXACTLY: any slicing folds to the direct " +
    "computation (per-doc rows), sub-k docs contribute nothing, " +
    "replay and null text are no-ops") {
    assert(truth.nonEmpty)
    assert(!truth.exists(_._1 == 3L), "a 2-token doc has no 5-gram")
    assert(truth.filter(_._1 == 0L).map(_._2) ===
      truth.filter(_._1 == 2L).map(_._2),
      "duplicate docs must fingerprint identically")
    // one-shot
    val s1 = freshStore()
    StreamWinnowIndex.applyBatch(df(docs), 0L, "doc_id", "text", s1)
    assert(fold(s1) === truth)
    assert(rows(s1).size === truth.size,
      "per-doc fps are distinct — the fold must not duplicate rows")
    // three interleaved slices
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamWinnowIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    // replay of an applied batch changes nothing (meta gate)
    StreamWinnowIndex.applyBatch(df(docs.take(2)), 1L, "doc_id", "text", s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    // a null-text poison row drops; the batch still commits
    StreamWinnowIndex.applyBatch(
      Seq((9L, null.asInstanceOf[String]),
        (10L, "an appended document with plenty of fresh tokens inside"))
        .toDF("doc_id", "text"),
      3L, "doc_id", "text", s3)
    val appended = Decontaminate.fingerprints(
      Seq((10L, "an appended document with plenty of fresh tokens inside"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(fold(s3) === truth ++ appended)
  }

  test("sidecar fold == scan fingerprint, and compaction is a REPACK: " +
    "rows AND fingerprint invariant, dirs collapse, crash between " +
    "renames recovers") {
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamWinnowIndex.applyBatch(df(docs.filter(_._1 % 4 == b)),
        b.toLong, "doc_id", "text", store)
    }
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamWinnowIndex.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamWinnowIndex.fps(spark, store), s"swi:$store:a"),
      "sidecar fold must equal the scan fingerprint")
    assert(fold(store) === truth)

    assert(StreamWinnowIndex.compact(spark, store), "must rewrite")
    def bidDirs(): Int = {
      val d = java.nio.file.Paths.get(s"$store/parts")
      val s = Files.list(d)
      try s.filter(_.getFileName.toString.startsWith("bid=")).count().toInt
      finally s.close()
    }
    assert(bidDirs() === 1, "compaction must collapse to one dir")
    assert(fold(store) === truth, "compaction moves bytes, never rows")
    ArtifactStore.clearFingerprintMemo()
    assert(StreamWinnowIndex.storeFingerprint(store) === fpBefore,
      "a repack preserves rows, so the fingerprint — the downstream " +
        "artifact address — must be INVARIANT across compaction")

    // crash between the two renames: parts at .compact.old only
    val pdir = java.nio.file.Paths.get(s"$store/parts")
    java.nio.file.Files.move(pdir,
      java.nio.file.Paths.get(s"$store/parts.compact.old"))
    assert(fold(store) === truth,
      "recovery must restore the pre-rename store")

    // inserts after compaction keep folding
    StreamWinnowIndex.applyBatch(
      Seq((11L, "eleven different trailing tokens appended after the compaction step"))
        .toDF("doc_id", "text"), 9L, "doc_id", "text", store)
    assert(fold(store).map(_._1).contains(11L))
  }

  test("the maintained index serves part-addressed through the " +
    "ArtifactStore: served rows == fold, an append rebuilds ONE part, " +
    "a re-serve rebuilds nothing, compaction collapses the part set") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamWinnowIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", store)
    }
    val root = Files.createTempDirectory("swi-art").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val served = StreamWinnowIndex.servedFps(spark, store)
        .as[(Long, Long)].collect().toSet
      assert(served === truth, "served index must equal the fold")
      val plan = StreamWinnowIndex.servedFps(spark, store)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("winnow_maintained_fps"),
        s"serve must read the committed artifact:\n$plan")
      def payloads(): Map[String, String] = {
        def ls(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
          val s = Files.list(p)
          try { val b = Seq.newBuilder[java.nio.file.Path]
            s.iterator().forEachRemaining(c => b += c); b.result() }
          finally s.close()
        }
        val name = java.nio.file.Paths.get(s"$root/winnow_maintained_fps")
        ls(name).flatMap(scope => ls(scope.resolve("parts")))
          .flatMap { part => ls(part).map { fp =>
            part.getFileName.toString ->
              ls(fp).map(_.getFileName.toString)
                .filter(_.startsWith("payload-")).head } }
          .toMap
      }
      val before = payloads()
      assert(before.size === 3, s"one part per batch: ${before.keys}")
      // append: ONE new part; original payload dirs reused verbatim
      StreamWinnowIndex.applyBatch(
        Seq((12L, "twelve appended tokens make one more maintained batch part now"))
          .toDF("doc_id", "text"), 7L, "doc_id", "text", store)
      val served2 = StreamWinnowIndex.servedFps(spark, store)
        .as[(Long, Long)].collect().toSet
      assert(served2.map(_._1).contains(12L), "the append must be visible")
      val after = payloads()
      assert(after.size === 4, s"3 + 1 appended parts: ${after.keys}")
      assert(before.forall { case (k, v) => after(k) == v },
        "original parts must be reused verbatim, not rebuilt")
      // re-serve: pure part-cache hit
      assert(StreamWinnowIndex.servedFps(spark, store)
        .as[(Long, Long)].collect().toSet === served2)
      assert(payloads() === after, "a re-serve must not rebuild parts")
      // compaction: rows invariant; the next committing serve collapses
      // the part set and vacuums the departed batch parts
      assert(StreamWinnowIndex.compact(spark, store), "must rewrite")
      assert(StreamWinnowIndex.servedFps(spark, store)
        .as[(Long, Long)].collect().toSet === served2,
        "compaction moves bytes, never rows")
      assert(payloads().size === 1,
        "departed batch parts must vacuum after the rollup serve")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("streaming wiring drains the same store the batch API builds, " +
    "with auto-compaction bounding the partition count") {
    val src = Files.createTempDirectory("swi-src").toString
    val store = freshStore()
    (0 until 4).foreach { j =>
      df(docs.filter(_._1 % 4 == j)).coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamWinnowIndex.run(stream, "doc_id", "text", store,
      Trigger.AvailableNow(), compactAfterBatches = 2).start()
    q.awaitTermination()
    assert(fold(store) === truth, "drained fold must equal the truth")
    val d = java.nio.file.Paths.get(s"$store/parts")
    val s = Files.list(d)
    val dirs = try s.filter(_.getFileName.toString.startsWith("bid="))
      .count().toInt finally s.close()
    assert(dirs <= 3, s"auto-compaction must bound the dirs, got $dirs")
  }
  test("identity pin: first apply pins (k, w); a tampered pin refuses " +
    "the next apply and the validated read NAMING both geometries") {
    val store = freshStore()
    assert(StreamWinnowIndex.geometry(store).isEmpty,
      "an unpinned store has no geometry")
    StreamWinnowIndex.applyBatch(df(docs), 0L, "doc_id", "text", store)
    assert(StreamWinnowIndex.geometry(store) ===
      Some((StreamWinnowIndex.K, StreamWinnowIndex.W)))
    StreamWinnowIndex.requireGeometry(store,
      StreamWinnowIndex.K, StreamWinnowIndex.W) // must not throw
    assert(StreamWinnowIndex.servedFps(spark, store,
        StreamWinnowIndex.K, StreamWinnowIndex.W)
      .as[(Long, Long)].collect().toSet === truth)
    // a store written under DIFFERENT constants (another code
    // version): both the apply and the validated read must refuse
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/geometry.txt"),
      "k=9,w=2".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      StreamWinnowIndex.applyBatch(df(docs), 1L, "doc_id", "text", store)
    }
    assert(e.getMessage.contains("k=9,w=2") &&
      e.getMessage.contains("k=5,w=4"),
      s"the refusal must name both geometries: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      StreamWinnowIndex.servedFps(spark, store,
        StreamWinnowIndex.K, StreamWinnowIndex.W)
    }
    intercept[IllegalArgumentException] {
      StreamWinnowIndex.servedFps(spark, freshStore(),
        StreamWinnowIndex.K, StreamWinnowIndex.W)
    }
  }
}
