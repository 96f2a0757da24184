package graft

import graft.functions.TextAnalysis
import graft.ops.{ArtifactStore, Dedup}
import graft.streaming.StreamSimhashIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The maintained SimHash signature index: per-doc signatures make
  * the fold slicing-invariant exactly, replay is a no-op, compaction
  * is a repack (rows AND fingerprint invariant), the geometry pin
  * protects the store across code versions, the index serves
  * part-addressed, and the blocked near-dup off the maintained store
  * equals the single-shot inline path exactly.
  */
class StreamSimhashIndexSpec extends SparkSpec {
  import spark.implicits._

  // the MinHash spec's corpus: two exact-dup pairs (1–2, 5–6) and a
  // one-token-edit near pair (9–10)
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "the quick brown fox jumps over the lazy dog",
    2L -> "the quick brown fox jumps over the lazy dog",
    3L -> "pack my box with five dozen liquor jugs today",
    4L -> "how vexingly quick daft zebras jump around here",
    5L -> "sphinx of black quartz judge my vow tonight",
    6L -> "sphinx of black quartz judge my vow tonight",
    7L -> "we promptly judged antique ivory buckles for prizes",
    8L -> "crazy fredrick bought many very exquisite opal jewels",
    9L -> "a b c d e f g h i j k l m n o p q r s t",
    10L -> "a b c d e f g h i j k l m n o p q r s u",
    11L -> "jinxed wizards pluck ivy from my quilt box",
    12L -> "two driven jocks help fax my big quiz")

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def freshStore(): String =
    Files.createTempDirectory("ssi").toString + "/s"

  private def fold(store: String): Set[(Long, Long)] =
    StreamSimhashIndex.sigs(spark, store)
      .as[(Long, Long)].collect().toSet

  /** The inline derivation (q26's expression) — the maintained store
    * must equal THIS. */
  private lazy val truth: Set[(Long, Long)] =
    df(docs).select(col("doc_id"),
        TextAnalysis.simhash32(TextAnalysis.tokens(col("text")))
          .cast("long").as("simhash"))
      .as[(Long, Long)].collect().toSet

  test("drain == batch EXACTLY: any slicing folds to the inline " +
    "signatures; replay is a no-op; null text drops") {
    val s1 = freshStore()
    StreamSimhashIndex.applyBatch(df(docs), 0L, "doc_id", "text", s1)
    assert(fold(s1) === truth)
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamSimhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    StreamSimhashIndex.applyBatch(df(docs.take(2)), 1L, "doc_id",
      "text", s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    StreamSimhashIndex.applyBatch(
      Seq((90L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      3L, "doc_id", "text", s3)
    assert(fold(s3) === truth, "a null text contributes nothing")
  }

  test("geometry pin: a store written under different constants is " +
    "refused by name on apply and the validated read") {
    val store = freshStore()
    assert(StreamSimhashIndex.geometry(store).isEmpty)
    StreamSimhashIndex.applyBatch(df(docs), 0L, "doc_id", "text", store)
    assert(StreamSimhashIndex.geometry(store) ===
      Some((StreamSimhashIndex.Bits, StreamSimhashIndex.Blocks)))
    StreamSimhashIndex.requireGeometry(store,
      StreamSimhashIndex.Bits, StreamSimhashIndex.Blocks)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/geometry.txt"),
      "bits=64,blocks=8".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    val e = intercept[IllegalArgumentException] {
      StreamSimhashIndex.applyBatch(df(docs), 1L, "doc_id", "text",
        store)
    }
    assert(e.getMessage.contains("bits=64,blocks=8") &&
      e.getMessage.contains("bits=32,blocks=4"),
      s"the refusal must name both geometries: ${e.getMessage}")
    intercept[IllegalArgumentException] {
      StreamSimhashIndex.servedSigs(spark, store,
        StreamSimhashIndex.Bits, StreamSimhashIndex.Blocks)
    }
    intercept[IllegalArgumentException] {
      StreamSimhashIndex.servedSigs(spark, freshStore(),
        StreamSimhashIndex.Bits, StreamSimhashIndex.Blocks)
    }
  }

  test("sidecar fold == scan fingerprint; compaction repacks (rows " +
    "and fingerprint invariant) and recovers from a crash") {
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamSimhashIndex.applyBatch(df(docs.filter(_._1 % 4 == b)),
        b.toLong, "doc_id", "text", store)
    }
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamSimhashIndex.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamSimhashIndex.sigs(spark, store), s"ssi:$store:a"),
      "sidecar fold must equal the scan fingerprint")
    assert(StreamSimhashIndex.compact(spark, store), "must rewrite")
    assert(fold(store) === truth, "compaction moves bytes, never rows")
    ArtifactStore.clearFingerprintMemo()
    assert(StreamSimhashIndex.storeFingerprint(store) === fpBefore,
      "a repack must not change the store fingerprint")
    val pdir = java.nio.file.Paths.get(s"$store/parts")
    java.nio.file.Files.move(pdir,
      java.nio.file.Paths.get(s"$store/parts.compact.old"))
    assert(fold(store) === truth, "crash recovery must restore the store")
  }

  test("the maintained signatures serve part-addressed through the " +
    "ArtifactStore; an append is one new row") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamSimhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", store)
    }
    val root = Files.createTempDirectory("ssi-art").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val served = StreamSimhashIndex.servedSigs(spark, store)
        .as[(Long, Long)].collect().toSet
      assert(served === truth, "served index must equal the fold")
      val plan = StreamSimhashIndex.servedSigs(spark, store)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("simhash_maintained_sigs"),
        s"serve must read the committed artifact:\n$plan")
      StreamSimhashIndex.applyBatch(
        Seq((93L, "five quacking zephyrs jolt my wax bed now"))
          .toDF("doc_id", "text"),
        7L, "doc_id", "text", store)
      val served2 = StreamSimhashIndex.servedSigs(spark, store)
        .as[(Long, Long)].collect().toSet
      assert(served2.map(_._1).contains(93L), "the append must be visible")
      assert(served2.size === truth.size + 1, "one signature appended")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("maintained blocked near-dup == the single-shot inline path") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamSimhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", store)
    }
    val sigs = StreamSimhashIndex.sigs(spark, store)
    val b = StreamSimhashIndex.blocked(sigs)
    val maintained = b.as("x").join(b.as("y"),
        col("x.blk") === col("y.blk") &&
          col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        TextAnalysis.hamming(col("x.simhash"), col("y.simhash"))
          .as("dist"))
      .distinct()
      .filter(col("dist") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Dedup.nearDupSimhash(df(docs), "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(maintained === inline)
    assert(maintained.map(p => (p._1, p._2))
      .intersect(Set((1L, 2L), (5L, 6L))) === Set((1L, 2L), (5L, 6L)),
      "the exact-dup pairs are hamming-0 pairs")
  }

  test("WIDE geometry: a 60-bit store folds to the inline simhash60 " +
    "signatures, its blocked near-dup equals the inline wide path, " +
    "and the 32-bit and wide stores refuse each other by name") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamSimhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", store,
        StreamSimhashIndex.WideBits, StreamSimhashIndex.WideBlocks)
    }
    assert(StreamSimhashIndex.geometry(store) === Some((60, 4)))
    val wideTruth = df(docs).select(col("doc_id"),
        TextAnalysis.simhash60(TextAnalysis.tokens(col("text")))
          .as("simhash"))
      .as[(Long, Long)].collect().toSet
    assert(fold(store) === wideTruth,
      "the wide fold must equal the inline simhash60 signatures")
    // blocked near-dup off the wide store == the inline wide path
    val b = StreamSimhashIndex.blocked(
      StreamSimhashIndex.sigs(spark, store),
      StreamSimhashIndex.WideBits, StreamSimhashIndex.WideBlocks)
    val maintained = b.as("x").join(b.as("y"),
        col("x.blk") === col("y.blk") &&
          col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        TextAnalysis.hamming(col("x.simhash"), col("y.simhash"))
          .as("dist"))
      .distinct()
      .filter(col("dist") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    val inline = Dedup.nearDupSimhashWide(df(docs), "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(maintained === inline)
    // mutual refusal: a 32-bit apply against the wide pin, and a wide
    // apply against a 32-bit pin, each refuse naming both geometries
    val e1 = intercept[IllegalArgumentException] {
      StreamSimhashIndex.applyBatch(df(docs), 9L, "doc_id", "text",
        store)
    }
    assert(e1.getMessage.contains("bits=60,blocks=4") &&
      e1.getMessage.contains("bits=32,blocks=4"))
    val narrow = freshStore()
    StreamSimhashIndex.applyBatch(df(docs), 0L, "doc_id", "text", narrow)
    val e2 = intercept[IllegalArgumentException] {
      StreamSimhashIndex.applyBatch(df(docs), 1L, "doc_id", "text",
        narrow, StreamSimhashIndex.WideBits,
        StreamSimhashIndex.WideBlocks)
    }
    assert(e2.getMessage.contains("bits=32,blocks=4") &&
      e2.getMessage.contains("bits=60,blocks=4"))
  }

  test("streaming wiring drains the same store the batch API builds, " +
    "with auto-compaction bounding the partition count") {
    val src = Files.createTempDirectory("ssi-src").toString
    val store = freshStore()
    (0 until 4).foreach { j =>
      df(docs.filter(_._1 % 4 == j)).coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamSimhashIndex.run(stream, "doc_id", "text", store,
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
