package graft

import graft.ops.{ArtifactStore, Dedup}
import graft.streaming.StreamContainIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The maintained containment postings index: per-doc rows make the
  * fold slicing-invariant exactly, replay is a no-op, compaction is a
  * repack, the geometry pin refuses foreign stores, and cross-batch
  * arrival detection finds exactly the inline containment pairs whose
  * two docs arrived in different rounds — at FULL recall, because the
  * pigeonhole prefix guarantee is order-agnostic and the store's
  * fixed hash order is a valid global order.
  */
class StreamContainIndexSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with planted containment: docs 20/21 quote doc 1's text
  // inside longer documents; doc 22 is an excerpt of doc 2
  private val base = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta",
    2L -> "one two three four five six seven eight nine ten",
    3L -> "completely different words with no overlap at all here",
    4L -> "another unrelated document of filler text for bulk",
    20L -> ("alpha beta gamma delta epsilon zeta eta theta " +
      "plus a long tail of extra commentary words appended"),
    21L -> ("prefix words first then alpha beta gamma delta epsilon " +
      "zeta eta theta"),
    22L -> "two three four five six seven eight",
    23L -> "yet more unrelated filler to pad the corpus out")

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def freshStore(): String =
    Files.createTempDirectory("sci").toString + "/s"

  private def fold(store: String): Set[(Long, Long, Int, Int)] =
    StreamContainIndex.posts(spark, store)
      .as[(Long, Long, Int, Int)].collect().toSet

  private lazy val truth: Set[(Long, Long, Int, Int)] =
    StreamContainIndex.batchPosts(df(base), "doc_id", "text")
      .as[(Long, Long, Int, Int)].collect().toSet

  test("drain == batch EXACTLY: any slicing folds to the inline " +
    "postings; replay is a no-op; null text and short docs drop") {
    val s1 = freshStore()
    StreamContainIndex.applyBatch(df(base), 0L, "doc_id", "text", s1)
    assert(fold(s1) === truth)
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamContainIndex.applyBatch(df(base.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    StreamContainIndex.applyBatch(df(base.take(2)), 1L, "doc_id",
      "text", s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    StreamContainIndex.applyBatch(
      Seq((90L, null.asInstanceOf[String]), (91L, "a b"))
        .toDF("doc_id", "text"),
      3L, "doc_id", "text", s3)
    assert(fold(s3) === truth,
      "null text and sub-shingle docs contribute nothing")
  }

  test("geometry pin: a store under foreign constants refuses by " +
    "name; sidecar fold == scan; compaction repacks with the " +
    "fingerprint invariant") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamContainIndex.applyBatch(df(base.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", store)
    }
    assert(StreamContainIndex.geometry(store) ===
      Some("shingles=3,order=hash"))
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamContainIndex.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamContainIndex.posts(spark, store), s"sci:$store:a"))
    assert(StreamContainIndex.compact(spark, store), "must rewrite")
    assert(fold(store) === truth, "compaction moves bytes, never rows")
    ArtifactStore.clearFingerprintMemo()
    assert(StreamContainIndex.storeFingerprint(store) === fpBefore)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$store/geometry.txt"),
      "shingles=5,order=df".getBytes("UTF-8"))
    val e = intercept[IllegalArgumentException] {
      StreamContainIndex.applyBatch(df(base), 9L, "doc_id", "text",
        store)
    }
    assert(e.getMessage.contains("shingles=5,order=df") &&
      e.getMessage.contains("shingles=3,order=hash"))
  }

  test("cross-batch arrival detection == the inline containment join " +
    "restricted to cross-round pairs, at full recall — the hash " +
    "order is a valid global order for the pigeonhole guarantee") {
    val t = 0.9
    val store = freshStore()
    val hits = (0 until 3).map { b =>
      val batch = df(base.filter(_._1 % 3 == b))
      val cand =
        if (StreamContainIndex.appliedBid(store) < 0) None
        else Some(StreamContainIndex.arrivalCandidates(
          StreamContainIndex.batchPosts(batch, "doc_id", "text"),
          StreamContainIndex.posts(spark, store), t)
          .localCheckpoint())
      StreamContainIndex.applyBatch(batch, b.toLong, "doc_id",
        "text", store)
      cand
    }.flatten.reduce(_ unionAll _)
    // exact verification over the candidates (the query-side step)
    val sh = df(base)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        graft.functions.TextAnalysis.shingleHashes(col("toks"))
          .as("hs"))
    val got = hits
      .join(sh.select(col("doc_id").as("contained"),
        col("hs").as("hs_a")), "contained")
      .join(sh.select(col("doc_id").as("container"),
        col("hs").as("hs_b")), "container")
      .withColumn("c",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
          size(col("hs_a")).cast("double"))
      .filter(col("c") >= t)
      .select(col("contained"), col("container"))
      .as[(Long, Long)].collect().toSet
    // truth: the inline join's pairs whose docs sit in different rounds
    val want = Dedup.containmentJoin(df(base), "doc_id", "text", t)
      .select(col("doc_a"), col("doc_b"))
      .as[(Long, Long)].collect().toSet
      .filter(p => p._1 % 3 != p._2 % 3)
    assert(got === want,
      s"arrival detection must equal the cross-round inline pairs:\n" +
        s"got $got\nwant $want")
    assert(got.contains((1L, 20L)) && got.contains((22L, 2L)),
      "the planted quotations must be found in both directions " +
        "(1 quoted by a later arrival; 22 arrives quoting an earlier 2)")
  }

  test("HOT-BANDED order (the trained-order model): detection is " +
    "identical to the hash-order store — the pinned order is pure " +
    "cost tuning — and stores under different hot sets refuse each " +
    "other by name") {
    val t = 0.9
    val hot = StreamContainIndex.trainHotSet(df(base), "doc_id",
      "text", n = 8)
    assert(hot.nonEmpty && hot.length <= 8)
    def drive(store: String, hs: Seq[Long]): Set[(Long, Long)] = {
      val hits = (0 until 3).map { b =>
        val batch = df(base.filter(_._1 % 3 == b))
        val cand =
          if (StreamContainIndex.appliedBid(store) < 0) None
          else Some(StreamContainIndex.arrivalCandidates(
            StreamContainIndex.batchPosts(batch, "doc_id", "text", hs),
            StreamContainIndex.posts(spark, store), t)
            .localCheckpoint())
        StreamContainIndex.applyBatch(batch, b.toLong, "doc_id",
          "text", store, hs)
        cand
      }.flatten.reduce(_ unionAll _)
      val sh = df(base)
        .select(col("doc_id"),
          graft.functions.TextAnalysis.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          graft.functions.TextAnalysis.shingleHashes(col("toks"))
            .as("hs"))
      hits
        .join(sh.select(col("doc_id").as("contained"),
          col("hs").as("hs_a")), "contained")
        .join(sh.select(col("doc_id").as("container"),
          col("hs").as("hs_b")), "container")
        .filter(size(array_intersect(col("hs_a"), col("hs_b")))
          .cast("double") / size(col("hs_a")).cast("double") >= t)
        .select(col("contained"), col("container"))
        .as[(Long, Long)].collect().toSet
    }
    val banded = freshStore()
    val plain = freshStore()
    assert(drive(banded, hot) === drive(plain, Seq.empty),
      "the pinned order must never change WHAT is detected")
    assert(StreamContainIndex.hotSet(banded) === hot,
      "the hot list must round-trip the pin losslessly")
    // refusal: an apply under a DIFFERENT hot set (or none) must name
    // both order identities
    val e = intercept[IllegalArgumentException] {
      StreamContainIndex.applyBatch(df(base), 9L, "doc_id", "text",
        banded)
    }
    assert(e.getMessage.contains("order=hotband") &&
      e.getMessage.contains("order=hash"))
    val e2 = intercept[IllegalArgumentException] {
      StreamContainIndex.applyBatch(df(base), 9L, "doc_id", "text",
        banded, hot.drop(1))
    }
    assert(e2.getMessage.contains("order=hotband"))
  }
}
