package graft

import graft.functions.TextAnalysis
import graft.ops.{ArtifactStore, Dedup}
import graft.streaming.StreamMinhashIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The maintained MinHash band index: per-doc keys make the fold
  * slicing-invariant exactly, replay is a no-op, compaction is a
  * repack (rows AND fingerprint invariant), the geometry pin fails
  * LOUDLY on a mismatched apply or read, the index serves
  * part-addressed, and the maintained self-join finds EXACTLY the
  * pairs the single-shot inline path finds.
  */
class StreamMinhashIndexSpec extends SparkSpec {
  import spark.implicits._

  // 12 docs with >= 3 tokens each: two exact-dup pairs (1–2, 5–6), a
  // near pair (9–10: one trailing token differs), the rest distinct
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

  private val NB = 12
  private val R = 2

  private def df(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def freshStore(): String =
    Files.createTempDirectory("smi").toString + "/m"

  private def fold(store: String): Set[(Long, Int, Long)] =
    StreamMinhashIndex.keys(spark, store)
      .as[(Long, Int, Long)].collect().toSet

  /** The inline dedup family's derivation, built in the spec from the
    * family primitives — the maintained store must equal THIS. */
  private lazy val truth: Set[(Long, Int, Long)] =
    df(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), TextAnalysis.minhashAffine(
        TextAnalysis.shingleHashes(col("toks")), NB * R).as("mh"))
      .select(col("doc_id"),
        posexplode(Dedup.bandKeyArray(col("mh"), NB, R)))
      .select(col("doc_id"), col("pos"), col("col"))
      .as[(Long, Int, Long)].collect().toSet

  test("drain == batch EXACTLY: any slicing folds to the inline " +
    "keying; replay is a no-op; null-text and <3-token docs drop") {
    val s1 = freshStore()
    StreamMinhashIndex.applyBatch(df(docs), 0L, "doc_id", "text",
      NB, R, s1)
    assert(fold(s1) === truth)
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamMinhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", NB, R, s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    StreamMinhashIndex.applyBatch(df(docs.take(2)), 1L, "doc_id",
      "text", NB, R, s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    StreamMinhashIndex.applyBatch(
      Seq((90L, null.asInstanceOf[String]), (91L, "too short"))
        .toDF("doc_id", "text"),
      3L, "doc_id", "text", NB, R, s3)
    assert(fold(s3) === truth,
      "null-text and shingle-less docs contribute nothing")
  }

  test("geometry pin: a mismatched apply fails LOUDLY; the read side " +
    "exposes the pin and refuses a mismatched reader NAMING both " +
    "geometries") {
    val store = freshStore()
    StreamMinhashIndex.applyBatch(df(docs), 0L, "doc_id", "text",
      NB, R, store)
    val e = intercept[IllegalArgumentException] {
      StreamMinhashIndex.applyBatch(df(docs), 1L, "doc_id", "text",
        8, 3, store)
    }
    assert(e.getMessage.contains("geometry"))
    assert(fold(store) === truth, "the refused batch must not commit")
    assert(StreamMinhashIndex.geometry(store) === Some((NB, R)))
    StreamMinhashIndex.requireGeometry(store, NB, R) // must not throw
    val e2 = intercept[IllegalArgumentException] {
      StreamMinhashIndex.servedKeys(spark, store, 8, 3)
    }
    assert(e2.getMessage.contains("bands=12,rowsPerBand=2") &&
      e2.getMessage.contains("bands=8,rowsPerBand=3"),
      s"the refusal must name both geometries: ${e2.getMessage}")
    assert(StreamMinhashIndex.servedKeys(spark, store, NB, R)
      .as[(Long, Int, Long)].collect().toSet === truth)
    intercept[IllegalArgumentException] {
      StreamMinhashIndex.servedKeys(spark, freshStore(), NB, R)
    }
  }

  test("sidecar fold == scan fingerprint; compaction repacks (rows " +
    "and fingerprint invariant) and recovers from a crash") {
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamMinhashIndex.applyBatch(df(docs.filter(_._1 % 4 == b)),
        b.toLong, "doc_id", "text", NB, R, store)
    }
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamMinhashIndex.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamMinhashIndex.keys(spark, store), s"smi:$store:a"),
      "sidecar fold must equal the scan fingerprint")
    assert(StreamMinhashIndex.compact(spark, store), "must rewrite")
    assert(fold(store) === truth, "compaction moves bytes, never rows")
    ArtifactStore.clearFingerprintMemo()
    assert(StreamMinhashIndex.storeFingerprint(store) === fpBefore,
      "a repack must not change the store fingerprint")
    val pdir = java.nio.file.Paths.get(s"$store/parts")
    java.nio.file.Files.move(pdir,
      java.nio.file.Paths.get(s"$store/parts.compact.old"))
    assert(fold(store) === truth, "crash recovery must restore the store")
  }

  test("the maintained index serves part-addressed through the " +
    "ArtifactStore; an append is one new part") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamMinhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", NB, R, store)
    }
    val root = Files.createTempDirectory("smi-art").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val served = StreamMinhashIndex.servedKeys(spark, store)
        .as[(Long, Int, Long)].collect().toSet
      assert(served === truth, "served index must equal the fold")
      val plan = StreamMinhashIndex.servedKeys(spark, store)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("minhash_maintained_keys"),
        s"serve must read the committed artifact:\n$plan")
      StreamMinhashIndex.applyBatch(
        Seq((93L, "five quacking zephyrs jolt my wax bed now"))
          .toDF("doc_id", "text"),
        7L, "doc_id", "text", NB, R, store)
      val served2 = StreamMinhashIndex.servedKeys(spark, store)
        .as[(Long, Int, Long)].collect().toSet
      assert(served2.map(_._1).contains(93L), "the append must be visible")
      assert(served2.size === truth.size + NB, "one key per band appended")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("maintained self-join near-dup == the single-shot inline " +
    "path, pairs and jaccard both") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamMinhashIndex.applyBatch(df(docs.filter(_._1 % 3 == b)),
        b.toLong, "doc_id", "text", NB, R, store)
    }
    val keys = StreamMinhashIndex.servedKeys(spark, store, NB, R)
    val cand = keys.as("x").join(keys.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val corpus = df(docs)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        TextAnalysis.shingleHashes(col("toks")).as("hs"))
    val maintained = cand
      .join(corpus.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")),
        "doc_a")
      .join(corpus.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
        "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter"))
          .cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    val inline = Dedup.nearDupMinhash(df(docs), "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(maintained === inline)
    assert(maintained.map(p => (p._1, p._2)) ===
      Set((1L, 2L), (5L, 6L), (9L, 10L)),
      "the fixture's two exact pairs and one near pair")
  }

  test("streaming wiring drains the same store the batch API builds, " +
    "with auto-compaction bounding the partition count") {
    val src = Files.createTempDirectory("smi-src").toString
    val store = freshStore()
    (0 until 4).foreach { j =>
      df(docs.filter(_._1 % 4 == j)).coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamMinhashIndex.run(stream, "doc_id", "text",
      NB, R, store, Trigger.AvailableNow(),
      compactAfterBatches = 2).start()
    q.awaitTermination()
    assert(fold(store) === truth, "drained fold must equal the truth")
    val d = java.nio.file.Paths.get(s"$store/parts")
    val s = Files.list(d)
    val dirs = try s.filter(_.getFileName.toString.startsWith("bid="))
      .count().toInt finally s.close()
    assert(dirs <= 3, s"auto-compaction must bound the dirs, got $dirs")
  }
}
