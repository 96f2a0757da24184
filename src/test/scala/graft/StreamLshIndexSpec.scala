package graft

import graft.ops.{ArtifactStore, VectorSearch}
import graft.streaming.StreamLshIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The maintained LSH bucket index: per-vector keys make the fold
  * slicing-invariant exactly, replay is a no-op, compaction is a
  * repack (rows AND fingerprint invariant), the geometry pin fails
  * LOUDLY on a mismatched apply, and the index serves part-addressed.
  */
class StreamLshIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 24L).map(i => i -> Seq.fill(dims)(rnd.nextFloat() * 2 - 1))

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def freshStore(): String =
    Files.createTempDirectory("sli").toString + "/l"

  private def fold(store: String): Set[(Long, Int, Long)] =
    StreamLshIndex.buckets(spark, store)
      .as[(Long, Int, Long)].collect().toSet

  private lazy val truth: Set[(Long, Int, Long)] =
    VectorSearch.lshCandidates(df(vecs), "vec_id", "embedding",
      bands = 2, bitsPerBand = 3, dims = dims)
      .select(col("id").cast("long"), col("band"), col("key").cast("long"))
      .as[(Long, Int, Long)].collect().toSet

  test("drain == batch EXACTLY: any slicing folds to the direct " +
    "keying; replay is a no-op; a null vector drops") {
    val s1 = freshStore()
    StreamLshIndex.applyBatch(df(vecs), 0L, "vec_id", "embedding",
      2, 3, dims, s1)
    assert(fold(s1) === truth)
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamLshIndex.applyBatch(df(vecs.filter(_._1 % 3 == b)),
        b.toLong, "vec_id", "embedding", 2, 3, dims, s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    StreamLshIndex.applyBatch(df(vecs.take(2)), 1L, "vec_id",
      "embedding", 2, 3, dims, s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    StreamLshIndex.applyBatch(
      Seq((90L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"),
      3L, "vec_id", "embedding", 2, 3, dims, s3)
    assert(fold(s3) === truth, "a null vector contributes nothing")
  }

  test("geometry pin: a mismatched apply fails LOUDLY instead of " +
    "mixing key spaces") {
    val store = freshStore()
    StreamLshIndex.applyBatch(df(vecs), 0L, "vec_id", "embedding",
      2, 3, dims, store)
    val e = intercept[IllegalArgumentException] {
      StreamLshIndex.applyBatch(df(vecs), 1L, "vec_id", "embedding",
        4, 4, dims, store)
    }
    assert(e.getMessage.contains("geometry"))
    assert(fold(store) === truth, "the refused batch must not commit")
  }

  test("geometry pin, read side: geometry() exposes the pinned " +
    "triple, requireGeometry passes on match, and a mismatched " +
    "reader is refused NAMING both geometries — never silently " +
    "wrong candidates") {
    val store = freshStore()
    assert(StreamLshIndex.geometry(store).isEmpty,
      "an unpinned store has no geometry")
    StreamLshIndex.applyBatch(df(vecs), 0L, "vec_id", "embedding",
      2, 3, dims, store)
    assert(StreamLshIndex.geometry(store) === Some((2, 3, dims)))
    StreamLshIndex.requireGeometry(store, 2, 3, dims) // must not throw
    val e = intercept[IllegalArgumentException] {
      StreamLshIndex.servedBuckets(spark, store, 4, 4, dims)
    }
    assert(e.getMessage.contains("bands=2,bitsPerBand=3") &&
      e.getMessage.contains("bands=4,bitsPerBand=4"),
      s"the refusal must name both geometries: ${e.getMessage}")
    // the validated serve path answers when geometries agree
    assert(StreamLshIndex.servedBuckets(spark, store, 2, 3, dims)
      .as[(Long, Int, Long)].collect().toSet === truth)
    // an unpinned (empty) store refuses too: there is nothing to
    // validate the caller's probe keys against
    intercept[IllegalArgumentException] {
      StreamLshIndex.servedBuckets(spark, freshStore(), 2, 3, dims)
    }
  }

  test("sidecar fold == scan fingerprint; compaction repacks (rows " +
    "and fingerprint invariant) and recovers from a crash") {
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamLshIndex.applyBatch(df(vecs.filter(_._1 % 4 == b)),
        b.toLong, "vec_id", "embedding", 2, 3, dims, store)
    }
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamLshIndex.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamLshIndex.buckets(spark, store), s"sli:$store:a"),
      "sidecar fold must equal the scan fingerprint")
    assert(StreamLshIndex.compact(spark, store), "must rewrite")
    assert(fold(store) === truth, "compaction moves bytes, never rows")
    ArtifactStore.clearFingerprintMemo()
    assert(StreamLshIndex.storeFingerprint(store) === fpBefore,
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
      StreamLshIndex.applyBatch(df(vecs.filter(_._1 % 3 == b)),
        b.toLong, "vec_id", "embedding", 2, 3, dims, store)
    }
    val root = Files.createTempDirectory("sli-art").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val served = StreamLshIndex.servedBuckets(spark, store)
        .as[(Long, Int, Long)].collect().toSet
      assert(served === truth, "served index must equal the fold")
      val plan = StreamLshIndex.servedBuckets(spark, store)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("lsh_maintained_buckets"),
        s"serve must read the committed artifact:\n$plan")
      StreamLshIndex.applyBatch(
        Seq((91L, Seq.fill(dims)(0.5f))).toDF("vec_id", "embedding"),
        7L, "vec_id", "embedding", 2, 3, dims, store)
      val served2 = StreamLshIndex.servedBuckets(spark, store)
        .as[(Long, Int, Long)].collect().toSet
      assert(served2.map(_._1).contains(91L), "the append must be visible")
      assert(served2.size === truth.size + 2, "one key per band appended")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("streaming wiring drains the same store the batch API builds, " +
    "with auto-compaction bounding the partition count") {
    val src = Files.createTempDirectory("sli-src").toString
    val store = freshStore()
    (0 until 4).foreach { j =>
      df(vecs.filter(_._1 % 4 == j)).coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamLshIndex.run(stream, "vec_id", "embedding",
      2, 3, dims, store, Trigger.AvailableNow(),
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
