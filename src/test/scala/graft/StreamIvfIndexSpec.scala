package graft

import graft.ops.{ArtifactStore, VectorSearch}
import graft.streaming.StreamIvfIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** The maintained IVF postings index: per-vector cells make the fold
  * slicing-invariant exactly, replay is a no-op, compaction is a
  * repack (rows AND fingerprint invariant), the centroid pin
  * round-trips losslessly and fails LOUDLY on a mismatched apply or
  * read — including same-shape different-values matrices — and the
  * index serves part-addressed.
  */
class StreamIvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private val rnd = new scala.util.Random(11)
  private val vecs: Seq[(Long, Seq[Float])] =
    (0L until 24L).map(i => i -> Seq.fill(dims)(rnd.nextFloat() * 2 - 1))

  // a deterministic trained matrix — what production hands applyBatch
  private lazy val cents: Array[Array[Double]] =
    VectorSearch.kmeansCentroids(
      vecs.map(_._2.map(_.toDouble).toArray).toArray,
      k = 4, iters = 5, seed = 3)

  private val P = 2 // per-vector assignment multiplicity

  private def df(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def freshStore(): String =
    Files.createTempDirectory("sii").toString + "/i"

  private def fold(store: String): Set[(Long, Int)] =
    StreamIvfIndex.assign(spark, store).as[(Long, Int)].collect().toSet

  private lazy val truth: Set[(Long, Int)] =
    VectorSearch.ivfAssign(df(vecs), "vec_id", "embedding", cents, P)
      .select(col("id").cast("long"), col("cell").cast("int"))
      .as[(Long, Int)].collect().toSet

  test("drain == batch EXACTLY: any slicing folds to the inline " +
    "assignment; replay is a no-op; null and wrong-dim vectors drop") {
    val s1 = freshStore()
    StreamIvfIndex.applyBatch(df(vecs), 0L, "vec_id", "embedding",
      cents, P, s1)
    assert(fold(s1) === truth)
    val s3 = freshStore()
    (0 until 3).foreach { b =>
      StreamIvfIndex.applyBatch(df(vecs.filter(_._1 % 3 == b)),
        b.toLong, "vec_id", "embedding", cents, P, s3)
    }
    assert(fold(s3) === truth, "slicing must not change the fold")
    StreamIvfIndex.applyBatch(df(vecs.take(2)), 1L, "vec_id",
      "embedding", cents, P, s3)
    assert(fold(s3) === truth, "replay must be a no-op")
    StreamIvfIndex.applyBatch(
      Seq((90L, null.asInstanceOf[Seq[Float]]),
        (91L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding"),
      3L, "vec_id", "embedding", cents, P, s3)
    assert(fold(s3) === truth,
      "null and wrong-dimension vectors contribute nothing")
  }

  test("centroid pin: lossless round-trip; a mismatched apply or " +
    "read fails LOUDLY — including a same-shape matrix with " +
    "different values") {
    val store = freshStore()
    assert(StreamIvfIndex.centroids(store).isEmpty,
      "an unpinned store has no matrix")
    StreamIvfIndex.applyBatch(df(vecs), 0L, "vec_id", "embedding",
      cents, P, store)
    val Some((m, pr)) = StreamIvfIndex.centroids(store)
    assert(pr === P)
    assert(m.map(_.toSeq).toSeq === cents.map(_.toSeq).toSeq,
      "Double.toString pin must round-trip the matrix exactly")
    StreamIvfIndex.requireCentroids(store, cents, P) // must not throw
    // different probes, same matrix
    intercept[IllegalArgumentException] {
      StreamIvfIndex.applyBatch(df(vecs), 1L, "vec_id", "embedding",
        cents, P + 1, store)
    }
    // same shape, one value perturbed — the subtle mismatch
    val tweaked = cents.map(_.clone())
    tweaked(0)(0) += 1e-9
    val e = intercept[IllegalArgumentException] {
      StreamIvfIndex.servedAssign(spark, store, tweaked, P)
    }
    assert(e.getMessage.contains("DIFFERENT centroid values"),
      s"the refusal must name the value mismatch: ${e.getMessage}")
    assert(fold(store) === truth, "refused batches must not commit")
    assert(StreamIvfIndex.servedAssign(spark, store, cents, P)
      .as[(Long, Int)].collect().toSet === truth)
    // a truncated pin row (external corruption) must refuse by name,
    // never hand a reader a ragged matrix
    val pin = java.nio.file.Paths.get(s"$store/centroids.txt")
    val lines = java.nio.file.Files.readAllLines(pin)
    lines.set(1, lines.get(1).split(",").take(3).mkString(","))
    java.nio.file.Files.write(pin, lines)
    val er = intercept[IllegalArgumentException] {
      StreamIvfIndex.centroids(store)
    }
    assert(er.getMessage.contains("ragged"),
      s"the ragged-pin refusal must say why: ${er.getMessage}")
    intercept[IllegalArgumentException] {
      StreamIvfIndex.servedAssign(spark, freshStore(), cents, P)
    }
  }

  test("sidecar fold == scan fingerprint; compaction repacks (rows " +
    "and fingerprint invariant) and recovers from a crash") {
    val store = freshStore()
    (0 until 4).foreach { b =>
      StreamIvfIndex.applyBatch(df(vecs.filter(_._1 % 4 == b)),
        b.toLong, "vec_id", "embedding", cents, P, store)
    }
    ArtifactStore.clearFingerprintMemo()
    val fpBefore = StreamIvfIndex.storeFingerprint(store)
    assert(fpBefore === ArtifactStore.fingerprint(
      StreamIvfIndex.assign(spark, store), s"sii:$store:a"),
      "sidecar fold must equal the scan fingerprint")
    assert(StreamIvfIndex.compact(spark, store), "must rewrite")
    assert(fold(store) === truth, "compaction moves bytes, never rows")
    ArtifactStore.clearFingerprintMemo()
    assert(StreamIvfIndex.storeFingerprint(store) === fpBefore,
      "a repack must not change the store fingerprint")
    val pdir = java.nio.file.Paths.get(s"$store/parts")
    java.nio.file.Files.move(pdir,
      java.nio.file.Paths.get(s"$store/parts.compact.old"))
    assert(fold(store) === truth, "crash recovery must restore the store")
  }

  test("the maintained postings serve part-addressed through the " +
    "ArtifactStore; an append is one new part") {
    val store = freshStore()
    (0 until 3).foreach { b =>
      StreamIvfIndex.applyBatch(df(vecs.filter(_._1 % 3 == b)),
        b.toLong, "vec_id", "embedding", cents, P, store)
    }
    val root = Files.createTempDirectory("sii-art").toString
    spark.conf.set(ArtifactStore.RootConf, root)
    try {
      val served = StreamIvfIndex.servedAssign(spark, store)
        .as[(Long, Int)].collect().toSet
      assert(served === truth, "served postings must equal the fold")
      val plan = StreamIvfIndex.servedAssign(spark, store)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(plan.contains("ivf_maintained_assign"),
        s"serve must read the committed artifact:\n$plan")
      StreamIvfIndex.applyBatch(
        Seq((91L, Seq.fill(dims)(0.5f))).toDF("vec_id", "embedding"),
        7L, "vec_id", "embedding", cents, P, store)
      val served2 = StreamIvfIndex.servedAssign(spark, store)
        .as[(Long, Int)].collect().toSet
      assert(served2.map(_._1).contains(91L), "the append must be visible")
      assert(served2.size === truth.size + P,
        "one posting per probe appended")
    } finally spark.conf.unset(ArtifactStore.RootConf)
  }

  test("streaming wiring drains the same store the batch API builds, " +
    "with auto-compaction bounding the partition count") {
    val src = Files.createTempDirectory("sii-src").toString
    val store = freshStore()
    (0 until 4).foreach { j =>
      df(vecs.filter(_._1 % 4 == j)).coalesce(1)
        .write.parquet(s"$src/b$j.parquet")
    }
    val stream = spark.readStream
      .schema("vec_id LONG, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$src/*.parquet")
    val q = StreamIvfIndex.run(stream, "vec_id", "embedding",
      cents, P, store, Trigger.AvailableNow(),
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
