package graft

import graft.ops.ShardWriter
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The shard sink must produce a layout a training data-loader can
  * trust: one file per shard directory, a lossless round-trip, and a
  * manifest whose counts and checksums match what a reader recomputes
  * from the files.
  */
class ShardWriterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("one file per shard, lossless round-trip, manifest matches " +
    "reader-side recompute") {
    val docs = Tables.documents(spark, dir)
    val out = Files.createTempDirectory("shardwriter").toString
    val manifest = ShardWriter.write(docs, nShards = 8, out).cache()

    // layout: every shard dir holds exactly one parquet part
    val shardDirs = new java.io.File(s"$out/shards").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.nonEmpty)
    for (d <- shardDirs) {
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1, s"${d.getName} has ${parts.length} files")
    }

    // round-trip: no docs lost or duplicated, text intact
    val back = spark.read.parquet(s"$out/shards")
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    assert(back.select("doc_id", "text").except(
      docs.select("doc_id", "text")).isEmpty)

    // manifest == reader-side recompute from the shard files
    val recomputed = back.groupBy("shard_id").agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").as("n_tokens"),
      expr("bit_xor(xxhash64(doc_id))").as("checksum"))
    assert(manifest.count() == recomputed.count())
    assert(manifest.except(recomputed).isEmpty)

    // write-time fingerprint sidecars: the sidecar fold answers the
    // staleness question in O(#shards) metadata reads and must equal
    // the full-scan fingerprint of the read-back store exactly (the
    // ArtifactStore managed-store protocol)
    graft.ops.ArtifactStore.clearFingerprintMemo()
    assert(graft.ops.ArtifactStore.fingerprintFromParts(s"$out/shards")
      === graft.ops.ArtifactStore.fingerprint(back, s"sws:$out"),
      "shard sidecar fold must equal the scan fingerprint")

    // balance: no shard above 2× the ideal token budget (assignment
    // property carried through the writer)
    val total = manifest.agg(sum("n_tokens")).head.getLong(0)
    val maxShard = manifest.agg(max("n_tokens")).head.getLong(0)
    assert(maxShard <= 2 * (total / 8 + 1), s"skewed shard: $maxShard")
  }

  test("payload columns colliding with assignment internals are " +
    "rejected at the boundary, not silently clobbered") {
    val docs = Tables.documents(spark, dir)
      .withColumn("bucket", lit("curation-bucket-7"))
    val out = Files.createTempDirectory("shardwriter_bad").toString
    val ex = intercept[IllegalArgumentException] {
      ShardWriter.write(docs, nShards = 4, out)
    }
    assert(ex.getMessage.contains("bucket"))
  }
}
