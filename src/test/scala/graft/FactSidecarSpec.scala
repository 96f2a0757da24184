package graft

import graft.ops.ArtifactStore
import graft.streaming.BlockIngest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** The write-time fingerprint-sidecar protocol on the INGEST sink —
  * the ETL half of the sidecar-addressed staleness story: every
  * height-partitioned fact table commits per-partition `_fp` sidecars
  * with the batch (strictly before the manifest), so artifacts over
  * `transactions`/`rewards`/... address and delta-rebuild in
  * O(#commits) metadata reads with zero corpus scans.
  */
class FactSidecarSpec extends SparkSpec {

  private val streamDir = "/root/repo/fixtures/stream"

  private def blocks = spark.read.schema(BlockIngest.blockSchema)
    .json(s"$streamDir/blocks.jsonl")

  test("fold == scan for every fact table: the sidecar-folded " +
    "fingerprint equals a full content scan of the canonical " +
    "committed view, across multiple batches") {
    val sink = Files.createTempDirectory("fp_sink").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 25L)), sink)
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(26L, 60L)), sink)
    Seq("blocks", "transactions", "transaction_actors", "rewards",
      "dc_burns", "oracle_prices", "dirty_sets").foreach { table =>
      val parts = BlockIngest.factParts(sink, table)
      assert(parts.nonEmpty, s"$table must have committed sidecars")
      ArtifactStore.clearFingerprintMemo()
      assert(BlockIngest.factFingerprint(sink, table) ===
        ArtifactStore.fingerprint(
          BlockIngest.readFactCommitted(spark, sink, table),
          s"facts:$sink:$table"),
        s"$table: sidecar fold must equal the full-scan fingerprint")
    }
  }

  test("each part's sidecar reproduces exactly what readFactPart " +
    "hashes — the per-part address a delta rebuild trusts") {
    val sink = Files.createTempDirectory("fp_part").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 20L)), sink)
    BlockIngest.factParts(sink, "transactions").take(5).foreach {
      case (pid, fp) =>
        assert(fp === ArtifactStore.combineParts(Seq(
          ArtifactStore.partFingerprint(
            BlockIngest.readFactPart(spark, sink, "transactions", pid)))),
          s"part $pid: sidecar must equal the part-read fingerprint")
    }
  }

  test("a torn batch's sidecars sit above the watermark and are " +
    "invisible to factParts; the replay commits them") {
    val sink = Files.createTempDirectory("fp_torn").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 30L)), sink)
    val before = BlockIngest.factParts(sink, "transactions").toMap
    intercept[IllegalStateException](BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(31L, 60L)), sink,
      crashAt = Some("before-commit")))
    // the torn batch wrote partitions AND sidecars for 31..60, but
    // the watermark never moved — the committed part map is unchanged
    assert(BlockIngest.factParts(sink, "transactions").toMap === before,
      "torn sidecars must be invisible below the watermark")
    assert(Files.exists(Paths.get(
      s"$sink/transactions/_fp/block=40.json")),
      "the torn sidecar file itself does exist (above the watermark)")
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(31L, 60L)), sink)
    val after = BlockIngest.factParts(sink, "transactions").toMap
    assert(before.toSet.subsetOf(after.toSet),
      "replay must not change already-committed part addresses")
    assert(after.keySet.contains("block=40"))
  }

  test("sidecar files never leak into commit manifests, audits, or " +
    "committed reads") {
    val sink = Files.createTempDirectory("fp_leak").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 60L)), sink)
    // manifest-resolving read works (would throw on a .json 'parquet')
    assert(BlockIngest.readCommitted(spark, sink, "transactions")
      .count() > 0)
    val audit = BlockIngest.auditOrphans(spark, sink)
    assert(!audit.exists(_._1.contains("_fp/")),
      "the audit must not classify sidecar metadata as data files")
  }

  test("inventory sidecars: fold == scan for the bucketed MVCC " +
    "stores, a missing sidecar heals from the data layout, and " +
    "vacuumed versions take their sidecars with them") {
    val sink = Files.createTempDirectory("fp_inv").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 30L)), sink)
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(31L, 60L)), sink)
    val h = BlockIngest.committedHeight(sink)
    Seq("gateway_inventory", "account_inventory", "actor_inventory")
      .foreach { table =>
        val dir = s"$sink/$table"
        val parts = graft.ops.Inventory
          .committedStateParts(spark, dir, h)
        assert(parts.nonEmpty, s"$table must have committed parts")
        ArtifactStore.clearFingerprintMemo()
        val scan = ArtifactStore.fingerprint(
          graft.ops.Inventory.readBucketedStateAt(spark, dir, h),
          s"inv:$dir")
        val fold = ArtifactStore.combineParts(parts.map { case (_, fp) =>
          val Array(hex, n) = fp.split('_')
          (BigInt(hex, 16), n.toLong)
        })
        assert(fold === scan,
          s"$table: sidecar fold must equal the committed-view scan")
      }
    // healing: drop one sidecar — the part map recomputes it from the
    // version leaf and REWRITES it (data layout is the source of truth)
    val gwDir = s"$sink/gateway_inventory"
    val before = graft.ops.Inventory.committedStateParts(spark, gwDir, h)
    val victim = before.head._1
    assert(Files.deleteIfExists(Paths.get(s"$gwDir/_fp/$victim.json")))
    val healed = graft.ops.Inventory.committedStateParts(spark, gwDir, h)
    assert(healed === before, "healing must reproduce the same address")
    assert(Files.exists(Paths.get(s"$gwDir/_fp/$victim.json")),
      "the healed sidecar must persist")
    // vacuum took superseded versions' sidecars: every remaining
    // sidecar names a version directory that still exists
    graft.ops.ArtifactStore.readFpParts(gwDir).foreach { case (pid, _) =>
      val Array(b, m) = pid.split("\\.")
      assert(Files.isDirectory(Paths.get(
        s"$gwDir/$b/merged_height=${m.stripPrefix("mh=")}")),
        s"sidecar $pid must not outlive its data version")
    }
  }

  test("delta rebuild over an INVENTORY: a second batch rebuilds " +
    "only its touched buckets' parts") {
    val sink = Files.createTempDirectory("fp_inv_delta").toString
    val root = Files.createTempDirectory("fp_inv_root").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 40L)), sink)
    val dir = s"$sink/gateway_inventory"
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): Long = {
      spark.conf.set(ArtifactStore.RootConf, root)
      try ArtifactStore.buildOrServeParts(spark, "gw_inv_proj",
        graft.ops.Inventory.committedStateParts(spark, dir,
          BlockIngest.committedHeight(sink)),
        "cols=address,owner", sourceKey = dir) { pid =>
        built.incrementAndGet()
        graft.ops.Inventory.readStatePart(spark, dir, pid)
          .select(col("address"), col("last_owner"))
      }.count()
      finally spark.conf.unset(ArtifactStore.RootConf)
    }
    serve()
    val builds1 = built.get()
    val parts1 = graft.ops.Inventory.committedStateParts(spark, dir,
      BlockIngest.committedHeight(sink)).toMap
    assert(builds1 === parts1.size, "first serve builds every bucket")
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(41L, 60L)), sink)
    val h2 = BlockIngest.committedHeight(sink)
    val parts2 = graft.ops.Inventory.committedStateParts(spark, dir, h2)
    val changed = parts2.count { case (pid, _) => !parts1.contains(pid) }
    serve()
    assert(built.get() - builds1 === changed,
      s"the second serve must rebuild exactly the ${changed} touched " +
        s"buckets (got ${built.get() - builds1})")
    // the served rows == the committed view's projection
    assert(serve() === graft.ops.Inventory
      .readBucketedStateAt(spark, dir, h2).count())
  }

  test("delta rebuild over the ingested table: an appended batch " +
    "rebuilds ONLY its own partitions (build count pinned), the " +
    "served artifact equals the inline per-block rollup") {
    val sink = Files.createTempDirectory("fp_delta").toString
    val root = Files.createTempDirectory("fp_delta_root").toString
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(1L, 40L)), sink)
    val built = new java.util.concurrent.atomic.AtomicInteger(0)
    def serve(): Map[(Long, String), Long] = {
      spark.conf.set(ArtifactStore.RootConf, root)
      try ArtifactStore.buildOrServeParts(spark, "txn_type_counts",
        BlockIngest.factParts(sink, "transactions"), "by=block,type",
        sourceKey = s"$sink/transactions") { pid =>
        built.incrementAndGet()
        BlockIngest.readFactPart(spark, sink, "transactions", pid)
          .groupBy(col("block"), col("type"))
          .agg(count(lit(1)).as("n"))
      }.collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      finally spark.conf.unset(ArtifactStore.RootConf)
    }
    val v1 = serve()
    val builds1 = built.get()
    assert(builds1 === BlockIngest.factParts(sink, "transactions").size,
      "first serve builds every committed partition once")
    assert(serve() === v1, "re-serve is pure"); assert(built.get() === builds1,
      "a pure re-serve must invoke the builder ZERO times")
    // append 20 more blocks: the rebuild must be delta-sized
    BlockIngest.processBatch(spark,
      blocks.filter(col("height").between(41L, 60L)), sink)
    val parts2 = BlockIngest.factParts(sink, "transactions")
    val v2 = serve()
    assert(built.get() - builds1 === parts2.size - builds1,
      s"appending 20 blocks must rebuild exactly the new partitions " +
        s"(got ${built.get() - builds1} builds for " +
        s"${parts2.size - builds1} new parts)")
    // served == the whole-table rollup, computed directly
    val want = BlockIngest.readFactCommitted(spark, sink, "transactions")
      .groupBy(col("block"), col("type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(v2 === want, "the part-addressed artifact must equal the " +
      "whole-table rollup")
  }
}
