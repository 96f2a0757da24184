package graft

import graft.streaming.BlockIngest
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Commit-manifest time travel: `readCommittedAt` resolves the
  * snapshot a reader at that height saw, and the `retainCommits`
  * retention keeps the pinned inventory/stats versions alive across
  * the window (retainCommits = 1 reproduces the original
  * keep-only-newest vacuum, under which superseded versions are
  * gone).
  */
class TimeTravelSpec extends SparkSpec {

  private val streamDir = "/root/repo/fixtures/stream"

  private def ingest3(retain: Int): String = {
    val sink = Files.createTempDirectory(s"tt$retain").toString
    val blocks = spark.read.schema(BlockIngest.blockSchema)
      .json(s"$streamDir/blocks.jsonl")
    Seq((1L, 20L), (21L, 40L), (41L, 60L)).foreach { case (lo, hi) =>
      BlockIngest.processBatch(spark,
        blocks.filter(col("height").between(lo, hi)), sink,
        retainCommits = retain)
    }
    sink
  }

  test("retained window: every snapshot resolves, at its own height") {
    val sink = ingest3(retain = 3)
    assert(BlockIngest.committedHeight(sink) === 60L)
    // fact table: exact block counts per snapshot; asOf between
    // commits resolves the newest manifest at or below it
    assert(BlockIngest.readCommittedAt(spark, sink, "blocks", 20L)
      .count() === 20L)
    assert(BlockIngest.readCommittedAt(spark, sink, "blocks", 59L)
      .count() === 40L)
    assert(BlockIngest.readCommittedAt(spark, sink, "blocks", 60L)
      .count() === 60L)
    // MVCC inventory: the height-20 snapshot must know nothing past
    // block 20, and be a strict prefix of the final state
    val inv20 = BlockIngest.readCommittedAt(
      spark, sink, "actor_inventory", 20L)
    val inv60 = BlockIngest.readCommittedAt(
      spark, sink, "actor_inventory", 60L)
    assert(inv20.agg(max("last_block")).head().getLong(0) <= 20L)
    assert(inv60.agg(max("last_block")).head().getLong(0) > 40L)
    assert(inv20.count() <= inv60.count())
    // the travel read must equal a fresh single-batch ingest of the
    // same prefix (snapshot == state-at-that-time, not a projection)
    val ref = Files.createTempDirectory("ttref").toString
    val blocks = spark.read.schema(BlockIngest.blockSchema)
      .json(s"$streamDir/blocks.jsonl")
    BlockIngest.processBatch(spark,
      blocks.filter(col("height") <= 20L), ref)
    val refInv = BlockIngest.readCommitted(spark, ref, "actor_inventory")
    assert(inv20.select("actor", "first_block", "last_block", "n_rows")
      .except(refInv.select("actor", "first_block", "last_block", "n_rows"))
      .count() === 0L)
    assert(inv20.count() === refInv.count())
  }

  test("default retention (1): newest resolves, superseded inventory " +
    "versions are vacuumed out from under old manifests") {
    val sink = ingest3(retain = 1)
    // newest snapshot: fine
    assert(BlockIngest.readCommitted(spark, sink, "blocks").count() === 60L)
    assert(BlockIngest.readCommittedAt(spark, sink, "actor_inventory", 60L)
      .count() > 0L)
    // height-20 manifest still exists, but its pinned inventory bucket
    // versions were superseded and vacuumed — the travel read fails
    // loudly rather than returning wrong data
    intercept[Exception] {
      BlockIngest.readCommittedAt(spark, sink, "actor_inventory", 20L)
        .count()
    }
  }
}
