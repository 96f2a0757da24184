package graft

import graft.streaming.BlockIngest
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Incremental counter stats: the additive per-batch form must equal a
  * full recompute, and a replayed batch must not double-count.
  */
class IngestStatsSpec extends SparkSpec {

  test("additive stats across two ordered batches == recompute; replay is a no-op") {
    val sink = Files.createTempDirectory("ingest_stats").toString
    val blocks = spark.read.schema(BlockIngest.blockSchema)
      .json("/root/repo/fixtures/stream")
    val b1 = blocks.filter(col("height") <= 30)
    val b2 = blocks.filter(col("height") > 30)
    BlockIngest.processBatch(spark, b1, sink)
    BlockIngest.processBatch(spark, b2, sink)

    def stats(): Map[String, Long] =
      spark.read.parquet(s"$sink/stats_inventory").collect()
        .map(r => r.getAs[String]("name") -> r.getAs[Long]("value")).toMap

    val s1 = stats()
    val txns = spark.read.parquet("/root/repo/fixtures/transactions.parquet")
    assert(s1("blocks") === 60L)
    assert(s1("transactions") === txns.count())
    assert(s1("consensus_groups") ===
      txns.filter(col("type") === "consensus_group_v1").count())
    assert(s1("challenges") ===
      txns.filter(col("type") === "poc_request_v1").count())

    // replaying an already-committed batch leaves every counter alone
    BlockIngest.processBatch(spark, b2, sink)
    assert(stats() === s1)
  }
}
