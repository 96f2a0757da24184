package graft

import graft.ops.Inventory
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** The 100 TB inventory-state path (SURVEY §2.2, PLANS.md): when the
  * state table is bucketed by key, the per-batch merge join consumes
  * the bucketed layout directly — only the (small) batch side shuffles,
  * the (huge) state side never does. This spec pins that plan property
  * so a regression reintroducing the full-state shuffle fails loudly.
  */
class InventoryBucketingSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    "(?m)^[^\\n]*\\bExchange\\b".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("bucketed state side merges without its own shuffle") {
    val state = (1 to 1000).map(i => (s"k$i", i.toLong, s"s$i"))
      .toDF("key", "ver", "status")
    val batch = (500 to 600).map(i => (s"k$i", i.toLong + 1000, s"n$i"))
      .toDF("key", "ver", "status")

    spark.sql("DROP TABLE IF EXISTS inv_state_bucketed")
    Inventory.latestPerKey(state, Seq("key"), "ver", Seq("status"))
      .write.bucketBy(4, "key").sortBy("key")
      .saveAsTable("inv_state_bucketed")
    val bucketed = spark.table("inv_state_bucketed")

    val plain = Inventory.latestPerKey(state, Seq("key"), "ver", Seq("status"))
      .write.mode("overwrite").saveAsTable("inv_state_plain")
    val unbucketed = spark.table("inv_state_plain")

    val mergedB = Inventory.mergeBatch(bucketed, batch, Seq("key"), "ver",
      Seq("status"))
    val mergedU = Inventory.mergeBatch(unbucketed, batch, Seq("key"), "ver",
      Seq("status"))

    // same result either way…
    assert(mergedB.orderBy("key").collect() ===
      mergedU.orderBy("key").collect())
    // …but the bucketed plan shuffles ONE side fewer (the state side
    // reads its buckets in place)
    val (eb, eu) = (exchanges(mergedB), exchanges(mergedU))
    assert(eb < eu, s"bucketed=$eb unbucketed=$eu")
    // and the merged output is correct: updated keys take batch values
    val k550 = mergedB.filter($"key" === "k550").head()
    assert(k550.getAs[String]("last_status") === "n550")
    assert(k550.getAs[Long]("n_rows") === 2L)
  }

  test("bucketed state dir: fold == single-shot, untouched buckets not rewritten") {
    import java.nio.file.{Files, Paths}
    val stateDir = Files.createTempDirectory("bstate").toString + "/state"
    val all = (1 to 300).map(i => (s"k$i", i.toLong, s"s$i"))
      .toDF("key", "ver", "status")
    // three ordered batches
    Seq((1, 100, 10L), (101, 200, 20L), (201, 300, 30L)).foreach {
      case (lo, hi, h) =>
        assert(Inventory.mergeBucketedState(spark, stateDir,
          all.filter($"ver".between(lo, hi)), Seq("key"), "ver",
          Seq("status"), nBuckets = 8, mergedHeight = h))
    }
    val got = Inventory.readBucketedState(spark, stateDir)
    val want = Inventory.latestPerKey(all, Seq("key"), "ver", Seq("status"))
    assert(got.except(want).count() === 0L)
    assert(want.except(got).count() === 0L)

    // record per-bucket file mtimes, then merge a single-key batch
    def mtimes: Map[String, Long] =
      Files.list(Paths.get(stateDir)).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("bucket="))
        .map(p => p.getFileName.toString ->
          Files.list(p).iterator().asScala
            .map(f => Files.getLastModifiedTime(f).toMillis).max)
        .toMap
    val before = mtimes
    Thread.sleep(1100) // parquet mtime granularity
    val one = Seq(("k42", 999L, "updated")).toDF("key", "ver", "status")
    assert(Inventory.mergeBucketedState(spark, stateDir, one, Seq("key"),
      "ver", Seq("status"), nBuckets = 8, mergedHeight = 40L))
    val after = mtimes
    val changed = after.filter { case (bk, t) => before.get(bk) != Some(t) }
    assert(changed.size === 1, s"exactly one bucket rewritten: $changed")
    // the single-key update landed
    val k42 = Inventory.readBucketedState(spark, stateDir)
      .filter($"key" === "k42").head()
    assert(k42.getAs[String]("last_status") === "updated")
    assert(k42.getAs[Long]("n_rows") === 2L)
    // per-bucket replay guard: same height again -> no-op
    assert(!Inventory.mergeBucketedState(spark, stateDir, one, Seq("key"),
      "ver", Seq("status"), nBuckets = 8, mergedHeight = 40L))
    assert(Inventory.readBucketedState(spark, stateDir)
      .filter($"key" === "k42").head().getAs[Long]("n_rows") === 2L)
  }
}
