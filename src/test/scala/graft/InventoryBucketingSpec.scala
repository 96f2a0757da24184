package graft

import graft.ops.Inventory
import org.apache.spark.sql.functions._

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
}
