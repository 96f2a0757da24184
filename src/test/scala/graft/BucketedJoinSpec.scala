package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located join/aggregation story at 100 TB: two
  * tables bucketed the same way on the join key join WITHOUT any
  * shuffle exchange, and a groupBy on the bucket key aggregates
  * without one — the write-once repartitioning that amortizes every
  * downstream join of a fact table against itself or its satellites.
  * Pinned here as executed-plan contracts on real bucketed parquet
  * (in-memory catalog, bucketBy + sortBy + saveAsTable).
  */
class BucketedJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("co-located bucketed join + bucket-key aggregation run with " +
    "zero shuffle exchanges") {
    val docs = Tables.documents(spark, dir)
    docs.write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("bj_docs")
    docs.select(col("doc_id"), col("lang")).write.mode("overwrite")
      .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("bj_langs")
    // force the shuffle-based join path — broadcast would dodge the
    // exchange for the trivial reason
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bj_docs").join(spark.table("bj_langs"), "doc_id")
      val jPlan = j.queryExecution.executedPlan.toString
      assert(!jPlan.contains("Exchange"),
        s"bucketed join still shuffles:\n$jPlan")
      assert(j.count() == docs.count())

      val g = spark.table("bj_docs").groupBy("doc_id")
        .agg(sum(col("n_chars")).as("nc"))
      val gPlan = g.queryExecution.executedPlan.toString
      assert(!gPlan.contains("Exchange"),
        s"bucket-key aggregation still shuffles:\n$gPlan")
      assert(g.count() == docs.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bj_docs")
      spark.sql("DROP TABLE IF EXISTS bj_langs")
    }
  }
}
