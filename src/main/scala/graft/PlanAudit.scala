package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the flagship queries — the
  * plan-quality audit loop (pushdown reaching scans, broadcast vs
  * sort-merge choices, codegen coverage, shuffle counts).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSet
      else Set("q1_agg", "q2_filter_project", "q3_join_agg", "q7_latest_per_key",
        "q25_neardup_minhash", "q29_embed_neardup", "q32_actor_extract",
        "q36_rewards_rollup")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (names(name)) {
        println(s"\n===== $name =====")
        try println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        catch { case e: Throwable => println(s"explain failed: $e") }
      }
    }
    spark.stop()
  }
}
