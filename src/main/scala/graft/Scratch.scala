package graft

import graft.functions.TextAnalysis._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway perf-breakdown harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[scratch] $name%-20s ${(System.nanoTime() - t0) / 1e9}%.2fs n=$n")
    }
    // warm
    docs.count()
    val base = docs.select(col("doc_id"), col("text")).repartition(32)
    t("tokens")(base.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(sum(size(col("toks")))).collect()(0).getLong(0))
    val toksDf = base.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
    t("shingles3")(toksDf.select(sum(size(shingles3(col("toks")))))
      .collect()(0).getLong(0))
    t("shingleHashes")(toksDf.select(sum(size(shingleHashes(col("toks")))))
      .collect()(0).getLong(0))
    t("shingleHashes2")(toksDf.select(sum(size(shingleHashes(col("toks")))))
      .collect()(0).getLong(0))
    val sig = toksDf.select(col("doc_id"),
      array_sort(shingleHashes(col("toks"))).as("hs")).localCheckpoint()
    t("sigCheckpointed")(sig.count())
    val exploded = sig.select(col("doc_id"), explode(col("hs")).as("tok"))
    t("explode")(exploded.count())
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    t("freq")(freq.count())
    val ranked = exploded.join(freq, "tok").groupBy("doc_id")
      .agg(transform(sort_array(collect_list(
        struct(col("df"), col("tok")))), x => x("tok")).as("hsr"))
    t("ranked")(ranked.count())
    val rankedCp = ranked.localCheckpoint()
    t("rankedCp2")(rankedCp.count())
    spark.stop()
  }
}
