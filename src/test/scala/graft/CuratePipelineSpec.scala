package graft

import graft.functions.TextAnalysis._
import graft.ops.CuratePipeline
import org.apache.spark.sql.functions._

/** End-to-end curation invariants: stage monotonicity, exact-dup
  * canonicalization, decontamination completeness, shard balance, and
  * determinism across runs.
  */
class CuratePipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def benchFps = {
    val docs = Tables.documents(spark, dir)
    docs.filter(col("doc_id") % 31 === 0)
      .select(tokens(col("text")).as("toks"))
      .select(gramHashesPositional(col("toks"), 5).as("gh"))
      .select(explode(winnowFingerprints(col("gh"), 4)).as("fp"))
      .distinct()
  }

  private def run() = CuratePipeline.curate(
    Tables.documents(spark, dir).filter(col("doc_id") % 31 =!= 0),
    "doc_id", "text", "lang", benchFps)

  test("stages are monotone and kept == survived-all") {
    val audit = run().localCheckpoint()
    val bad = audit.filter(
      (col("pass_exact") && !col("pass_gate")) ||
        (col("pass_neardup") && !col("pass_exact")) ||
        (col("pass_decon") && !col("pass_neardup")) ||
        (col("pass_mix") && !col("pass_decon")) ||
        (col("kept") =!= (col("pass_mix") && col("shard_id").isNotNull)))
    assert(bad.count() == 0)
    val n = audit.count()
    val kept = audit.filter(col("kept")).count()
    assert(kept > 0 && kept < n, s"degenerate curation: $kept of $n")
  }

  test("exact duplicates keep exactly the minimum id") {
    val audit = run()
    val groups = audit.filter(col("pass_gate"))
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("mn"),
        sum(when(col("pass_exact"), 1).otherwise(0)).as("n_pass"),
        min(when(col("pass_exact"), col("doc_id"))).as("pass_id"))
    assert(groups.filter(col("n_pass") =!= 1).count() == 0)
    assert(groups.filter(col("pass_id") =!= col("mn")).count() == 0)
  }

  test("no kept doc shares a winnow fingerprint with the bench set") {
    val audit = run()
    val keptFps = audit.filter(col("kept"))
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), gramHashesPositional(col("toks"), 5).as("gh"))
      .select(col("doc_id"),
        explode(winnowFingerprints(col("gh"), 4)).as("fp"))
    assert(keptFps.join(benchFps, "fp").count() == 0)
  }

  test("shards are token-balanced within one document of the target") {
    val audit = run().filter(col("kept")).localCheckpoint()
    val total = audit.agg(sum("n_tokens")).head().getLong(0)
    val maxDoc = audit.agg(max("n_tokens")).head().getLong(0)
    val target = math.max(total / 16, 1L)
    val over = audit.groupBy("shard_id").agg(sum("n_tokens").as("t"))
      .filter(col("t") > target + maxDoc)
    assert(over.count() == 0)
  }

  test("curation is deterministic across runs") {
    val a = run().collect().map(_.toString).sorted.toSeq
    val b = run().collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
