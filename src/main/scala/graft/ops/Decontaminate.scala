package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** THE decontamination probe — the single implementation behind the
  * q93 batch query, CuratePipeline's decon stage, and
  * StreamDecontaminate's per-micro-batch filter: winnowing
  * fingerprints of each doc, broadcast join against the benchmark
  * fingerprint set, per-doc shared-fingerprint count. Any doc sharing
  * a verbatim run of >= w+k-1 tokens with the bench set is flagged
  * (the winnowing guarantee). Stateless membership against a static
  * set: no shuffle of the corpus side beyond the per-doc count, no
  * state, idempotent under replay.
  */
object Decontaminate {

  /** @return (idCol, n_shared, contaminated) for every input doc */
  def flag(docs: DataFrame, idCol: String, textCol: String,
           benchFps: DataFrame, k: Int = 5, w: Int = 4): DataFrame = {
    // gram hashes materialized as their own projection: the winnowing
    // window lambda indexes into them per element (PLANS.md
    // re-evaluation trap)
    val fps = docs
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), gramHashesPositional(col("toks"), k).as("gh"))
      .select(col(idCol),
        explode(winnowFingerprints(col("gh"), w)).as("fp"))
    val hits = fps.join(broadcast(benchFps.select(col("fp")).distinct()), "fp")
      .groupBy(idCol).agg(count(lit(1)).as("n_shared"))
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }

  /** Winnowing fingerprint set of a doc table (the bench-side helper
    * shared by the probe's callers).
    */
  def fingerprintSet(docs: DataFrame, textCol: String,
                     k: Int = 5, w: Int = 4): DataFrame =
    docs.select(tokens(col(textCol)).as("toks"))
      .select(gramHashesPositional(col("toks"), k).as("gh"))
      .select(explode(winnowFingerprints(col("gh"), w)).as("fp"))
      .distinct()
}
