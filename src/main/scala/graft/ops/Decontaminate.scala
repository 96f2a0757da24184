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

  /** The corpus-side INDEX rows: per-doc winnowing fingerprints
    * (doc_id, fp) — q92's output, and the thing worth persisting: at
    * 100 TB the tokenize+winnow pass over the corpus is the dominant
    * cost of EVERY decontamination question, and it is the same rows
    * every time. Docs shorter than k tokens contribute no rows (no
    * gram exists — the q92 shape). */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 5, w: Int = 4): DataFrame =
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), gramHashesPositional(col("toks"), k).as("gh"))
      .select(col("doc_id"),
        explode(winnowFingerprints(col("gh"), w)).as("fp"))

  /** [[fingerprints]] as a write-once ARTIFACT (ops/ArtifactStore),
    * addressed by the corpus content fingerprint: with a configured
    * root the corpus-wide tokenize+winnow pass runs ONCE per corpus —
    * every later decon query (flagging, span location, scorecards)
    * serves a (doc_id, fp) parquet scan. With no root, inline — the
    * historical shape, byte-identical rows. */
  def fingerprintsArtifact(docs: DataFrame, idCol: String,
                           textCol: String, fpKey: String,
                           k: Int = 5, w: Int = 4): DataFrame = {
    val s = docs.sparkSession
    if (ArtifactStore.root(s).isEmpty) fingerprints(docs, idCol, textCol, k, w)
    else ArtifactStore.buildOrServe(s, "winnow_fps",
      ArtifactStore.fingerprint(
        docs.select(col(idCol), col(textCol)), fpKey),
      s"k=$k,w=$w", fpKey)(
      fingerprints(docs, idCol, textCol, k, w))
  }

  /** [[flag]] over PRECOMPUTED index rows — the serving-path probe:
    * `fps` is (doc_id, fp) (an artifact scan or a maintained store's
    * fold), `benchFps` the benchmark fingerprint set, `allIds` the
    * full id universe of the probed corpus (winnowing drops sub-k-token
    * docs from the index, and they must still report n_shared = 0).
    * Same output contract as [[flag]]. */
  def flagFromIndex(allIds: DataFrame, fps: DataFrame,
                    benchFps: DataFrame): DataFrame = {
    val hits = fps
      .join(broadcast(benchFps.select(col("fp")).distinct()), "fp")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    allIds.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("contaminated", col("n_shared") > 0)
  }
}
