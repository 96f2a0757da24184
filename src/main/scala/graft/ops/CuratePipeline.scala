package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composition the individual
  * operators exist for, in the order production pipelines run them
  * (cheapest-first so each stage shrinks the next stage's input):
  *
  *   1. clean: PII redaction (scan-only)
  *   2. gate: length + repetition heuristics (scan-only)
  *   3. exact dedup: keep the minimum-id doc per content hash
  *   4. near-dup dedup: MinHash-LSH pairs closed into connected
  *      components, keep the minimum-id doc per cluster
  *   5. decontaminate: drop docs sharing a winnowing fingerprint with
  *      the benchmark set
  *   6. mix: temperature-based language rebalancing (salted hash, RNG-free)
  *   7. shard: token-balanced shard assignment in deterministic order
  *
  * Every stage is one of the verified operators (q80/q74/q24/q25+q69/
  * q93/q83/q97); this wrapper only sequences them. The audit frame
  * records per-stage survival so corpus-loss reviews don't need to
  * re-run stages. Determinism: no stage uses RNG or wall-clock, so the
  * same inputs give byte-identical outputs on any cluster layout.
  */
object CuratePipeline {

  final case class Config(
      minTokens: Int = 8,
      maxDup3Ratio: Double = 0.5,
      nearDupBands: Int = 12,
      nearDupRows: Int = 2,
      nearDupThreshold: Double = 0.8,
      winnowK: Int = 5,
      winnowW: Int = 4,
      alpha: Double = 0.5,
      shards: Int = 16)

  /** Returns the audit frame: one row per INPUT doc with the redacted
    * text and boolean per-stage survival columns; the curated corpus is
    * `.filter(col("kept"))` plus the emitted shard id.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             langCol: String, benchFps: DataFrame,
             cfg: Config = Config()): DataFrame = {
    val id = col(idCol)

    // 1-2: clean + gate, one scan
    val cleaned = docs.select(id, col(langCol).as("lang"),
        redactPii(col(textCol)).as("text"))
      .withColumn("toks", tokens(col("text")))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("dup3",
        when(col("n_tokens") - 2 <= 0, lit(0.0))
          .otherwise(lit(1.0) -
            size(ngramHashes(col("toks"), 3)).cast("double") /
              (col("n_tokens") - 2).cast("double")))
      .withColumn("pass_gate",
        col("n_tokens") >= cfg.minTokens && col("dup3") <= cfg.maxDup3Ratio)
      .localCheckpoint() // feeds every later stage
    val gated = cleaned.filter(col("pass_gate"))

    // 3: exact dedup (survivor = min id per content hash)
    val exactKeep = gated
      .groupBy(md5(col("text")).as("h")).agg(min(id).as(idCol))
      .select(id, lit(true).as("pass_exact"))

    // 4: near-dup clusters over exact survivors, keep cluster minimum.
    // exactDocs/nearDocs/cleanDocs are each read 2-3 times downstream
    // (next stage + audit join) — materialized like `cleaned`, or the
    // audit frame re-executes every earlier join per stage (the
    // PLANS.md self-join re-execution trap).
    val exactDocs = gated.join(exactKeep.select(id), Seq(idCol))
      .localCheckpoint()
    val pairs = Dedup.nearDupMinhash(exactDocs, idCol, "text",
      cfg.nearDupBands, cfg.nearDupRows, cfg.nearDupThreshold)
    val comp = ConnectedComponents.run(pairs, "doc_a", "doc_b")
      .withColumnRenamed("node", idCol)
    val nearKeep = exactDocs.select(id)
      .join(comp, Seq(idCol), "left")
      .filter(coalesce(col("component"), id) === id)
      .select(id, lit(true).as("pass_neardup"))

    // 5: decontamination — THE shared probe (ops.Decontaminate, also
    // behind q93 and the streaming filter)
    val nearDocs = exactDocs.join(nearKeep.select(id), Seq(idCol))
      .localCheckpoint()
    val cleanKeep = Decontaminate.flag(
        nearDocs.select(id, col("text")), idCol, "text", benchFps,
        cfg.winnowK, cfg.winnowW)
      .filter(!col("contaminated"))
      .select(id, lit(true).as("pass_decon"))

    // 6: temperature rebalance over the clean survivors (rates derived
    // from THIS corpus, q83's arithmetic)
    val cleanDocs = nearDocs.join(cleanKeep.select(id), Seq(idCol))
      .localCheckpoint()
    val counts = cleanDocs.groupBy("lang").agg(count(lit(1)).as("n"))
    val minN = counts.agg(min("n").as("mn"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("lang"),
        floor(pow(col("mn").cast("double") / col("n").cast("double"),
          cfg.alpha) * 1000000).cast("long").as("rate_ppm"))
    val mixKeep = cleanDocs
      .join(broadcast(rates), "lang")
      .filter(tokenHash(concat(lit("cur:"), id.cast("string"))) % 1000000 <
        col("rate_ppm"))
      .select(id, lit(true).as("pass_mix"))

    // 7: shard assignment over the final corpus (q97's two-level order)
    val finalDocs = cleanDocs.join(mixKeep.select(id), Seq(idCol))
      .select(id, col("n_tokens"),
        tokenHash(concat(lit("shard:"), id.cast("string"))).as("h"))
      .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
      .localCheckpoint()
    val total = finalDocs.agg(sum("n_tokens").as("total"))
    val sharded = PrefixSum
      .twoLevelPrev(finalDocs, Seq(), "bucket", idCol, "n_tokens", "h")
      .crossJoin(broadcast(total))
      .withColumn("shard_id", expr(
        s"prev_tokens div greatest(total div ${cfg.shards}, 1)"))
      .select(id, col("shard_id"))

    // audit frame: every input doc, per-stage survival, final shard
    cleaned.select(id, col("lang"), col("text"), col("n_tokens"),
        col("pass_gate"))
      .join(exactKeep, Seq(idCol), "left")
      .join(nearKeep, Seq(idCol), "left")
      .join(cleanKeep, Seq(idCol), "left")
      .join(mixKeep, Seq(idCol), "left")
      .join(sharded, Seq(idCol), "left")
      .select(id, col("lang"), col("text"), col("n_tokens"),
        col("pass_gate"),
        coalesce(col("pass_exact"), lit(false)).as("pass_exact"),
        coalesce(col("pass_neardup"), lit(false)).as("pass_neardup"),
        coalesce(col("pass_decon"), lit(false)).as("pass_decon"),
        coalesce(col("pass_mix"), lit(false)).as("pass_mix"),
        col("shard_id"))
      .withColumn("kept", col("shard_id").isNotNull)
  }
}
