package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-balanced shard assignment (the q97/q122 operator): documents
  * take a deterministic hash order (reproducible across engines and
  * runs), a two-level prefix sum accumulates token counts in that
  * order, and integer division by the per-shard token budget yields
  * the shard id — no global sort at any scale (PrefixSum's bucketed
  * windows + broadcast offsets).
  */
object ShardAssign {

  /** Assign `docs` (needs doc_id, text) to `nShards` token-balanced
    * shards. `extra` columns are computed IN the initial scan and
    * carried through — a manifest hash, for example, costs no second
    * corpus pass and no join back (the q122 lesson).
    */
  def tokenBalanced(docs: DataFrame, nShards: Int,
                    extra: Seq[(String, Column)] = Nil): DataFrame = {
    val h = tokenHash(concat(lit("shard:"), col("doc_id").cast("string")))
    val base = Seq(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"), h.as("h"))
    val t = docs
      .select(base ++ extra.map { case (n, c) => c.as(n) }: _*)
      .withColumn("bucket", floor(col("h") / lit(1L << 24)).cast("long"))
      .localCheckpoint() // window pass + offsets agg share this
    val total = t.agg(sum("n_tokens").as("total"))
    PrefixSum
      .twoLevelPrev(t, Seq(), "bucket", "doc_id", "n_tokens", "h")
      .crossJoin(broadcast(total))
      .withColumn("shard_id",
        expr(s"prev_tokens div greatest(total div $nShards, 1)"))
      .select(col("doc_id") +: col("n_tokens") +: col("prev_tokens") +:
        col("shard_id") +: extra.map { case (n, _) => col(n) }: _*)
  }
}
