package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-internal duplicated-substring detection at k-gram
  * granularity (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better", ACL 2022 — the ExactSubstr operator, here
  * at token-gram resolution instead of a distributed suffix array): a
  * position is DUPLICATED if the k-gram starting there occurs at least
  * twice anywhere in the corpus, including elsewhere in the same
  * document; runs of duplicated positions merge into maximal spans,
  * and excision drops every covered token.
  *
  * Scale shape: the duplicate test is one window count partitioned on
  * the gram hash (each partition is one gram's occurrence list — tiny
  * by construction, the frequency of one specific k-token string) and
  * the span merge is one window partitioned on doc_id (bounded by
  * document length). Nothing driver-side, no self-join: two shuffles
  * total, both on keys whose partitions stay bounded at any corpus
  * size. The gram→positions shuffle is the same volume q70's
  * decontamination probe already pays; hashes are 8 bytes/gram — gram
  * STRINGS never shuffle.
  */
object DupSpans {

  /** Positional k-gram hash stream: (id, pos, ghv), pos 0-based.
    *
    * The explode is the OUTER variant with a null-filter on the
    * GENERATED column, not a plain posexplode: for a non-outer
    * generate, `InferFiltersFromGenerate` adds `size(gh) > 0 AND
    * isnotnull(gh)` above the generate's child and `PushDownPredicates`
    * then pushes it through the projections, inlining the whole
    * gram-hash pipeline into a pre-projection filter with `text`
    * re-split per element — the PLANS.md expensive-filter-pushdown
    * trap, measured 7-9 s vs 0.6 s at sf0.1. The outer generate infers
    * no filter, and the isnotnull guard on `ghv` references a generated
    * attribute, so it cannot be pushed below the generate.
    */
  def gramPositions(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame =
    Dedup.spread(docs.select(col(idCol).as("doc_id"),
        col(textCol).as("__text")))
      .select(col("doc_id"), tokens(col("__text")).as("toks"))
      .select(col("doc_id"), gramHashesPositional(col("toks"), k).as("gh"))
      .select(col("doc_id"), posexplode_outer(col("gh")).as(Seq("pos", "ghv")))
      .filter(col("ghv").isNotNull)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("ghv"))

  /** Start positions whose k-gram occurs >= 2 times corpus-wide
    * (within-document repeats count — self-duplication is still
    * duplication). One shuffle: the count is a window over the gram
    * hash, so the duplicated-set join q70-style would need is fused
    * into the same exchange.
    */
  def dupStarts(positions: DataFrame): DataFrame =
    positions
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("ghv")))
      .filter(col("cnt") >= 2)
      .select(col("doc_id"), col("pos"))

  /** Maximal merged spans over duplicated start positions: a start at
    * p covers tokens [p, p+k-1]; covered ranges that touch or overlap
    * merge. Returns (doc_id, span_start, span_end, span_tokens,
    * n_grams) with inclusive 0-based token bounds.
    */
  def spans(dupStarts: DataFrame, k: Int): DataFrame = {
    val wD = Window.partitionBy("doc_id").orderBy("pos")
    val wPrev = wD.rowsBetween(Window.unboundedPreceding, -1)
    dupStarts
      .withColumn("prev_end", max(col("pos") + (k - 1)).over(wPrev))
      .withColumn("st",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1)
          .otherwise(0))
      .withColumn("gid", sum("st").over(wD))
      .groupBy(col("doc_id"), col("gid"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (k - 1)).as("span_end"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"),
        col("n_grams"))
  }

  /** Token positions covered by any duplicated k-gram: each dup start
    * explodes into its k covered positions, deduplicated. (Equivalent
    * to expanding [[spans]]; computed directly from the starts so the
    * excision path skips the span-merge window.)
    */
  def coveredPositions(dupStarts: DataFrame, k: Int): DataFrame =
    dupStarts
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("cp"))
      .distinct()
}
