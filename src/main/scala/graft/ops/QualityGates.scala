package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The two document-quality screens shared across the query surface —
  * ONE definition each, so operators that reference them (q74, q148,
  * q156's scorecard, q173's kappa) can never drift apart on a
  * threshold tweak.
  */
object QualityGates {

  /** q74's heuristic gate (C4/Gopher-style document rules) as a single
    * boolean Column over (text, n_chars, token-array). Expression
    * shapes are the PLANS.md-vetted forms (closed-form mean token
    * length via array_join, codegen'd regex ratios).
    */
  def heuristicPass(text: Column, nChars: Column, toks: Column): Column = {
    val nTok = size(toks)
    val meanTokLen = length(array_join(toks, ""))
      .cast("double") / nTok.cast("double")
    val symbolRatio = length(regexp_replace(text,
      lit("[A-Za-z0-9 ]"), lit(""))).cast("double") / nChars.cast("double")
    val digitRatio = length(regexp_replace(text,
      lit("[^0-9]"), lit(""))).cast("double") / nChars.cast("double")
    val ttr = size(array_distinct(toks)).cast("double") /
      nTok.cast("double")
    nTok >= 5 && nTok <= 100000 &&
      meanTokLen >= 2.0 && meanTokLen <= 12.0 &&
      symbolRatio < 0.3 && digitRatio < 0.3 && ttr > 0.2
  }

  /** q148's Gopher repetition screen (Rae et al. 2021 §A1.1): per-doc
    * duplicate-2-gram mass and top-unigram mass with the keep flag.
    * Input must carry `doc_id` and a token-array column `toks`;
    * callers checkpoint the input when other subtrees share it. Both
    * per-doc aggregations are map-side-combined groupBys — no windows,
    * no self-joins. Returns (doc_id, n_tok, dup2_milli, top1_milli,
    * keep).
    */
  def gopherRepetition(t: DataFrame): DataFrame = {
    val ua = t.select(col("doc_id"), explode(col("toks")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tok"), max("c").as("top1"))
    val bg = t.select(col("doc_id"),
        explode(when(size(col("toks")) >= 2,
          transform(sequence(lit(1), size(col("toks")) - 1),
            i => concat_ws(" ", element_at(col("toks"), i),
              element_at(col("toks"), i + 1))))
          .otherwise(array().cast("array<string>"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n2"),
        sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup2"))
    ua.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(expr("(1000 * dup2) div n2"), lit(0L)).as("dup2_milli"),
        expr("(1000 * top1) div n_tok").as("top1_milli"))
      .withColumn("keep",
        (col("dup2_milli") <= 200 && col("top1_milli") <= 300)
          .cast("long"))
  }
}
