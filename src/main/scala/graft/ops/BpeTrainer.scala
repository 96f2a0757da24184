package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Iterative BPE merge training (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) at the
  * token level: each round counts every ADJACENT pair across the
  * corpus (one distributed aggregation — q88's single decision, run k
  * times), picks the most frequent pair deterministically, and applies
  * the merge corpus-wide before the next count.
  *
  * Driver state per round is exactly ONE row (the winning pair) via a
  * bounded TakeOrdered collect — the q30/q95 bounded-collect pattern;
  * the corpus-side work is k scan+aggregate rounds, each
  * `localCheckpoint`ed so round i never re-executes rounds 1..i-1.
  *
  * Merge application uses an engine-portable PADDED-STRING form
  * instead of a per-token array fold: tokens join with TWO spaces and
  * the whole string wraps in single spaces, so every token owns its
  * delimiters and a single literal `replace(" a  b ", " a_b ")` merges
  * ALL occurrences — including back-to-back repeats — with the same
  * greedy left-to-right non-overlapping semantics in Spark and DuckDB
  * (which is also standard BPE apply order). Merged tokens join with
  * U+001F (unit separator): on a general corpus a printable joiner
  * like '_' collides with pre-existing tokens ("a_b" would be
  * indistinguishable from a merged pair, silently corrupting later
  * rounds in a way no oracle can catch because both engines agree),
  * and a C0 control char never survives text extraction. [[train]]
  * still ASSERTS the input is separator-free rather than trusting
  * that argument.
  */
object BpeTrainer {

  /** Joiner between the halves of a merged token — U+001F, outside any
    * plausible token alphabet; training fails fast if the input
    * contains it.
    */
  val Sep = "\u001f"

  /** One selected merge: round number, the winning pair ("a b"), its
    * corpus frequency at decision time, and the merged token ("a_b").
    */
  final case class Merge(iter: Int, pair: String, cnt: Long, merged: String)

  /** " tok1  tok2  tok3 " — each token wrapped in its own delimiters. */
  def padded(toks: Column): Column =
    concat(lit(" "), array_join(toks, "  "), lit(" "))

  /** Inverse of [[padded]] after any number of merges (tokens are then
    * separated by one or two spaces).
    */
  def unpad(p: Column): Column = filter(split(p, " "), t => t =!= lit(""))

  /** Adjacent-pair labels ("a b") of a token array column. */
  def adjacentPairs(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Train the first `k` merges over `textCol` of `docs`. Stops early
    * if the corpus runs out of adjacent pairs.
    */
  def train(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    val toks0 = filter(split(col(textCol), " "), t => t =!= lit(""))
    // separator-freedom assert rides the initial padding scan (no
    // extra pass): any row containing U+001F fails the job with a
    // clear message instead of silently corrupting later merge rounds
    var p = docs.select(
        when(contains(padded(toks0), lit(Sep)),
          raise_error(lit("BpeTrainer: input text contains the merge " +
            "separator U+001F; pre-strip it before training")))
          .otherwise(padded(toks0)).as("p"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var i = 1
    var exhausted = false
    var sinceCp = 0
    while (i <= k && !exhausted) {
      // `toks` MUST be its own projection: adjacentPairs indexes into it
      // per element, and a non-attribute subtree inside the lambda would
      // re-split the padded string once per pair (the PLANS.md
      // re-evaluation trap — measured 28 s vs 3 s for 5 rounds at sf0.1)
      val top = p.select(unpad(col("p")).as("toks"))
        .select(explode(adjacentPairs(col("toks"))).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val merged = pair.replace(" ", Sep)
        merges += Merge(i, pair, cnt, merged)
        val search = " " + pair.replace(" ", "  ") + " "
        p = p.select(replace(col("p"), lit(search), lit(s" $merged "))
          .as("p"))
        // checkpoint POLICY, not per round: a round's scan happily
        // applies a few pending literal replaces inline, so
        // materializing every round paid one Spark job per merge for
        // nothing; every CheckpointEvery rounds bounds the pending
        // chain (round i never re-executes rounds ≤ i−C) — same
        // merges, same oracle, C-invariant by construction
        sinceCp += 1
        if (sinceCp >= CheckpointEvery && i < k) {
          p = p.localCheckpoint(); sinceCp = 0
        }
      }
      i += 1
    }
    merges.result()
  }

  /** Train-loop checkpoint cadence: the padded corpus re-materializes
    * every this-many merges (a pending chain of ≤ this many literal
    * replaces rides each round's scan in between). */
  val CheckpointEvery = 4

  /** [[train]] behind the [[ArtifactStore]] (r12 verdict #1): the
    * trained merge list is a write-once MODEL addressed by the corpus
    * text fingerprint + k — within a sweep the first query touching
    * the tokenizer pays the k driver rounds, every later query (q99/
    * q119/q136 share one model) decodes the committed table, and an
    * in-JVM memo makes repeat serves free. Identical merges either way
    * (training is integer-deterministic and the table round-trips
    * exactly). No artifact root → plain [[train]].
    */
  def trainArtifact(docs: DataFrame, textCol: String, k: Int,
                    fpKey: String): Seq[Merge] = {
    val s = docs.sparkSession
    if (ArtifactStore.root(s).isEmpty) train(docs, textCol, k)
    else {
      val fp = ArtifactStore.fingerprint(docs.select(col(textCol)), fpKey)
      ArtifactStore.buildOrServeModel(s, "bpe_merges", fp, s"k=$k", fpKey)(
        train(docs, textCol, k))(
        ms => {
          import s.implicits._
          ms.map(m => (m.iter, m.pair, m.cnt, m.merged))
            .toDF("iter", "pair", "cnt", "merged")
        },
        df => df.orderBy("iter").collect().toSeq.map(r =>
          Merge(r.getInt(0), r.getString(1), r.getLong(2), r.getString(3))))
    }
  }

  /** Above this merge count, [[applyMerges]] switches from the literal
    * replace chain to the one-pass kernel: a real 32k-merge vocabulary
    * as a 32k-deep replace tree is 32k scans per document and an
    * analyzer-hostile plan, while at demo k the chain is the leaner
    * (join-free, engine-portable) shape.
    */
  val ReplaceChainMaxMerges = 64

  /** Tokenize a padded-string column under an already-trained merge
    * list (BPE apply = replay the merges in training order). Dispatches
    * on merge count — both shapes produce identical token arrays
    * (BpeTrainerSpec pins chain == kernel).
    */
  def applyMerges(toks: Column, merges: Seq[Merge]): Column =
    if (merges.length > ReplaceChainMaxMerges) applyMergesKernel(toks, merges)
    else applyMergesChain(toks, merges)

  /** k sequential padded-string literal replaces — scan-only, mirrors
    * the oracle SQL token for token.
    */
  def applyMergesChain(toks: Column, merges: Seq[Merge]): Column = {
    val p = merges.foldLeft(padded(toks)) { (acc, m) =>
      replace(acc, lit(" " + m.pair.replace(" ", "  ") + " "),
        lit(s" ${m.merged} "))
    }
    unpad(p)
  }

  /** One codegen'd pass with the whole merge table hash-resolved
    * ([[graft.expressions.BpeApplyMerges]]) — the real-vocabulary
    * shape.
    */
  def applyMergesKernel(toks: Column, merges: Seq[Merge]): Column = {
    val lefts = new Array[String](merges.length)
    val rights = new Array[String](merges.length)
    val mergedArr = new Array[String](merges.length)
    merges.zipWithIndex.foreach { case (m, i) =>
      val sp = m.pair.indexOf(' ') // halves are space-free tokens
      lefts(i) = m.pair.substring(0, sp)
      rights(i) = m.pair.substring(sp + 1)
      mergedArr(i) = m.merged
    }
    org.apache.spark.sql.GraftExpr.column(
      graft.expressions.BpeApplyMerges(
        org.apache.spark.sql.GraftExpr.expression(toks),
        new graft.expressions.BpeMergeTable(lefts, rights, mergedArr)))
  }
}
