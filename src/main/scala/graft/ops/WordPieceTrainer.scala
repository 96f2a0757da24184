package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative WordPiece-style merge training (Schuster & Nakajima,
  * "Japanese and Korean Voice Search", ICASSP 2012 — the scoring used
  * by BERT's tokenizer): structurally [[BpeTrainer]]'s loop, but each
  * round picks the pair maximizing the LIKELIHOOD score
  * count(ab) / (count(a) * count(b)) instead of the raw pair count —
  * the unit-normalized form of the corpus-likelihood gain, which
  * prefers pairs whose halves rarely occur apart over pairs that are
  * merely frequent. Run at the token level like [[BpeTrainer]] (the
  * reference corpus is pre-tokenized; the loop shape is identical at
  * the character-within-word level).
  *
  * Determinism across engines: the score is quantized to an exact
  * integer — scoreNano = (1e9 * count(ab)) div (count(a)*count(b)) —
  * so selection is an integer ORDER BY with the pair string as the
  * tie-break; no float comparison ever decides a merge. Bounds: the
  * numerator needs 1e9 * cnt < 2^63 (cnt < 9.2e9 pair instances) and
  * the denominator count(a)*count(b) < 2^63 — both hold to ~10^9
  * token instances per training corpus, and tokenizer training above
  * that runs on a stratified sample (q71) by standard practice, the
  * same note as q99.
  *
  * Scale shape (same contract as [[BpeTrainer.train]]): per round, the
  * corpus-side work is one pair aggregation and one unigram
  * aggregation over a shared checkpointed scan; the score join runs on
  * the AGGREGATED pair/unigram tables (vocabulary-sized, never the
  * corpus); driver state is exactly ONE collected row per round.
  */
object WordPieceTrainer {

  /** One selected merge: round, winning pair ("a b"), its pair count,
    * the quantized likelihood score, and the merged token.
    */
  final case class Merge(iter: Int, pair: String, cnt: Long,
                         scoreNano: Long, merged: String)

  /** Train the first `k` likelihood-scored merges over `textCol`.
    * Stops early if the corpus runs out of adjacent pairs.
    */
  def train(docs: DataFrame, textCol: String, k: Int): Seq[Merge] = {
    import BpeTrainer.{padded, unpad, adjacentPairs, Sep}
    val toks0 = filter(split(col(textCol), " "), t => t =!= lit(""))
    var p = docs.select(
        when(contains(padded(toks0), lit(Sep)),
          raise_error(lit("WordPieceTrainer: input text contains the " +
            "merge separator U+001F; pre-strip it before training")))
          .otherwise(padded(toks0)).as("p"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var i = 1
    var exhausted = false
    var sinceCp = 0
    while (i <= k && !exhausted) {
      // ONE corpus pass per round: the unigram and pair histograms ride
      // a single tagged explode (kind 0 = token, kind 1 = pair label)
      // into one aggregation — the old shape materialized the token
      // arrays and then scanned them twice. The AGGREGATED table is
      // vocabulary-sized; it is checkpointed because the score join
      // references it three times (pairs + both unigram sides).
      // `toks` stays its own projection for the BpeTrainer reason:
      // adjacentPairs indexes per element, and a non-attribute subtree
      // in the lambda would re-split the padded string once per pair.
      val counts = p.select(unpad(col("p")).as("toks"))
        .select(explode(concat(
          transform(col("toks"),
            t => struct(lit(0).as("kind"), t.as("label"))),
          transform(adjacentPairs(col("toks")),
            q => struct(lit(1).as("kind"), q.as("label"))))).as("e"))
        .groupBy(col("e.kind").as("kind"), col("e.label").as("label"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val uni = counts.filter(col("kind") === 0)
        .select(col("label").as("tok"), col("c"))
      val pairs = counts.filter(col("kind") === 1)
        .select(col("label").as("pair"), col("c").as("cnt"))
      // vocabulary-sized join: halves of the pair label resolve to
      // their current unigram counts (a == b pairs see the same count
      // on both sides). The aggregated tables are tiny next to the
      // corpus; broadcast keeps the round's score join shuffle-free.
      val ua = broadcast(uni.select(col("tok").as("a"), col("c").as("ca")))
      val ub = broadcast(uni.select(col("tok").as("b"), col("c").as("cb")))
      val top = pairs
        .withColumn("a", split(col("pair"), " ").getItem(0))
        .withColumn("b", split(col("pair"), " ").getItem(1))
        .join(ua, "a").join(ub, "b")
        .select(col("pair"), col("cnt"),
          expr("(1000000000 * cnt) div (ca * cb)").as("score_nano"))
        .orderBy(col("score_nano").desc, col("pair").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val score = top(0).getLong(2)
        val merged = pair.replace(" ", Sep)
        merges += Merge(i, pair, cnt, score, merged)
        val search = " " + pair.replace(" ", "  ") + " "
        p = p.select(replace(col("p"), lit(search), lit(s" $merged "))
          .as("p"))
        // checkpoint policy, not per round — BpeTrainer.CheckpointEvery
        sinceCp += 1
        if (sinceCp >= BpeTrainer.CheckpointEvery && i < k) {
          p = p.localCheckpoint(); sinceCp = 0
        }
      }
      i += 1
    }
    merges.result()
  }

  /** [[train]] behind the [[ArtifactStore]] — the
    * [[BpeTrainer.trainArtifact]] contract for the likelihood-scored
    * family (q163/q196 share one model per (corpus, k)). */
  def trainArtifact(docs: DataFrame, textCol: String, k: Int,
                    fpKey: String): Seq[Merge] = {
    val s = docs.sparkSession
    if (ArtifactStore.root(s).isEmpty) train(docs, textCol, k)
    else {
      val fp = ArtifactStore.fingerprint(docs.select(col(textCol)), fpKey)
      ArtifactStore.buildOrServeModel(s, "wordpiece_merges", fp,
        s"k=$k", fpKey)(
        train(docs, textCol, k))(
        ms => {
          import s.implicits._
          ms.map(m => (m.iter, m.pair, m.cnt, m.scoreNano, m.merged))
            .toDF("iter", "pair", "cnt", "score_nano", "merged")
        },
        df => df.orderBy("iter").collect().toSeq.map(r =>
          Merge(r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
            r.getString(4))))
    }
  }
}
