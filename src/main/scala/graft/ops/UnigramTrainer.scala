package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (the SentencePiece algorithm family, Kudo
  * 2018) — the third real-world tokenizer next to frequency-ranked BPE
  * ([[BpeTrainer]]) and likelihood-ranked WordPiece: pieces carry
  * -ln(p) costs and a word's tokenization is its MINIMUM-COST
  * segmentation over the piece vocabulary, found by Viterbi DP.
  *
  * Scale shape — the whole trainer is VOCABULARY-sized: the corpus is
  * touched exactly once (word counts); seed-piece enumeration,
  * costing, the Viterbi lattice and the path recovery all run on the
  * distinct-words table. The DP needs no UDF and no recursion
  * primitive: word length is capped at [[MaxWordLen]], so Viterbi is
  * [[MaxWordLen]] staged joins (dp(j) = min over lattice edges ending
  * at j of dp(i) + cost), and path recovery is [[MaxWordLen]] more
  * backpointer joins — every stage a vocab-sized equi join, mirrored
  * verbatim in the DuckDB oracle. Applying the tokenizer corpus-wide
  * is then one broadcast join (word → its segmentation), the same
  * "model is small, corpus passes once" contract as q209.
  *
  * Determinism: costs are integer milli-nats
  * (floor(1000·ln(totF)) − floor(1000·ln(freq))), and the DP minimizes
  * the TOTAL-ordered struct (cost, start, piece), so the selected path
  * is unique and bit-identical across engines.
  */
object UnigramTrainer {

  /** Words longer than this are excluded from training (and from the
    * fertility audit) — the DP stage count is this bound. Real
    * SentencePiece caps candidate lengths the same way.
    */
  val MaxWordLen = 12

  /** Maximum seed-piece length: candidates are all substrings up to
    * this length.
    */
  val MaxPieceLen = 4

  /** Multi-char seed pieces kept (by corpus frequency, piece
    * tie-break); single-char pieces are ALWAYS kept so every word
    * stays segmentable.
    */
  val SeedMulti = 48

  /** (word, cnt) over the corpus — the ONE corpus-scale pass. */
  def wordCounts(docs: DataFrame, toks: org.apache.spark.sql.Column)
  : DataFrame =
    docs.select(explode(toks).as("word"))
      .filter(length(col("word")).between(1, MaxWordLen))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** All (word, i, j, piece) substring occurrences with
    * j − i ≤ [[MaxPieceLen]] (i = 0-based start, j = end, 1-based
    * exclusive/inclusive as substr positions) — the Viterbi lattice
    * before costing. Vocab-sized × O(len·MaxPieceLen) rows.
    */
  def substrings(words: DataFrame): DataFrame =
    words
      .select(col("word"),
        explode(sequence(lit(0), length(col("word")) - 1)).as("i"))
      .select(col("word"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("i")))).as("l"))
      .select(col("word"), col("i"), (col("i") + col("l")).as("j"),
        col("word").substr(col("i") + 1, col("l")).as("piece"))

  /** Seed vocabulary: (piece, freq, cost_milli). freq weights each
    * occurrence by its word's corpus count; cost is the integer
    * milli-nat -ln(freq/totF) over the SELECTED set.
    */
  def seedPieces(words: DataFrame): DataFrame = {
    val freq = substrings(words).join(words, "word")
      .groupBy("piece").agg(sum("cnt").as("f"))
      .localCheckpoint() // singles + top-multi + totals share it
    val singles = freq.filter(length(col("piece")) === 1)
    val multi = freq.filter(length(col("piece")) >= 2)
      .orderBy(col("f").desc, col("piece")).limit(SeedMulti)
    val sel = singles.union(multi).localCheckpoint()
    val tot = sel.agg(sum("f").as("tf"))
    sel.crossJoin(broadcast(tot))
      .select(col("piece"), col("f").as("freq"),
        (floor(lit(1000.0) * log(col("tf").cast("double"))).cast("long") -
          floor(lit(1000.0) * log(col("f").cast("double"))).cast("long"))
          .as("cost_milli"))
  }

  /** [[segment]] as ONE map pass: the piece table is vocab-sized
    * (singles + [[SeedMulti]] multis — a bounded model collect, the
    * BPE-merge-table pattern), so the whole DP runs per row inside the
    * codegen'd [[graft.expressions.ViterbiSegment]] kernel instead of
    * 2·[[MaxWordLen]] vocab-sized staged joins (+ their per-stage
    * checkpoints). Identical (word, piece) multiset — same lattice,
    * same total-ordered (cost, bi, bp) tie-break, strings compared as
    * binary UTF-8 like the struct min — pinned by UnigramTrainerSpec.
    */
  def segmentKernel(words: DataFrame, pieces: DataFrame): DataFrame = {
    val rows = pieces.select(col("piece"), col("cost_milli")).collect()
    val table = new graft.expressions.PieceCostTable(
      rows.map(_.getString(0)), rows.map(_.getLong(1)))
    words.select(col("word"), explode(
        org.apache.spark.sql.GraftExpr.column(
          graft.expressions.ViterbiSegment(
            org.apache.spark.sql.GraftExpr.expression(col("word")),
            table))).as("piece"))
  }

  /** Minimum-cost segmentation of every word: returns (word, piece)
    * rows with multiplicity — the Viterbi path under `pieces`
    * costs. [[MaxWordLen]] DP stages + [[MaxWordLen]] backpointer
    * stages, all vocab-sized joins. (The serving path uses
    * [[segmentKernel]]; this staged-join form is the engine-mirrored
    * shape the oracle unrolls and the spec pins the kernel against.)
    */
  def segment(words: DataFrame, pieces: DataFrame): DataFrame = {
    val e = substrings(words)
      .join(broadcast(pieces.select(col("piece"),
        col("cost_milli").as("c"))), "piece")
      .select(col("word"), col("i").cast("long").as("i"),
        col("j").cast("long").as("j"), col("piece"), col("c"))
      .localCheckpoint() // every DP stage probes it
    // dp rows: (word, pos, cost, bi, bp) — best cost to reach pos,
    // with backpointer (bi = previous pos, bp = piece consumed);
    // min over the TOTAL-ordered (cost, bi, bp) struct keeps the
    // selected path unique
    var dp = words.select(col("word"), lit(0L).as("pos"),
      lit(0L).as("cost"), lit(-1L).as("bi"), lit("").as("bp"))
    for (j <- 1 to MaxWordLen) {
      val prev = dp.select(col("word").as("pword"),
        col("pos").as("ppos"), col("cost").as("pcost"))
      val step = e.filter(col("j") === j)
        .join(prev, col("word") === col("pword") &&
          col("i") === col("ppos"))
        .groupBy("word")
        .agg(min(struct((col("pcost") + col("c")).as("cost"),
          col("i").as("bi"), col("piece").as("bp"))).as("m"))
        .select(col("word"), lit(j.toLong).as("pos"),
          col("m.cost").as("cost"), col("m.bi").as("bi"),
          col("m.bp").as("bp"))
      dp = dp.union(step).localCheckpoint()
    }
    // path recovery: start at pos = len(word), walk backpointers to 0
    var cur = dp
      .join(words.select(col("word"),
        length(col("word")).cast("long").as("n")), "word")
      .filter(col("pos") === col("n") && col("pos") > 0)
      .select(col("word"), col("pos"), col("bi"), col("bp"))
      .localCheckpoint()
    var out = cur.select(col("word"), col("bp").as("piece"))
    for (_ <- 2 to MaxWordLen) {
      cur = cur.select(col("word").as("bword"), col("bi").as("bpos"))
        .join(dp, col("word") === col("bword") &&
          col("pos") === col("bpos"))
        .filter(col("pos") > 0)
        .select(col("word"), col("pos"), col("bi"), col("bp"))
        .localCheckpoint() // words drop out as they reach pos 0
      out = out.union(cur.select(col("word"), col("bp").as("piece")))
    }
    out
  }
}
