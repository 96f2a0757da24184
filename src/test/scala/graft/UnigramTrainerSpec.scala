package graft

import graft.functions.TextAnalysis
import graft.ops.UnigramTrainer
import org.apache.spark.sql.functions._

/** Pins for the q212/q213 trainer: the staged-join Viterbi finds the
  * true minimum-cost segmentation (checked against brute-force
  * enumeration), paths exactly cover their word, and multi-char
  * pieces beat single chars where the costs say they should.
  */
class UnigramTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("staged-join Viterbi == brute-force minimum-cost segmentation " +
    "for every distinct word") {
    val docs = Seq(
      "abab cdcd abab ee abcd abab cdcd xyz zzzz",
      "abab ee xyz abcd statement merge merge state",
      "statement state merge abab").toDF("text")
    val words = UnigramTrainer
      .wordCounts(docs, TextAnalysis.tokens(col("text"))).localCheckpoint()
    val pieces = UnigramTrainer.seedPieces(words).localCheckpoint()
    val cost = pieces.as[(String, Long, Long)].collect()
      .map { case (p, _, c) => p -> c }.toMap
    val byWord = UnigramTrainer.segment(words, pieces)
      .as[(String, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSeq).toMap

    def brute(w: String): Long = {
      val memo = collection.mutable.Map[Int, Long]()
      def dp(i: Int): Long = if (i == 0) 0L
      else memo.getOrElseUpdate(i,
        (1 to math.min(UnigramTrainer.MaxPieceLen, i)).flatMap { l =>
          cost.get(w.substring(i - l, i)).map(c => dp(i - l) + c)
        }.min)
      dp(w.length)
    }

    val wordList = words.as[(String, Long)].collect().map(_._1)
    assert(wordList.nonEmpty && byWord.keySet == wordList.toSet,
      "some word has no Viterbi path")
    wordList.foreach { w =>
      val ps = byWord(w)
      assert(ps.map(_.length).sum == w.length,
        s"'$w' pieces don't cover the word: $ps")
      assert(ps.map(cost).sum == brute(w),
        s"'$w' path cost ${ps.map(cost).sum} != brute ${brute(w)}: $ps")
    }
  }

  test("kernel segmentation == staged-join segmentation, exactly " +
    "(same pieces per word, multiset-identical)") {
    val docs = Seq(
      "abab cdcd abab ee abcd abab cdcd xyz zzzz",
      "abab ee xyz abcd statement merge merge state",
      "statement state merge abab tie tiebreak break ababab").toDF("text")
    val words = UnigramTrainer
      .wordCounts(docs, TextAnalysis.tokens(col("text"))).localCheckpoint()
    val pieces = UnigramTrainer.seedPieces(words).localCheckpoint()
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String)].collect().toSeq.sorted
    assert(multiset(UnigramTrainer.segmentKernel(words, pieces)) ===
      multiset(UnigramTrainer.segment(words, pieces)),
      "the per-row Viterbi kernel must reproduce the staged-join DP " +
        "verbatim — same lattice, same (cost, bi, bp) tie-break")
  }

  test("a dominant repeated bigram is kept as one piece, not two chars") {
    // 'ab' appears so often its -ln cost undercuts 'a'+'b'
    val docs = Seq(Seq.fill(30)("abab").mkString(" "),
      "cq dq eq fq gq hq iq").toDF("text")
    val words = UnigramTrainer
      .wordCounts(docs, TextAnalysis.tokens(col("text"))).localCheckpoint()
    val pieces = UnigramTrainer.seedPieces(words).localCheckpoint()
    val ababPieces = UnigramTrainer.segment(words, pieces)
      .filter(col("word") === "abab").as[(String, String)].collect()
      .map(_._2).toSeq
    assert(ababPieces.forall(_ == "ab") || ababPieces == Seq("abab"),
      s"'abab' fell back to chars: $ababPieces")
  }

  test("kernel refuses a word past MaxWordLen instead of silently " +
    "diverging from the staged-join contract (r16 advice)") {
    import org.apache.spark.unsafe.types.UTF8String
    val table = new graft.expressions.PieceCostTable(
      Array("a", "b"), Array(1L, 1L))
    val over = "a" * (UnigramTrainer.MaxWordLen + 1)
    val e = intercept[IllegalArgumentException] {
      table.segment(UTF8String.fromString(over))
    }
    assert(e.getMessage.contains("MaxWordLen"),
      s"the refusal must name the cap: ${e.getMessage}")
    // at the cap itself the kernel still segments
    assert(table.segment(UTF8String.fromString(
      "a" * UnigramTrainer.MaxWordLen)).numElements() ===
      UnigramTrainer.MaxWordLen)
  }
}
