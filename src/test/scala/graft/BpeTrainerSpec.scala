package graft

import graft.ops.BpeTrainer
import org.apache.spark.sql.functions._

/** BPE trainer semantics on hand-checkable corpora: merge selection
  * order (count desc, pair asc), greedy left-to-right application
  * including back-to-back repeats, and apply == replay-of-training.
  */
class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  private val S = BpeTrainer.Sep

  test("merge selection follows count desc then pair asc; merges chain") {
    val docs = Seq("x y x y z", "x y q").toDF("text")
    val merges = BpeTrainer.train(docs, "text", k = 2)
    // round 1: "x y" appears 3 times (twice in doc 1, once in doc 2)
    assert(merges(0).pair == "x y" && merges(0).cnt == 3L &&
      merges(0).merged == s"x${S}y")
    // round 2 corpus: [x⟂y x⟂y z], [x⟂y q] — pairs "x⟂y x⟂y", "x⟂y z",
    // "x⟂y q" all count 1; tie-break picks "x⟂y q" (lexicographic:
    // first differing char is 'q' < 'x' < 'z')
    assert(merges(1).pair == s"x${S}y q" && merges(1).cnt == 1L)
  }

  test("back-to-back repeats merge greedily left-to-right") {
    val docs = Seq("a a a", "a a b a a b").toDF("text")
    val merges = BpeTrainer.train(docs, "text", k = 1)
    assert(merges(0).pair == "a a") // 2 in doc1 (overlapping → counted 2) + 2 in doc2
    val applied = docs.select(BpeTrainer.applyMerges(
        filter(split(col("text"), " "), t => t =!= lit("")), merges).as("t"))
      .collect().map(_.getSeq[String](0)).toSeq
    // greedy left-to-right: [a a a] -> [a⟂a, a]; [a a b a a b] -> [a⟂a, b, a⟂a, b]
    assert(applied == Seq(Seq(s"a${S}a", "a"),
      Seq(s"a${S}a", "b", s"a${S}a", "b")))
  }

  test("train stops when the corpus runs out of pairs") {
    val docs = Seq("solo").toDF("text")
    assert(BpeTrainer.train(docs, "text", k = 3).isEmpty)
  }

  test("a corpus already containing the separator fails fast") {
    val docs = Seq("a " + S + " b").toDF("text")
    val e = intercept[Exception] { BpeTrainer.train(docs, "text", k = 1) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq() else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("separator")))
  }
}
