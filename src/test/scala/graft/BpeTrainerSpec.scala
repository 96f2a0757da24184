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

  test("kernel == replace chain on a trained merge list") {
    val corpus = (0 until 60).map { i =>
      (0 until 20).map(j => s"t${(i * 7 + j * 3) % 5}").mkString(" ")
    }
    val docs = corpus.toDF("text")
    val merges = BpeTrainer.train(docs, "text", k = 8)
    assert(merges.length == 8)
    val toks = filter(split(col("text"), " "), t => t =!= lit(""))
    val got = docs
      .select(BpeTrainer.applyMergesChain(toks, merges).as("chain"),
        BpeTrainer.applyMergesKernel(toks, merges).as("kernel"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
  }

  test("kernel == replace chain at k >= 256 (the real-vocabulary " +
    "regime the chain cannot reach)") {
    // a 256-deep replace tree is still analyzable, barely — build a
    // synthetic but REPLAYABLE merge list instead of training 256
    // rounds: every pair's halves exist before its rank (layer 1 pairs
    // base tokens, layer 2 pairs layer-1 outputs with base tokens),
    // which is the applyMerges precondition
    val base = (0 until 16).map(i => s"b$i")
    val layer1 = (for {
      i <- 0 until 16; j <- 0 until 16 if i != j
    } yield (base(i), base(j))).take(220)
    val layer2 = (0 until 36).map { i =>
      val (l, r) = layer1(i * 5)
      (l + S + r, base((i * 11) % 16))
    }
    val merges = (layer1 ++ layer2).zipWithIndex.map { case ((l, r), i) =>
      BpeTrainer.Merge(i + 1, s"$l $r", 1L, l + S + r)
    }
    assert(merges.length == 256)
    val rnd = new scala.util.Random(7)
    val docs = (0 until 120).map { _ =>
      (0 until 40).map(_ => base(rnd.nextInt(16))).mkString(" ")
    }.toDF("text")
    val toks = filter(split(col("text"), " "), t => t =!= lit(""))
    val got = docs
      .select(BpeTrainer.applyMergesChain(toks, merges).as("chain"),
        BpeTrainer.applyMergesKernel(toks, merges).as("kernel"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // dispatch: a 256-entry list takes the kernel path
    assert(merges.length > BpeTrainer.ReplaceChainMaxMerges)
  }
}
