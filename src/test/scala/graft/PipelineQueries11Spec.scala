package graft

import graft.ops.{BpeTrainer, WordPieceTrainer}

import java.nio.file.Files

/** Eleventh query group: WordPiece-vs-BPE selection semantics, the
  * char-entropy quantization on a hand-checkable doc, and the backoff
  * branch of the held-out LM score.
  */
class PipelineQueries11Spec extends SparkSpec {
  import spark.implicits._

  private val S = BpeTrainer.Sep

  test("wordpiece picks the likelihood winner where BPE picks the " +
    "frequency winner") {
    // "a b" is the most FREQUENT pair (3) but its halves are common
    // (a=6, b=3 → score 3e9/18 = 166_666_666); "x y" occurs only
    // twice but its halves never occur apart (x=y=2 → score
    // 2e9/4 = 500_000_000). BPE must take "a b", WordPiece "x y".
    val docs = Seq("a b a b a b", "a c a d a e", "x y", "x y").toDF("text")
    val bpe = BpeTrainer.train(docs, "text", k = 1)
    assert(bpe(0).pair == "a b" && bpe(0).cnt == 3L)
    val wp = WordPieceTrainer.train(docs, "text", k = 2)
    assert(wp(0).pair == "x y" && wp(0).cnt == 2L &&
      wp(0).scoreNano == 500000000L && wp(0).merged == s"x${S}y")
    // round 2: "a b" (3e9/18) ties "a c"/"c a"/"a d"/"d a"/"a e"
    // (1e9/6) at floor 166_666_666 — pair-asc tie-break takes "a b"
    assert(wp(1).pair == "a b" && wp(1).cnt == 3L &&
      wp(1).scoreNano == 166666666L)
  }

  test("wordpiece a==b pair sees the same unigram count on both sides") {
    val docs = Seq("z z z").toDF("text")
    val wp = WordPieceTrainer.train(docs, "text", k = 1)
    // pairs "z z" ×2, z count 3 → score = 2e9/9 = 222_222_222
    assert(wp(0).pair == "z z" && wp(0).cnt == 2L &&
      wp(0).scoreNano == 222222222L)
  }

  test("wordpiece stops when the corpus runs out of pairs") {
    val docs = Seq("solo").toDF("text")
    assert(WordPieceTrainer.train(docs, "text", k = 3).isEmpty)
  }

  test("char entropy quantization on a hand-checked doc") {
    val dir = Files.createTempDirectory("q160").toString
    // "aaab": n=4, counts a=3 b=1 → sterm = floor(1000·3·ln3) = 3295,
    // ent = floor(1000·ln4) − 3295 div 4 = 1386 − 823 = 563
    Seq((1L, "aaab", "en", "s0", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q160_char_entropy")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 4L, 2L, 563L)))
  }

  test("char-entropy kernel == explode/groupBy construction; " +
    "interpreted eval matches") {
    import org.apache.spark.sql.GraftExpr
    import org.apache.spark.sql.functions._
    val df = Seq("aaab", "hello world", "ü¢ü¢x", "a")
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
    val hof = df
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), length(col("text"))),
        i => col("text").substr(i, lit(1)))).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("k"),
        sum(floor(lit(1000.0) * col("c").cast("double") *
          log(col("c").cast("double"))).cast("long")).as("sterm"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val kern = df
      .select(col("doc_id"), GraftExpr.column(
        graft.expressions.CharEntropyTerms(
          GraftExpr.expression(col("text")))).as("t"))
      .select(col("doc_id"), col("t.n"), col("t.k"), col("t.sterm"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(kern === hof)
    // interpreted path: "aaab" → (4, 2, floor(1000·3·ln3) = 3295)
    val r = graft.expressions.CharEntropyTerms.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("aaab"))
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L &&
      r.getLong(2) == 3295L)
  }

  test("backoff branch fires only for bigrams the train split never saw") {
    // pick doc ids by their actual split bucket so the test controls
    // which side of the 90/5 hash split each doc lands on
    def bucket(id: Long): Long =
      graft.functions.TextAnalysis.md5Hex8(s"bo:$id") % 20
    val ids = (0L until 400L)
    val trainIds = ids.filter(bucket(_) < 18).take(3)
    val valId = ids.find(bucket(_) == 18).get
    val dir = Files.createTempDirectory("q162").toString
    val rows = trainIds.map(i => (i, "p q r", "en", "s0", 5L)) :+
      ((valId, "p q z", "en", "s0", 5L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q162_backoff_score")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    // train: unigrams p,q,r ×3 each (N=9); bigrams "p q"×3, "q r"×3.
    // val doc "p q z": "p q" seen → S = 3/3 = 1 → mnat 0; "q z"
    // unseen, z OOV → S = (0.4·1)/9, one backoff
    val mnat = math.floor(1000.0 * math.log(0.4 * 1.0 / 9.0)).toLong
    val expectNll = -mnat / 2 // (-sum) div 2, sum = 0 + mnat
    assert(got.toSet === Set((valId, 2L, expectNll, 1L)))
  }
}
