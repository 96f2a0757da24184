package graft

import graft.functions.TextAnalysis
import graft.functions.TextAnalysis._
import org.apache.spark.sql.functions._

import scala.util.Random

/** Text-analysis kernels: the codegen'd minhash must match the plain
  * affine math, simhash must match a straight Scala reference model,
  * and the shingle/fingerprint edges must hold. Property-style checks
  * run over seeded random samples (the offline cache has no
  * scalatest-scalacheck bridge).
  */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def oneCol[T](df: org.apache.spark.sql.DataFrame): T =
    df.collect().head.getAs[T](0)

  test("shingles: fewer than 3 tokens yields an empty set") {
    val df = Seq("one two", "a", "").toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(shingles3(col("toks")).as("sh"))
    assert(df.collect().forall(_.getSeq[String](0).isEmpty))
  }

  test("shingle hashes are distinct-set semantics") {
    val df = Seq("a b c a b c a b c").toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(shingleHashes(col("toks")).as("hs"))
    val hs = df.collect().head.getSeq[Long](0)
    assert(hs.length === 3) // "a b c", "b c a", "c a b"
    assert(hs.distinct.length === hs.length)
  }

  test("minhash kernel == plain affine reference on random hash arrays") {
    val rnd = new Random(1)
    (1 to 25).foreach { _ =>
      val hs = List.fill(rnd.nextInt(80) + 1)(rnd.nextLong() & 0xFFFFFFFFL)
      val kernel = Seq(Tuple1(hs)).toDF("hs")
        .select(minhashAffine(col("hs"), 16)).collect().head.getSeq[Long](0)
      val expected = (0 until 16).map { j =>
        val (a, b) = TextAnalysis.affineParam(j)
        hs.map(h => (h * a + b) % TextAnalysis.MinhashPrime).min
      }
      assert(kernel === expected)
    }
  }

  test("minhash signature is permutation-invariant (set semantics)") {
    val rnd = new Random(2)
    val hs = List.fill(40)(rnd.nextLong() & 0xFFFFFFFFL)
    val a = Seq(Tuple1(hs)).toDF("hs")
      .select(minhashAffine(col("hs"), 16)).collect().head.getSeq[Long](0)
    val b = Seq(Tuple1(rnd.shuffle(hs))).toDF("hs")
      .select(minhashAffine(col("hs"), 16)).collect().head.getSeq[Long](0)
    assert(a === b)
  }

  test("simhash32 == straight Scala vote model on random token lists") {
    val rnd = new Random(3)
    (1 to 25).foreach { _ =>
      val words = List.fill(rnd.nextInt(60) + 1)(
        Random.javaRandomToRandom(new java.util.Random(rnd.nextLong()))
          .alphanumeric.take(rnd.nextInt(8) + 1).mkString)
      val text = words.mkString(" ")
      val got = oneCol[Long](Seq(text).toDF("text")
        .select(tokens(col("text")).as("toks"))
        .select(simhash32(col("toks")).as("sh")))
      val hs = words.map(TextAnalysis.md5Hex8)
      val expected = (0 until 32).map { b =>
        val votes = hs.map(h => if (((h >> b) & 1) == 1) 1 else -1).sum
        if (votes > 0) 1L << b else 0L
      }.sum
      assert(got === expected)
    }
  }

  test("fingerprint is order-sensitive and deterministic") {
    def fp(s: String): Long = oneCol[Long](Seq(s).toDF("text")
      .select(tokens(col("text")).as("toks"))
      .select(fingerprint(col("toks")).as("fp")))
    assert(fp("a b c") === fp("a b c"))
    assert(fp("a b c") !== fp("c b a"))
  }

  test("tokenHash column == md5Hex8 plan-time twin") {
    val rnd = new Random(4)
    (1 to 20).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(12) + 1).mkString
      val got = oneCol[Long](Seq(s).toDF("t").select(tokenHash(col("t"))))
      assert(got === TextAnalysis.md5Hex8(s))
    }
  }
}
