package graft

import graft.functions.TextAnalysis
import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

import scala.util.Random

/** Winnowing fingerprint contracts (the SIGMOD 2003 guarantee the q93
  * decontamination path depends on) and the SQ8 kernel's equivalence /
  * error bound.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private val K = 5 // gram width
  private val W = 4 // window width (guarantee threshold = W + K - 1 = 8)

  private def fingerprints(docs: Seq[(Long, String)]): Map[Long, Set[Long]] =
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextAnalysis.gramHashesPositional(col("toks"), K).as("gh"))
      .select(col("doc_id"),
        explode(TextAnalysis.winnowFingerprints(col("gh"), W)).as("fp"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getLong(1)).toSet }

  test("winnowing guarantee: any shared run of >= w+k-1 tokens yields " +
    "a shared fingerprint") {
    val rnd = new Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    def randToks(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    (0 until 30).foreach { trial =>
      val shared = randToks(W + K - 1) // exactly the threshold length
      val a = randToks(rnd.nextInt(20)) ++ shared ++ randToks(rnd.nextInt(20))
      val b = randToks(rnd.nextInt(20)) ++ shared ++ randToks(rnd.nextInt(20))
      val fps = fingerprints(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
      assert((fps(1L) & fps(2L)).nonEmpty,
        s"trial $trial: no shared fingerprint for a planted ${W + K - 1}-run")
    }
  }

  test("winnowing edge cases: empty, shorter than a gram, shorter than " +
    "a window") {
    val fps = fingerprints(Seq(
      1L -> "", // no tokens
      2L -> "aa bb cc", // < k tokens -> no grams
      3L -> "aa bb cc dd ee ff", // 2 grams < w -> min of all grams
      4L -> "aa bb cc dd ee"))   // exactly one gram
    assert(!fps.contains(1L) && !fps.contains(2L))
    assert(fps(3L).size == 1) // one clamped window over both grams
    assert(fps(4L).size == 1)
  }

  test("every window's minimum is a selected fingerprint (containment)") {
    val text = (0 until 40).map(i => s"t${i % 7}").mkString(" ")
    val Array(row) = Seq(1L -> text).toDF("doc_id", "text")
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(TextAnalysis.gramHashesPositional(col("toks"), K).as("gh"),
        TextAnalysis.winnowFingerprints(
          TextAnalysis.gramHashesPositional(col("toks"), K), W).as("fps"))
      .collect()
    val gh = row.getSeq[Long](0)
    val fps = row.getSeq[Long](1).toSet
    (0 to gh.size - W).foreach { j =>
      assert(fps.contains(gh.slice(j, j + W).min))
    }
  }

  test("SQ8 kernel == plain-Scala round trip; error bounded by one step") {
    val rnd = new Random(23)
    val dims = 16
    val data = (0 until 50).map(i =>
      (i.toLong, Seq.fill(dims)(rnd.nextGaussian())))
    // one degenerate dimension (constant) to hit the mx == mn branch
    val vecs = data.map { case (i, v) => (i, v.updated(3, 1.25)) }
    val mn = (0 until dims).map(d => vecs.map(_._2(d)).min)
    val mx = (0 until dims).map(d => vecs.map(_._2(d)).max)
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        VectorSearch.sq8Approx(col("v"), typedLit(mn), typedLit(mx)).as("a"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    vecs.foreach { case (i, v) =>
      val approx = got(i)
      (0 until dims).foreach { d =>
        val lo = mn(d); val hi = mx(d)
        val want = if (hi == lo) lo else {
          val code = math.min(math.max(
            math.floor(((v(d) - lo) * 255.0) / (hi - lo)), 0.0), 255.0)
          lo + ((code + 0.5) * ((hi - lo) / 255.0))
        }
        assert(approx(d) == want, s"vec $i dim $d")
        // midpoint dequantization is never off by more than one step
        assert(math.abs(approx(d) - v(d)) <= (hi - lo) / 255.0 + 1e-12)
      }
    }
    // inputs outside the trained range saturate to codes 0 / 255 —
    // what ranking against actually-stored int8 codes would compute
    val step = 1.0 / 255.0
    val sat = Seq((1L, Seq(-5.0, 5.0))).toDF("id", "v")
      .select(VectorSearch.sq8Approx(col("v"),
        typedLit(Seq(0.0, 0.0)), typedLit(Seq(1.0, 1.0))).as("a"))
      .head().getSeq[Double](0)
    assert(sat == Seq(0.5 * step, 255.5 * step))
  }
}
