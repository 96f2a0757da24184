package graft

import graft.ops.{Dedup, VectorSearch}
import graft.expressions.DotProductDbl
import org.apache.spark.sql.functions._

import scala.util.Random

/** Blocking-recall guarantees for the near-dup operators and kernel
  * equivalence for the dot product.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("simhash byte-blocking finds EVERY pair within hamming distance 3") {
    // synthetic docs engineered to produce close simhashes: share most
    // tokens, vary a few — then compare blocked join vs brute force
    val rnd = new Random(20)
    val base = (1 to 40).map(i => s"tok$i")
    val docs = (0 until 60).map { i =>
      val drop = rnd.nextInt(4)
      val txt = (base.drop(drop) ++ Seq.fill(rnd.nextInt(3))(s"x${rnd.nextInt(5)}"))
        .mkString(" ")
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val blocked = Dedup.nearDupSimhash(docs, "doc_id", "text", maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute force over the same simhashes
    val sh = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.simhash32(
          graft.functions.TextAnalysis.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "test data must actually contain close pairs")
    assert(blocked === brute)
  }

  test("WIDE simhash 15-bit-slice blocking finds EVERY pair within " +
    "hamming distance 3 (the q402 geometry)") {
    val rnd = new Random(20)
    val base = (1 to 40).map(i => s"tok$i")
    val docs = (0 until 60).map { i =>
      val drop = rnd.nextInt(4)
      val txt = (base.drop(drop) ++ Seq.fill(rnd.nextInt(3))(s"x${rnd.nextInt(5)}"))
        .mkString(" ")
      (i.toLong, txt)
    }.toDF("doc_id", "text")
    val blocked = Dedup.nearDupSimhashWide(docs, "doc_id", "text",
        maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.simhash60(
          graft.functions.TextAnalysis.tokens(col("text"))).as("s"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "test data must actually contain close pairs")
    assert(blocked === brute)
    // the signature uses all 60 positions, not a 32-bit truncation
    assert(sh.exists { case (_, s) => (s >>> 32) != 0L },
      "high bits must carry signal")
  }

  test("minhash LSH + exact verify finds the planted near-dups") {
    val rnd = new Random(21)
    val vocab = (1 to 200).map(i => s"w$i")
    def doc(n: Int) = List.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val originals = (0 until 20).map(i => (i.toLong, doc(50)))
    // planted dups: copy with one token changed -> jaccard >> 0.8
    val dups = originals.take(5).map { case (i, t) =>
      (100L + i, t.replaceFirst("w", "v")) }
    val noise = (200 until 220).map(i => (i.toLong, doc(50)))
    val docs = (originals ++ dups ++ noise).toDF("doc_id", "text")
    val pairs = Dedup.nearDupMinhash(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    originals.take(5).foreach { case (i, _) =>
      assert(pairs.contains((i, 100L + i)), s"planted pair $i missing")
    }
  }

  test("prefix filter finds EVERY pair at the threshold (full recall)") {
    // random docs with heavy overlap so real pairs exist across a range
    // of similarities; prefix-filtered result must equal brute force
    // EXACTLY — the operator's guarantee is deterministic recall
    val rnd = new Random(23)
    val vocab = (1 to 60).map(i => s"w$i")
    def doc(n: Int) = List.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val originals = (0 until 25).map(i => (i.toLong, doc(30)))
    val mutated = originals.take(12).map { case (i, t) =>
      val toks = t.split(" ").toVector
      val k = rnd.nextInt(6) // 0..5 token swaps -> jaccard from ~1.0 down
      val out = (0 until k).foldLeft(toks)((v, _) =>
        v.updated(rnd.nextInt(v.size), s"m${rnd.nextInt(9)}"))
      (100L + i, out.mkString(" "))
    }
    val docs = (originals ++ mutated).toDF("doc_id", "text")
    val got = Dedup.nearDupPrefix(docs, "doc_id", "text", threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // brute force over the same shingle-hash sets
    val hs = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.shingleHashes(
          graft.functions.TextAnalysis.tokens(col("text"))).as("h"))
      .as[(Long, Seq[Long])].collect()
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia < ib && ha.nonEmpty && hb.nonEmpty
      inter = ha.toSet.intersect(hb.toSet).size
      j = inter.toDouble / (ha.toSet.size + hb.toSet.size - inter)
      if j >= 0.5
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "test data must contain qualifying pairs")
    assert(got === brute)
  }

  test("containment join finds EVERY ordered pair at the threshold") {
    // corpora with planted excerpts: short docs whose shingles mostly
    // sit inside longer ones, plus random noise docs — the one-sided
    // prefix filter must reproduce brute-force containment EXACTLY
    val rnd = new Random(31)
    val vocab = (1 to 80).map(i => s"w$i")
    def doc(n: Int) = List.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val longs = (0 until 15).map(i => (i.toLong, doc(60)))
    // excerpts: contiguous slices of a long doc, some with 0-2 edits
    val excerpts = longs.take(10).zipWithIndex.map { case ((i, t), x) =>
      val toks = t.split(" ").toVector
      val start = rnd.nextInt(20)
      val len = 12 + rnd.nextInt(20)
      val sliced = toks.slice(start, start + len)
      val edited = (0 until rnd.nextInt(3)).foldLeft(sliced)((v, _) =>
        v.updated(rnd.nextInt(v.size), s"e${rnd.nextInt(9)}"))
      (100L + x, edited.mkString(" "))
    }
    val noise = (0 until 10).map(i => (200L + i, doc(25)))
    val docs = (longs ++ excerpts ++ noise).toDF("doc_id", "text")
    val t = 0.8
    val got = Dedup.containmentJoin(docs, "doc_id", "text", threshold = t)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val hs = docs.select(col("doc_id"),
        graft.functions.TextAnalysis.shingleHashes(
          graft.functions.TextAnalysis.tokens(col("text"))).as("h"))
      .as[(Long, Seq[Long])].collect()
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs
      if ia != ib && ha.nonEmpty && hb.nonEmpty
      c = ha.toSet.intersect(hb.toSet).size.toDouble / ha.toSet.size
      if c >= t
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty, "test data must contain qualifying pairs")
    assert(got === brute)
  }

  test("containment catches the excerpt Jaccard misses") {
    // a 12-token excerpt inside a 80-token container: C(a->b) = 1.0
    // while J is far below any usable near-dup threshold — the case
    // this operator exists for
    val container = (1 to 80).map(i => s"c$i").mkString(" ")
    val excerpt = (20 to 31).map(i => s"c$i").mkString(" ")
    val docs = Seq((1L, excerpt), (2L, container), (3L, (1 to 20)
      .map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val pairs = Dedup.containmentJoin(docs, "doc_id", "text", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === 1.0)
    // the symmetric operator at ANY workable threshold misses it
    val j = Dedup.nearDupPrefix(docs, "doc_id", "text", threshold = 0.5)
      .collect()
    assert(j.isEmpty)
  }

  test("exact dedup groups by content with canonical min id") {
    val docs = Seq((1L, "same text"), (5L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(docs, "doc_id", "text")
      .orderBy("canonical_id").collect()
    assert(out.map(r => (r.getAs[Long]("canonical_id"),
      r.getAs[Long]("n_dups"))).toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("dot product kernel == plain scala fold, including codegen path") {
    val rnd = new Random(22)
    (1 to 20).foreach { _ =>
      val n = rnd.nextInt(100) + 1
      val a = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val b = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
        .select(VectorSearch.dot(col("a"), col("b")))
        .collect().head.getDouble(0)
      var expected = 0.0
      (0 until n).foreach(i => expected += a(i) * b(i))
      assert(got === expected) // bit-identical, same fold order
    }
  }

  test("dot product handles unequal lengths and empals") {
    val got = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0))).toDF("a", "b")
      .select(VectorSearch.dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(got === 50.0)
    val empty = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .select(VectorSearch.dot(col("a"), col("b")))
      .collect().head.getDouble(0)
    assert(empty === 0.0)
  }

  test("interpreted eval path matches codegen result") {
    val a = Seq(0.5, -1.5, 2.25); val b = Seq(4.0, 2.0, -1.0)
    val expr = DotProductDbl(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(expr.eval(null) === (0.5 * 4.0 + -1.5 * 2.0 + 2.25 * -1.0))
  }
}
