package graft

import graft.ops.VectorSearch
import org.apache.spark.sql.functions._

/** Pins for the distributed Lloyd trainer (q106/q107's engine): the
  * distributed rounds must be bit-identical to a driver-side replica
  * of the same quantized update rule, and invariant under
  * repartitioning — the property that makes the late-bound centroid
  * oracle sound.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // deterministic toy corpus: 3 obvious clusters in 4 dims
  private def corpus = (0 until 90).map { i =>
    val c = i % 3
    val base = Array.tabulate(4)(d => if (d == c) 10.0 else 1.0)
    val jit = Array.tabulate(4)(d =>
      (graft.functions.TextAnalysis.md5Hex8(s"$i:$d") % 1000) / 2000.0)
    (i.toLong, base.zip(jit).map { case (b, j) => (b + j).toFloat }.toSeq)
  }.toDF("vec_id", "embedding")

  /** Driver-side replica of one distributed round: same assignment
    * rule (descending (sim, cell) tie-break), same micro-unit
    * quantization, same (sum/1e6)/count division.
    */
  private def replicaRound(vecs: Array[(Long, Array[Double])],
                           cents: Array[Array[Double]]): Array[Array[Double]] = {
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val dims = cents.head.length
    val sums = Array.fill(cents.length)(new Array[Long](dims))
    val counts = new Array[Long](cents.length)
    vecs.foreach { case (_, v) =>
      // max by (sim, cell): the reverse(array_sort) rule picks the
      // highest sim, ties to the highest cell index
      val best = cents.indices.maxBy(c => (cos(v, cents(c)), c))
      counts(best) += 1
      (0 until dims).foreach { d =>
        // Spark round() is BigDecimal HALF_UP (away from zero on .5),
        // not math.round's floor(x+0.5) — replicate exactly
        sums(best)(d) += new java.math.BigDecimal(v(d) * 1000000.0)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      }
    }
    cents.indices.toArray.map { c =>
      if (counts(c) == 0) cents(c).clone()
      else Array.tabulate(dims)(d =>
        (sums(c)(d).toDouble / 1000000.0) / counts(c))
    }
  }

  test("distributed Lloyd == driver-side replica, bit for bit") {
    val df = corpus
    val init = Array(
      Array(10.0, 1.0, 1.0, 1.0),
      Array(1.0, 10.0, 1.0, 1.0),
      Array(1.0, 1.0, 10.0, 1.0))
    val distributed = VectorSearch.lloydRoundsDistributed(
      df, "vec_id", "embedding", init, rounds = 3)
    val vecs = df.select(col("vec_id"),
        VectorSearch.toDouble(col("embedding")).as("v"))
      .as[(Long, Seq[Double])].collect()
      .map { case (id, v) => (id, v.toArray) }
    var replica = init
    (0 until 3).foreach(_ => replica = replicaRound(vecs, replica))
    assert(distributed.length === replica.length)
    distributed.zip(replica).foreach { case (d, r) =>
      assert(d.toSeq === r.toSeq)
    }
  }

  test("distributed Lloyd is partitioning-invariant") {
    val init = Array(
      Array(10.0, 1.0, 1.0, 1.0),
      Array(1.0, 1.0, 1.0, 10.0))
    val a = VectorSearch.lloydRoundsDistributed(
      corpus.repartition(1), "vec_id", "embedding", init, rounds = 2)
    val b = VectorSearch.lloydRoundsDistributed(
      corpus.repartition(7), "vec_id", "embedding", init, rounds = 2)
    a.zip(b).foreach { case (x, y) => assert(x.toSeq === y.toSeq) }
  }

  test("empty cells keep their previous centroid") {
    val far = Array(Array(10.0, 1.0, 1.0, 1.0), Array(-1e9, -1e9, -1e9, -1e9))
    val out = VectorSearch.lloydRoundsDistributed(
      corpus, "vec_id", "embedding", far, rounds = 1)
    // nothing assigns to the absurd centroid (cosine ≈ -1); it survives
    assert(out(1).toSeq === far(1).toSeq)
  }
}
