package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass exact second-moment aggregation over an embedding column —
  * the input both the dimension-correlation audit (q277) and the PCA
  * trainer (q278) read.
  *
  * Components quantize to integer MILLI units first (the Lloyd rule:
  * integer sums are associative, so the aggregate is bit-identical
  * under any partitioning), then ONE custom Aggregator accumulates
  * [n | Σx_i (d) | Σx_i·x_j (upper triangle, d(d+1)/2)] in a single
  * long array. That buffer is d(d+3)/2+1 longs (d=64 → 2145) —
  * constant per task regardless of corpus size, map-side combined,
  * merged by addition. The alternatives don't scale: a d²-column SQL
  * aggregate blows codegen limits, and the explode-self-join shape
  * multiplies the corpus by d(d+1)/2 in the shuffle.
  *
  * Magnitudes: |x_milli| ≤ ~1000 for unit-norm embeddings, so each
  * product is ≤ 1e6 and the Long sums hold ~9e12 rows; a larger tier
  * moves the buffer to two-long (hi/lo) limbs, same shape.
  */
object Moments {

  /** Index of the (i, j) upper-triangle product (i ≤ j) within the
    * packed tail of the buffer. */
  def triIndex(d: Int, i: Int, j: Int): Int =
    i * d - (i * (i - 1)) / 2 + (j - i)

  private final class OuterProductAgg(d: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    private val len = 1 + d + d * (d + 1) / 2
    def zero: Array[Long] = new Array[Long](len)
    def reduce(b: Array[Long], x: Seq[Long]): Array[Long] = {
      val a = x.toArray
      b(0) += 1L
      var i = 0
      while (i < d) {
        b(1 + i) += a(i)
        var j = i
        while (j < d) {
          b(1 + d + triIndex(d, i, j)) += a(i) * a(j)
          j += 1
        }
        i += 1
      }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < len) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** The collected moment vector [n, Σx_i…, Σx_i·x_j…] over
    * milli-quantized components of `vecCol`. One scan, one bounded
    * (d(d+3)/2+1)-long result row. */
  def secondMomentsMilli(emb: DataFrame, vecCol: String, d: Int)
      : Array[Long] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val agg = new OuterProductAgg(d)
    emb
      .select(transform(col(vecCol),
        x => floor(x.cast("double") * lit(1000.0)).cast("long")).as("v"))
      .as[Seq[Long]]
      .select(agg.toColumn)
      .head()
      .toArray
  }

  /** Covariance matrix (times n², exact in double from Longs — every
    * entry |·| < 2^53 at this tier) from a moment vector: entry
    * (i, j) = n·Σx_i·x_j − Σx_i·Σx_j. */
  def covNum(m: Array[Long], d: Int): Array[Array[Double]] = {
    val n = m(0)
    val c = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val v = n.toDouble * m(1 + d + triIndex(d, i, j)) -
          m(1 + i).toDouble * m(1 + j)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    c
  }

  /** Deterministic power iteration for the top eigenvector of a
    * symmetric matrix: fixed uniform start, fixed round count,
    * single-threaded driver arithmetic — bit-reproducible. `ortho`
    * vectors are Gram-Schmidt-subtracted EVERY round (orthogonal
    * iteration), which converges to the next eigenvector even when
    * the eigen gap is small — plain rank-1 deflation left a ~3e-3
    * residual along v1 on the near-isotropic synthetic embeddings.
    * Returns (eigenvector, eigenvalue estimate). */
  def powerIteration(c: Array[Array[Double]], rounds: Int,
                     ortho: Seq[Array[Double]] = Nil)
      : (Array[Double], Double) = {
    val d = c.length
    def project(v: Array[Double]): Array[Double] = {
      var out = v
      ortho.foreach { u =>
        val dp = out.zip(u).map { case (a, b) => a * b }.sum
        out = out.zip(u).map { case (a, b) => a - dp * b }
      }
      out
    }
    var v = project(Array.fill(d)(1.0 / math.sqrt(d.toDouble)))
    var lambda = 0.0
    var r = 0
    while (r < rounds) {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        w(i) = s; i += 1
      }
      val p = project(w)
      val nrm = math.sqrt(p.map(x => x * x).sum)
      if (nrm == 0.0) return (v, 0.0)
      lambda = nrm
      v = p.map(_ / nrm)
      r += 1
    }
    // sign convention: first nonzero component positive (total order)
    val k = v.indexWhere(x => math.abs(x) > 1e-12)
    if (k >= 0 && v(k) < 0) (v.map(x => -x), lambda) else (v, lambda)
  }

  /** Rank-1 deflation: C − λ·v·vᵀ. */
  def deflate(c: Array[Array[Double]], v: Array[Double], lambda: Double)
      : Array[Array[Double]] = {
    val d = c.length
    Array.tabulate(d, d)((i, j) => c(i)(j) - lambda * v(i) * v(j))
  }
}
