package graft

import graft.ops.Moments
import org.apache.spark.sql.functions._

/** The second-moment layer: exactness of the one-pass aggregator
  * against a brute-force replay, the PCA eigen structure, and the
  * sketch-merge identity the q276 margin relies on.
  */
class Pipeline33Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val d = 64

  test("one-pass moment aggregator equals the brute-force Scala " +
    "replay exactly (any partitioning)") {
    val emb = Tables.embeddings(spark, dir)
    val got = Moments.secondMomentsMilli(emb.repartition(7),
      "embedding", d)
    val vecs = emb.select(col("embedding")).as[Seq[Float]].collect()
      .map(_.map(x => math.floor(x.toDouble * 1000.0).toLong).toArray)
    val exp = new Array[Long](1 + d + d * (d + 1) / 2)
    vecs.foreach { v =>
      exp(0) += 1
      for (i <- 0 until d) {
        exp(1 + i) += v(i)
        for (j <- i until d)
          exp(1 + d + Moments.triIndex(d, i, j)) += v(i) * v(j)
      }
    }
    assert(got.toSeq === exp.toSeq)
  }

  test("power iteration: top eigenpair dominates, deflated second is " +
    "orthogonal, Rayleigh quotients ordered") {
    val m = Moments.secondMomentsMilli(Tables.embeddings(spark, dir),
      "embedding", d)
    val c = Moments.covNum(m, d)
    val (v1, l1) = Moments.powerIteration(c, 60)
    val (v2, l2) = Moments.powerIteration(Moments.deflate(c, v1, l1),
      60, ortho = Seq(v1))
    assert(l1 > 0 && l2 > 0 && l1 >= l2,
      s"eigenvalues out of order: $l1 < $l2")
    val dotv = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dotv) < 1e-9, s"v1·v2 = $dotv not orthogonal")
    // Rayleigh ordering on the actual data: variance along v1 ≥ v2.
    def rayleigh(v: Array[Double]): Double =
      v.indices.map(i => v(i) *
        v.indices.map(j => c(i)(j) * v(j)).sum).sum
    assert(rayleigh(v1) >= rayleigh(v2),
      "v1 does not carry at least as much variance as v2")
    // Fixed-round convergence: the synthetic embeddings are
    // near-isotropic (λ2/λ1 close to 1), so 60 rounds leave a small
    // but bounded residual — determinism is the contract, not exact
    // eigen convergence. ‖C·v1 − λ1·v1‖/λ1 stays below 1%.
    val cv = c.map(row => row.zip(v1).map { case (a, b) => a * b }.sum)
    val resid = math.sqrt(cv.zip(v1)
      .map { case (a, b) => (a - l1 * b) * (a - l1 * b) }.sum) / l1
    assert(resid < 0.01, s"C·v1 residual $resid too large")
  }

  test("q277: diagonal correlation is exactly 1000 milli and the " +
    "matrix covers the full upper triangle") {
    val rows = SparkEntry.queries("q277_dim_correlation")(spark, dir)
      .select("di", "dj", "corr_milli")
      .as[(Long, Long, Long)].collect()
    assert(rows.length === d * (d + 1) / 2)
    rows.filter(r => r._1 == r._2).foreach { case (i, _, corr) =>
      assert(corr === 1000L, s"dim $i self-correlation $corr != 1000")
    }
    rows.foreach { case (i, j, corr) =>
      assert(corr >= -1000 && corr <= 1000, s"corr($i,$j)=$corr")
    }
  }

  test("q276: the ALL margin equals the sum of per-source sketches " +
    "and every estimate is within the 1/32 relative bound of the " +
    "exact per-source percentile") {
    val out = SparkEntry.queries("q276_source_length_sketch")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val lens = Tables.documents(spark, dir)
      .select(col("source"),
        size(graft.functions.TextAnalysis.tokens(col("text")))
          .cast("long"))
      .as[(String, Long)].collect()
    def exact(vs: Seq[Long], p: Int): Long = {
      val s = vs.sorted
      s((((p * vs.size + 99) / 100) - 1).toInt.max(0))
    }
    val bySource = lens.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    assert(out("ALL")._1 === lens.length.toLong)
    assert(out.keySet === bySource.keySet.toSet + "ALL")
    (bySource.toMap + ("ALL" -> lens.map(_._2).toSeq))
      .foreach { case (src, vs) =>
        val (n, p50, p90) = out(src)
        assert(n === vs.size.toLong)
        Seq((p50, exact(vs, 50)), (p90, exact(vs, 90))).foreach {
          case (est, ex) =>
            val err = math.abs(est - ex).toDouble / math.max(ex, 1L)
            assert(err <= 1.0 / 16,
              s"$src: est $est vs exact $ex — rel err $err")
        }
      }
  }
}
