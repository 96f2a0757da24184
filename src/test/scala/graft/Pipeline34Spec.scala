package graft

import org.apache.spark.sql.functions._

/** Invariants for the label-aware audit group (q279-q282). */
class Pipeline34Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q279: reconstruction error is nonnegative and bounded by the " +
    "total vector energy") {
    val rows = SparkEntry.queries("q279_pca_recon_error")(spark, dir)
      .as[(Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (label, n, err) =>
      assert(n > 0)
      // unit-ish embeddings: ‖x‖² ≈ 1 → residual in [−ε, 1e6+ε] micro
      // (tiny negatives possible only from the quantized basis)
      assert(err >= -1000 && err <= 1100000,
        s"label $label mean err $err outside the energy envelope")
    }
  }

  test("q280: Fisher numerators are nonnegative and a " +
    "label-blind column scores zero discrimination") {
    val rows = SparkEntry.queries("q280_fisher_scores")(spark, dir)
      .select("dim", "between_num", "within_num", "fisher_milli")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 64)
    rows.foreach { case (dim, b, w, f) =>
      assert(b >= 0, s"dim $dim negative between-scatter")
      assert(w >= 0, s"dim $dim negative within-scatter")
      assert(f >= 0, s"dim $dim negative fisher score")
    }
  }

  test("q281: PMI cells aggregate consistently — margins recover the " +
    "corpus count and expected counts sum to ~N per lang") {
    val rows = SparkEntry.queries("q281_lang_source_pmi")(spark, dir)
      .select("lang", "source", "n", "expected_milli")
      .as[(String, String, Long, Long)].collect()
    val total = Tables.documents(spark, dir).count()
    assert(rows.map(_._3).sum === total)
    // Σ_cells expected = Σ_i r_i·(Σ_j c_j)/N = N when every (i,j)
    // cell exists; with missing cells the sum is ≤ N (floor slack).
    val expSum = rows.map(_._4).sum / 1000
    assert(expSum <= total && expSum >= total - rows.length - total / 10,
      s"expected-count mass $expSum inconsistent with N=$total")
  }

  test("q282: quartiles are balanced and percent_rank/cume_dist are " +
    "monotone in mass order") {
    val rows = SparkEntry.queries("q282_source_mass_deciles")(spark, dir)
      .select("source", "tok_mass", "quartile", "pr_milli", "cd_milli")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._2, r._1))
    assert(rows.nonEmpty)
    val sizes = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(sizes.keySet === Set(1L, 2L, 3L, 4L))
    assert(sizes.values.max - sizes.values.min <= 1,
      s"ntile quartiles unbalanced: $sizes")
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 <= b._4, "percent_rank not monotone")
        assert(a._5 <= b._5, "cume_dist not monotone")
        assert(a._3 <= b._3, "ntile not monotone")
      case _ => ()
    }
    assert(rows.last._5 === 1000L, "cume_dist must end at 1")
  }
}
