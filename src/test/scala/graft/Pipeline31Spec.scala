package graft

import org.apache.spark.sql.functions._

/** Invariants of the statistics-layer group (q264-q271) that the
  * DuckDB oracle cannot express: the sketch's relative-error
  * GUARANTEE, the silhouette range, and independent Scala replays of
  * the MAD and OLS arithmetic.
  */
class Pipeline31Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q264: measured relative error respects the 4-bit geometry " +
    "bound (~2^-5 + quantization) at every quantile") {
    val rows = SparkEntry.queries("q264_logbucket_quantiles")(spark, dir)
      .select("event_type", "p50_relerr_micro", "p95_relerr_micro",
        "p99_relerr_micro")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, r50, r95, r99) =>
      Seq(r50, r95, r99).foreach { r =>
        assert(r >= 0 && r <= 35000,
          s"type $t rel err $r exceeds the 1/32 sketch bound")
      }
    }
  }

  test("q267: simplified silhouette is in [0, 1000] milli (argmax " +
    "assignment makes a <= b by construction)") {
    val rows = SparkEntry.queries("q267_cluster_silhouette")(spark, dir)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cell, n, mean, mn) =>
      assert(n > 0)
      assert(mn >= 0 && mn <= 1000, s"cell $cell min $mn out of range")
      assert(mean >= mn && mean <= 1000,
        s"cell $cell mean $mean out of [min, 1000]")
    }
  }

  test("q266: median/MAD/outlier counts match an independent exact " +
    "Scala replay (lower-median rule, integer z-rule)") {
    val byType = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * lit(1000000.0)).cast("long").as("vm"))
      .as[(String, Long)].collect().groupBy(_._1)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(((xs.size + 1) / 2) - 1) // ceil(n/2)-th order statistic
    }
    val expected = byType.map { case (t, rows) =>
      val vs = rows.map(_._2).toSeq
      val med = lowerMedian(vs)
      val devs = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(devs)
      val out = devs.count(d =>
        if (mad == 0) d > 0 else 6745 * d > 35000 * mad)
      t -> (vs.size.toLong, med, mad, out.toLong, devs.max)
    }
    val got = SparkEntry.queries("q266_mad_outliers")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5, r._6)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (t, e) =>
      assert(got(t) === e, s"type $t: query ${got(t)} != replay $e")
    }
  }

  test("q265: slope/intercept match an independent exact Scala OLS " +
    "replay with the same sign-split integer divisions") {
    val byType = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("xd"),
        floor(col("value") * lit(1000.0)).cast("long").as("ym"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    def sdiv(a: Long, b: Long): Long = if (a < 0) -((-a) / b) else a / b
    val expected = byType.map { case (t, rows) =>
      val x0 = rows.map(_._2).min
      val xs = rows.map(_._2 - x0)
      val ys = rows.map(_._3)
      val n = rows.size.toLong
      val sx = xs.sum; val sxx = xs.map(x => x * x).sum
      val sy = ys.sum; val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val num = n * sxy - sx * sy
      val den = math.max(n * sxx - sx * sx, 1L)
      val slope = sdiv(1000 * num, den)
      val ic = sdiv(sy - sdiv(num * sx, den), n)
      t -> (n, slope, ic, sdiv(1000 * sy, n))
    }
    val got = SparkEntry.queries("q265_value_trend_ols")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (t, e) =>
      assert(got(t) === e, s"type $t: query ${got(t)} != replay $e")
    }
  }

  test("q270: rollup margins are consistent — gid=3 grand total " +
    "equals the sum of gid=1 lang subtotals and of gid=0 leaves") {
    val rows = SparkEntry.queries("q270_rollup_margins")(spark, dir)
      .select("gid", "n_docs", "tok_mass")
      .as[(Long, Long, Long)].collect()
    val byGid = rows.groupBy(_._1)
    assert(byGid.keySet === Set(0L, 1L, 3L))
    val grand = byGid(3L) match { case Array(g) => (g._2, g._3) }
    def total(g: Long) =
      (byGid(g).map(_._2).sum, byGid(g).map(_._3).sum)
    assert(total(1L) === grand, "lang subtotals don't sum to the total")
    assert(total(0L) === grand, "leaves don't sum to the total")
  }
}
