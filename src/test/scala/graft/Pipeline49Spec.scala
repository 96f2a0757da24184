package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 wave-2 additions: greedy set cover
  * (q313), lead-lag (q314), retention hazard (q315), seasonal
  * decomposition (q316). */
class Pipeline49Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q313: marginal gains are non-increasing (submodularity), " +
    "coverage telescopes, winners are distinct") {
    val rows = SparkEntry.queries("q313_greedy_set_cover")(spark, dir)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 4)
    assert(rows.map(_._2).distinct.length === 4, "repeated winner")
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 <= a._3,
        s"gain grew ${a._3} -> ${b._3}: greedy not submodular")
      assert(b._4 === a._4 + b._3, "cum_types does not telescope")
    }
    assert(rows.head._4 === rows.head._3)
    rows.foreach(r => assert(r._5 <= 1000000L && r._5 > 0))
  }

  test("q314: every unordered type pair appears once with a lag in " +
    "range") {
    val rows = SparkEntry.queries("q314_lead_lag_xcorr")(spark, dir)
      .as[(String, String, Long, Long)].collect()
    val types = Tables.events(spark, dir)
      .select("event_type").distinct().count()
    assert(rows.length.toLong === types * (types - 1) / 2)
    rows.foreach { case (a, b, lag, _) =>
      assert(a < b, "pair not canonical")
      assert(math.abs(lag) <= 3)
    }
  }

  test("q315: the life table partitions the user set, at-risk counts " +
    "telescope, hazards are probabilities") {
    val rows = SparkEntry.queries("q315_retention_hazard")(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val users = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(rows.map(r => r._3 + r._4).sum === users)
    // n_at_risk(t) = everyone with lifetime >= t
    rows.foreach { case (t, n, ch, ce, hz) =>
      val expectAtRisk = rows.filter(_._1 >= t).map(r => r._3 + r._4).sum
      assert(n === expectAtRisk, s"t=$t at-risk wrong")
      assert(hz >= 0 && hz <= 1000000, s"t=$t hazard $hz")
      assert(ch + ce > 0)
    }
  }

  test("q316: the additive identity holds exactly on every row and " +
    "the trend is a genuine smoother") {
    val rows = SparkEntry
      .queries("q316_seasonal_decomposition")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ty, d, m, tr, se, re) =>
      assert(m === tr + se + re, s"($ty,$d) identity broken")
    }
    // smoother: per type, the trend's spread never exceeds the raw
    // series' spread
    rows.groupBy(_._1).foreach { case (ty, rs) =>
      val mSpread = rs.map(_._3).max - rs.map(_._3).min
      val tSpread = rs.map(_._4).max - rs.map(_._4).min
      assert(tSpread <= mSpread, s"$ty: trend rougher than the data")
    }
  }
}
