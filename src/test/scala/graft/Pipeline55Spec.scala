package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 wave-5 additions: skew advisor (q325),
  * Haar energy (q326), SPRT monitor (q327). */
class Pipeline55Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q325: skew factor and salt factor are well-formed for every " +
    "key column") {
    val rows = SparkEntry.queries("q325_skew_salting_advisor")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 5)
    rows.foreach { case (k, n, d, maxc, skew, salt) =>
      assert(d <= n && maxc <= n && maxc >= 1, s"$k stats inconsistent")
      assert(skew >= 1000 - 1, s"$k: max below mean is impossible")
      assert(salt >= 1, s"$k: salt factor must be at least 1")
      assert(maxc <= salt * math.max(1, n / 32),
        s"$k: salting must bound the hottest key by the task target")
    }
  }

  test("q326: energies match an exact Scala replay of the integer " +
    "Haar transform") {
    val got = SparkEntry.queries("q326_haar_energy")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // replay: 32-slot padded per-type daily integer means
    val d0 = Tables.events(spark, dir)
      .agg(min(to_date($"ts"))).head.getDate(0)
    val daily = Tables.events(spark, dir)
      .select($"event_type",
        datediff(to_date($"ts"), lit(d0)).cast("long").as("d"),
        floor($"value" * 1000.0).cast("long").as("vk"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        val byDay = rs.groupBy(_._2).map { case (d, xs) =>
          d -> xs.map(_._3).sum / xs.length
        }
        t -> Array.tabulate(32)(i => byDay.getOrElse(i.toLong, 0L))
      }
    daily.foreach { case (t, series0) =>
      var cur = series0
      (1 to 5).foreach { lvl =>
        val sums = Array.tabulate(cur.length / 2)(i =>
          cur(2 * i) + cur(2 * i + 1))
        val details = Array.tabulate(cur.length / 2)(i =>
          cur(2 * i) - cur(2 * i + 1))
        val energy = details.map(x => x * x).sum
        val (nc, e) = got((t, lvl.toLong))
        assert(nc === details.length.toLong, s"$t level $lvl n_coef")
        assert(e === energy, s"$t level $lvl energy mismatch")
        cur = sums
      }
    }
  }

  test("q327: the LLR telescopes, decisions match the boundaries, " +
    "and stop_day is the first non-continue day") {
    val rows = SparkEntry.queries("q327_sprt_monitor")(spark, dir)
      .as[(Long, Long, Long, Long, String, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val k1 = math.floor(math.log(0.22 / 0.18) * 1e6).toLong
    val k0 = math.floor(math.log(0.78 / 0.82) * 1e6).toLong
    val upper = math.floor(math.log(19.0) * 1e6).toLong
    var cum = 0L
    rows.foreach { case (_, conv, n, cumLlr, dec, _) =>
      cum += conv * k1 + (n - conv) * k0
      assert(cumLlr === cum, "cumulative LLR does not telescope")
      val expect =
        if (cumLlr >= upper) "accept_h1"
        else if (cumLlr <= -upper) "accept_h0"
        else "continue"
      assert(dec === expect)
    }
    val stops = rows.filter(_._5 != "continue").map(_._1)
    val reported = rows.head._6
    assert(reported === (if (stops.isEmpty) -1L else stops.min))
  }
}
