package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 wave-3 additions: decorrelation shapes
  * (q317/q318), backtest (q319), cardinality audit (q320). */
class Pipeline51Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q317: matches an independent Scala replay of the " +
    "cross-multiplied 20%-of-average filter") {
    val Array((n, np, rev)) =
      SparkEntry.queries("q317_small_quantity_revenue")(spark, dir)
        .as[(Long, Long, Long)].collect()
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey",
        floor($"l_quantity" * 1000000.0).cast("long").as("qm"),
        floor($"l_extendedprice" * 1000.0).cast("long").as("pm"))
      .as[(Long, Long, Long)].collect()
    val byPart = li.groupBy(_._1)
    val small = li.filter { case (p, qm, _) =>
      val rs = byPart(p)
      qm * 5 * rs.length < rs.map(_._2).sum
    }
    assert(n === small.length.toLong)
    assert(np === small.map(_._1).distinct.length.toLong)
    assert(rev === small.map(_._3).sum)
  }

  test("q318: reported customers are above average AND absent from " +
    "the recent-order window") {
    val total = SparkEntry.queries("q318_idle_high_balance")(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(total.nonEmpty)
    total.foreach { case (_, n, bal) =>
      assert(n > 0 && bal > 0, "idle customers must be high-balance")
    }
    // independent replay of the filter
    val cust = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment",
        floor($"c_acctbal" * 1000.0).cast("long").as("bm"))
      .as[(Long, String, Long)].collect()
    val pos = cust.map(_._3).filter(_ > 0)
    val (sp, npos) = (pos.sum, pos.length.toLong)
    val cut = Tables.orders(spark, dir)
      .agg(date_sub(to_date(max("o_orderdate")), 30)).head.getDate(0)
    val recent = Tables.orders(spark, dir)
      .filter(to_date($"o_orderdate") >= lit(cut))
      .select("o_custkey").as[Long].collect().toSet
    val expect = cust
      .filter(c => c._3 * npos > sp && !recent(c._1))
      .groupBy(_._2).map { case (seg, cs) =>
        (seg, cs.length.toLong, cs.map(_._3).sum)
      }.toSet
    assert(total.toSet === expect)
  }

  test("q319: walk-forward evaluation drops exactly the first week " +
    "and |bias| <= MAE") {
    val rows = SparkEntry
      .queries("q319_seasonal_naive_backtest")(spark, dir)
      .as[(String, Long, Long, Long)].collect()
    val days = Tables.events(spark, dir)
      .select(to_date($"ts")).distinct().count()
    rows.foreach { case (ty, n, mae, bias) =>
      assert(n === days - 7,
        s"$ty: first same-dow occurrence must be unforecastable")
      assert(math.abs(bias) <= mae, s"$ty: |bias| > MAE is impossible")
      assert(mae >= 0)
    }
  }

  test("q320: System-R is exact on clean unique-parent FK edges " +
    "(actual == child rows, err == 0)") {
    val rows = SparkEntry.queries("q320_cardinality_audit")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(rows.length === 5)
    rows.foreach { case (e, ra, rb, da, db, est, actual, err) =>
      assert(db === rb, s"$e: parent key not unique — edge invalid")
      assert(actual === ra,
        s"$e: referential integrity broken (actual != child rows)")
      assert(est === actual && err === 0L,
        s"$e: System-R must be exact under uniform unique-parent FK")
      assert(da <= db)
    }
  }
}
