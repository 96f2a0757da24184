package graft

import org.apache.spark.sql.functions._

/** Invariants of the q331 intersection-planner audit (oracle parity
  * checks values; these pin the planner's LOGIC):
  *  - the plan orders each query's terms by ascending df,
  *  - the true intersection can never exceed the rarest posting list
  *    (the pigeonhole bound the ascending-df order exploits),
  *  - the independence estimate is internally consistent with the
  *    reported error metric.
  */
class Pipeline59Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val rows =
    SparkEntry.queries("q331_intersection_planner")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))

  test("every query plans its terms in ascending-df order") {
    assert(rows.nonEmpty)
    rows.foreach { case (q, df1, df2, df3, _, _, _) =>
      assert(df1 <= df2 && df2 <= df3,
        s"q$q plan not ascending: $df1, $df2, $df3")
    }
  }

  test("true intersection <= rarest posting list; estimate too " +
    "(independence can only shrink the rarest list)") {
    rows.foreach { case (q, df1, _, _, est, actual, _) =>
      assert(actual <= df1, s"q$q actual $actual > rarest df $df1")
      assert(est <= df1, s"q$q estimate $est > rarest df $df1")
      assert(est >= 0 && actual >= 0)
    }
  }

  test("err_micro replays |est - actual| * 1e6 div max(1, actual) " +
    "exactly") {
    rows.foreach { case (q, _, _, _, est, actual, err) =>
      val want = math.abs(est - actual) * 1000000L /
        math.max(1L, actual)
      assert(err === want, s"q$q error metric mismatch")
    }
  }

  test("the audit emits one row per constructed query, all 8") {
    assert(rows.map(_._1).sorted.toSeq === (0L until 8L))
  }
}
