package graft

import graft.ops.Hits
import org.apache.spark.sql.DataFrame

/** The q211 gate contract: broadcast and double-resident shuffle paths
  * run the same integer recurrence — the gate changes the plan, never a
  * micro-unit. Plus a hand-computed star graph pinning the HITS
  * semantics themselves (pure authorities vs pure hubs).
  */
class HitsSpec extends SparkSpec {

  private def fixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    // two hubs a, c both citing authority b; d cites a (making a both
    // hub and authority); e isolated end of a chain: b has no out-edges
    val edges = Seq(
      ("a", "b"), ("c", "b"), ("d", "a"), ("d", "e"))
      .toDF("src", "dst").distinct()
    val nodes = Seq("a", "b", "c", "d", "e").toDF("domain")
    (nodes, edges)
  }

  private def run(gate: Long): Seq[(String, Long, Long, Long, Long)] = {
    import spark.implicits._
    spark.conf.set(Hits.GateConf, gate.toString)
    try {
      val (nodes, edges) = fixture
      Hits.domainHits(nodes, edges, iters = 3)
        .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    } finally spark.conf.unset(Hits.GateConf)
  }

  test("broadcast and shuffle paths agree micro-unit-exactly") {
    val small = run(gate = 1000000L) // 5 nodes → broadcast path
    val large = run(gate = 0L)       // forces the double-resident path
    assert(small == large, s"paths diverged:\n$small\nvs\n$large")
  }

  test("pure-star semantics: two equal hubs feed one authority") {
    import spark.implicits._
    // a -> b, c -> b and nothing else: b is the ONLY authority (all
    // authority mass), a and c split hub mass exactly in half, and the
    // recurrence is already stationary after one iteration
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val nodes = Seq("a", "b", "c").toDF("domain")
    val got = Hits.domainHits(nodes, edges, iters = 3)
      .as[(String, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      ("a", 0L, 1L, 0L, 500000L),
      ("b", 2L, 0L, 1000000L, 0L),
      ("c", 0L, 1L, 0L, 500000L)), s"unexpected HITS scores: $got")
  }

  test("hub and authority roles separate on a directed graph") {
    val got = run(gate = 1000000L).map(r => r._1 -> r).toMap
    // b: cited by both hubs, cites nobody -> top authority, zero hub
    assert(got("b")._4 > got("a")._4 && got("b")._4 > got("c")._4)
    assert(got("b")._5 == 0L)
    // d: cites two targets, cited by nobody -> hub only
    assert(got("d")._4 == 0L && got("d")._5 > 0L)
  }
}
