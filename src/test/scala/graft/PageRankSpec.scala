package graft

import graft.ops.PageRank
import org.apache.spark.sql.DataFrame

/** The q129 gate contract: broadcast and shuffle paths are the same
  * integer recurrence — switching the plan shape must never move a
  * single micro-unit. PlanContractSpec pins the physical shapes; this
  * spec pins the arithmetic across them, including the deg-0 teleport
  * row (a domain with no out-edges) and an asymmetric degree skew.
  */
class PageRankSpec extends SparkSpec {

  private def fixture: (DataFrame, DataFrame) = {
    import spark.implicits._
    // hub a; chain b-c-d; e isolated (deg 0 → rank = teleport after
    // every iteration); duplicate directed pairs removed as in q129
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("a", "d"),
      ("d", "a"), ("b", "c"), ("c", "b"), ("c", "d"), ("d", "c"))
      .toDF("src", "dst").distinct()
    val nodes = Seq("a", "b", "c", "d", "e").toDF("domain")
    (nodes, edges)
  }

  private def run(gate: Long): Seq[(String, Long, Long)] = {
    import spark.implicits._
    spark.conf.set(PageRank.GateConf, gate.toString)
    try {
      val (nodes, edges) = fixture
      PageRank.domainRanks(nodes, edges, iters = 3)
        .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    } finally spark.conf.unset(PageRank.GateConf)
  }

  test("broadcast and shuffle paths agree micro-unit-exactly") {
    val small = run(gate = 1000000L) // 5 nodes → broadcast path
    val large = run(gate = 0L)       // forces the shuffle path
    assert(small == large, s"paths diverged:\n$small\nvs\n$large")
    // shape sanity: isolated node holds pure teleport mass, hub wins
    val byDomain = small.map(r => r._1 -> r).toMap
    assert(byDomain("e")._2 == 0L && byDomain("e")._3 == 150000L)
    assert(byDomain("a")._3 == small.map(_._3).max)
  }
}
