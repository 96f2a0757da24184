package graft

import graft.ops.KCore

/** KCore vs a driver-side reference peel on structurally distinct
  * graphs. k-core uniqueness means the reference can peel in any
  * order; the operator must land on the same edge set.
  */
class KCoreSpec extends SparkSpec {

  private def refKCore(edges: Set[(Long, Long)],
                       k: Int): Set[(Long, Long)] = {
    var e = edges
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      changed = e2 != e
      e = e2
    }
    e
  }

  private def run(edges: Set[(Long, Long)], k: Int): Set[(Long, Long)] = {
    import spark.implicits._
    val df = edges.toSeq.toDF("a", "b")
    val (core, rounds) = KCore.kCore(df, "a", "b", k)
    assert(rounds >= 1 || edges.isEmpty)
    core.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("chain has no 2-core; cycle IS its own 2-core") {
    val chain = (1L to 5L).sliding(2).map(s => (s(0), s(1))).toSet
    assert(run(chain, 2) == refKCore(chain, 2))
    assert(refKCore(chain, 2).isEmpty)
    val cycle = chain + ((5L, 1L))
    assert(run(cycle, 2) == refKCore(cycle, 2))
    assert(refKCore(cycle, 2) == cycle)
  }

  test("clique with pendant chain: peel strips the chain transitively") {
    // K4 (ids 1-4) + chain 4-5-6-7: the chain peels over THREE
    // synchronized rounds (7 first, then 6, then 5) — exercises the
    // multi-round fixpoint, not just one sweep
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toSet
    val g = k4 ++ Set((4L, 5L), (5L, 6L), (6L, 7L))
    for (k <- 2 to 4)
      assert(run(g, k) == refKCore(g, k), s"k=$k mismatch")
    assert(refKCore(g, 3) == k4)
    assert(refKCore(g, 4).isEmpty)
  }

  test("two triangles joined by a bridge: the 2-core keeps the bridge " +
    "(both endpoints have degree 3), the 3-core is empty") {
    val t1 = Set((1L, 2L), (2L, 3L), (1L, 3L))
    val t2 = Set((4L, 5L), (5L, 6L), (4L, 6L))
    val g = t1 ++ t2 + ((3L, 4L))
    assert(run(g, 2) == refKCore(g, 2))
    assert(refKCore(g, 2) == g) // every node has degree >= 2
    assert(run(g, 3) == refKCore(g, 3))
    // k=3 peels the triangle corners (degree 2), which unravels
    // everything — including the degree-3 bridge endpoints
    assert(refKCore(g, 3).isEmpty)
  }
}
