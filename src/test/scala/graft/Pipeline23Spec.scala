package graft

import graft.ops.{LabelProp, Triangles}
import org.apache.spark.sql.DataFrame

/** Unit pins for the q214/q215 graph family: label propagation
  * separates a barbell into its two cliques (and both gate paths
  * agree bit-exactly), and the degree-ordered triangle construction
  * matches brute-force enumeration on a graph with hubs, bridges and
  * isolated nodes.
  */
class Pipeline23Spec extends SparkSpec {
  import spark.implicits._

  /** Both directions of each undirected edge, as q129/q214 build them. */
  private def undirected(pairs: Seq[(String, String)]): DataFrame =
    (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")

  test("label propagation: a barbell graph splits into its two " +
    "cliques; broadcast and shuffle paths agree") {
    // clique {a1 a2 a3}, clique {b1 b2 b3}, one bridge a3-b1
    val pairs = Seq(
      ("a1", "a2"), ("a1", "a3"), ("a2", "a3"),
      ("b1", "b2"), ("b1", "b3"), ("b2", "b3"),
      ("a3", "b1"))
    val nodes = Seq("a1", "a2", "a3", "b1", "b2", "b3").toDF("domain")
    def run(gate: Long): Map[String, String] = {
      spark.conf.set(LabelProp.GateConf, gate.toString)
      try LabelProp.communities(nodes, undirected(pairs), iters = 3)
        .as[(String, String)].collect().toMap
      finally spark.conf.unset(LabelProp.GateConf)
    }
    val small = run(1000000L)
    assert(small == run(0L), "gate paths diverged")
    // each clique shares one label; the two cliques' labels differ
    val aLabels = Set("a1", "a2", "a3").map(small)
    val bLabels = Set("b1", "b2", "b3").map(small)
    assert(aLabels.size == 1 && bLabels.size == 1,
      s"cliques not uniform: $small")
    assert(aLabels != bLabels, s"bridge merged the cliques: $small")
  }

  test("triangles: degree-ordered counts == brute force on a hub + " +
    "bridge + isolated-node graph") {
    val pairs = Seq(
      // K4 on {a b c d} (4 triangles), hub h linked to a,b,e,f
      ("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d"), ("h", "a"), ("h", "b"), ("h", "e"), ("h", "f"),
      ("e", "f")) // h-e-f closes one more triangle
    val names = Seq("a", "b", "c", "d", "h", "e", "f", "iso")
    val nodes = names.toDF("domain")
    val got = Triangles.perDomain(nodes, undirected(pairs))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // brute force
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def triOf(v: String): Long = {
      val ns = adj.getOrElse(v, Set.empty).toSeq
      ns.combinations(2).count { case Seq(x, y) =>
        adj(x).contains(y)
      }
    }
    names.foreach { v =>
      val deg = adj.getOrElse(v, Set.empty).size.toLong
      val t = triOf(v)
      assert(got(v)._2 == deg && got(v)._3 == t,
        s"$v: got ${got(v)}, want deg=$deg tri=$t")
      val cc = if (deg >= 2) 2000L * t / (deg * (deg - 1)) else 0L
      assert(got(v)._4 == cc, s"$v cc: got ${got(v)._4}, want $cc")
    }
    // sanity on the interesting rows: h saw hab + hef = 2 triangles,
    // K4 members saw 3 each, iso saw none
    assert(got("h")._3 == 2L && got("a")._3 == 4L && got("c")._3 == 3L)
    assert(got("iso") == ("iso", 0L, 0L, 0L))
  }
}
