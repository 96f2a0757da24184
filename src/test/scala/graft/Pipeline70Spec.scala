package graft

import graft.queries.PipelineQueries70

/** The alias table's defining identities, exact in integers. */
class Pipeline70Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("vose: reconstruction identity — kept mass plus aliased " +
    "overflow equals weight·V exactly, for adversarial weights") {
    val cases = Seq(
      Seq(1L, 1L, 1L, 1L),
      Seq(10L, 1L, 1L, 1L),
      Seq(1L, 999999L),
      Seq(7L, 3L, 3L, 3L, 3L, 1L),
      Seq.tabulate(17)(i => (i + 1).toLong * (i + 1)))
    cases.foreach { w =>
      val v = w.length
      val cap = w.sum
      val table = PipelineQueries70.vose(w)
      table.foreach { case (keep, _) =>
        assert(keep >= 0L && keep <= cap, "slot mass within capacity")
      }
      val got = new Array[Long](v)
      table.zipWithIndex.foreach { case ((keep, alias), i) =>
        got(i) += keep
        got(alias) += cap - keep
      }
      w.indices.foreach { i =>
        assert(got(i) === w(i) * v,
          s"token $i of $w: reconstructed ${got(i)} != ${w(i) * v}")
      }
    }
  }

  test("q357: the emitted table satisfies the identity on the real " +
    "fixture and aliases point at real tokens") {
    val out = SparkEntry.queries("q357_alias_table")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.nonEmpty)
    val v = out.length
    val cap = out.map(_._2).sum
    val toks = out.map(_._1).toSet
    val mass = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    out.foreach { case (t, _, keep, alias) =>
      assert(toks.contains(alias), s"alias $alias is not in the table")
      assert(keep >= 0L && keep <= cap)
      mass(t) += keep
      mass(alias) += cap - keep
    }
    out.foreach { case (t, w, _, _) =>
      assert(mass(t) === w * v, s"$t reconstruction")
    }
  }
}
