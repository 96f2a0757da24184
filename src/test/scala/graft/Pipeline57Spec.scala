package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 wave-6 additions: dedup token budget
  * (q328), quantile normalization (q329), Markov removal attribution
  * (q330). */
class Pipeline57Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q328: effective mass is bounded by raw mass and canonical " +
    "counts sum to the distinct-content count") {
    val rows = SparkEntry.queries("q328_dedup_token_budget")(spark, dir)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nd, nc, raw, eff, disc) =>
      assert(nc <= nd && eff <= raw, s"$src: effective exceeds raw")
      assert(disc >= 0 && disc <= 1000000)
    }
    val distinctContents = Tables.documents(spark, dir)
      .select(md5($"text")).distinct().count()
    // a content duplicated ACROSS sources is canonical in exactly one
    assert(rows.map(_._3).sum === distinctContents)
  }

  test("q329: normalization is an exact quantile match (Scala " +
    "replay) and is monotone within every source") {
    val got = SparkEntry
      .queries("q329_quantile_normalization")(spark, dir)
      .as[(Long, String, Long, Long)].collect()
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"source", $"n_chars".cast("long"))
      .as[(Long, String, Long)].collect()
    val n = docs.length.toLong
    val globalSorted = docs.map(_._3).sorted
    val gcum = globalSorted.distinct.map(x =>
      x -> globalSorted.count(_ <= x).toLong).toMap
    val bySource = docs.groupBy(_._2)
    got.foreach { case (id, src, x, xn) =>
      val xs = bySource(src).map(_._3)
      val cum = xs.count(_ <= x).toLong
      val ns = xs.length.toLong
      val expect = globalSorted.distinct.sorted
        .find(g => gcum(g) * ns >= cum * n).get
      assert(xn === expect, s"doc $id ($src, x=$x): $xn != $expect")
    }
    got.groupBy(_._2).foreach { case (src, rs) =>
      rs.sortBy(_._3).sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 <= b._4, s"$src: normalization not monotone")
        case _ =>
      }
    }
  }

  test("q330: removal never increases conversion and every channel " +
    "is attributed") {
    val rows = SparkEntry
      .queries("q330_markov_removal_attribution")(spark, dir)
      .as[(String, Long, Long)].collect()
    val base = rows.find(_._1 == "base").get
    assert(base._2 > 0, "the corpus has purchases — base must convert")
    assert(base._3 === 0L)
    val channels = rows.filterNot(_._1 == "base")
    assert(channels.map(_._1).sorted.toSeq ===
      Seq("click", "error", "signup", "view"))
    channels.foreach { case (c, v, eff) =>
      assert(v <= base._2,
        s"$c: removing a channel cannot increase conversion")
      assert(eff >= 0 && eff <= 1000000, s"$c effect $eff")
      assert(eff === (base._2 - v) * 1000000L / base._2)
    }
  }
}
