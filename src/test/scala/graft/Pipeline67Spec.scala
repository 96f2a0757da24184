package graft

import org.apache.spark.sql.functions._

/** Invariant specs for q351/q352. */
class Pipeline67Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q351: cluster-closed folds leak ZERO pairs by construction; " +
    "naive folds leak on this fixture; pair universe == q25's") {
    val out = SparkEntry.queries("q351_fold_leakage")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet === Set("naive", "closed"))
    val q25 = SparkEntry.queries("q25_neardup_minhash")(spark, dir)
      .count()
    assert(out("naive")._1 === q25, "pair universe must be q25's")
    assert(out("closed")._1 === q25)
    assert(out("closed")._2 === 0L,
      "cluster-closed folding must never split a near-dup pair")
    assert(out("closed")._3 === 0L)
    assert(out("naive")._2 > 0L,
      "the fixture must exhibit naive-fold leakage")
  }

  test("q352: weights track count^0.75 exactly, ranks nonincreasing, " +
    "cumulative ranges tile [0, ~1e6]") {
    val out = SparkEntry.queries("q352_negative_sampling")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    // replay: same pow + floor arithmetic from the output's own counts
    val tot = out.map(t => math.pow(t._2.toDouble, 0.75)).sum
    var cum = 0L
    out.sortBy(t => (-t._2, t._1)).foreach { case (tok, c, wm, ch) =>
      val want = math.floor(math.pow(c.toDouble, 0.75) / tot * 1e6).toLong
      assert(wm === want, s"$tok weight replay")
      cum += want
      assert(ch === cum, s"$tok cumulative range")
    }
    assert(cum <= 1000000L && cum > 1000000L - out.length,
      "ranges must tile the micro interval")
    val byRank = out.sortBy(t => (-t._2, t._1)).map(_._3)
    byRank.zip(byRank.tail).foreach { case (a, b) =>
      assert(a >= b, "weights must be nonincreasing in count rank")
    }
  }
}
