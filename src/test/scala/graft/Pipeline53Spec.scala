package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-11 wave-4 additions: Neyman allocation
  * (q321), compaction plan (q322), canonical-quality audit (q323),
  * Merkle levels (q324). */
class Pipeline53Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q321: weights replay in Scala and both allocations spend at " +
    "most the budget (truncation only)") {
    val rows = SparkEntry.queries("q321_neyman_allocation")(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    val moments = Tables.documents(spark, dir)
      .groupBy("lang").agg(count(lit(1)), sum("n_chars"),
        sum($"n_chars" * $"n_chars"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    rows.foreach { case (lang, n, w, _, _) =>
      val (_, nh, sx, sxx) = moments(lang)
      assert(n === nh)
      assert(w === math.sqrt((nh * sxx - sx * sx).toDouble).floor.toLong,
        s"$lang: N_h·S_h identity broken")
    }
    val prop = rows.map(_._4).sum
    val ney = rows.map(_._5).sum
    assert(prop <= 1000 && prop >= 1000 - rows.length)
    assert(ney <= 1000 && ney >= 1000 - rows.length)
  }

  test("q322: merge groups are consecutive in shard order, bounded " +
    "by the quota, and conserve bytes") {
    val rows = SparkEntry.queries("q322_compaction_plan")(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 32)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._4 >= a._4, "merge_group must be monotone in shard id")
    }
    assert(rows.map(_._4).max <= 8)
    val byGroup = rows.groupBy(_._4)
    byGroup.foreach { case (g, rs) =>
      assert(rs.map(_._2).sum === rs.head._5, s"group $g bytes wrong")
      assert(rs.length.toLong === rs.head._6)
    }
    assert(rows.map(_._2).sum ===
      byGroup.map(_._2.head._5).sum, "bytes not conserved")
  }

  test("q323: pair universe matches q25's near-dup pairs; fractions " +
    "bounded") {
    val Array((n, worse, frac, lost)) =
      SparkEntry.queries("q323_canonical_quality_audit")(spark, dir)
        .as[(Long, Long, Long, Long)].collect()
    val q25 = SparkEntry.queries("q25_neardup_minhash")(spark, dir)
      .count()
    assert(n === q25, "audit must cover exactly the q25 pair list")
    assert(worse <= n && frac <= 1000000 && lost >= 0)
    assert(frac === (if (n == 0) 0 else worse * 1000000L / n))
  }

  test("q324: levels fold by xor, counts telescope, and a single-row " +
    "change flips exactly one node per level") {
    val rows = SparkEntry.queries("q324_merkle_levels")(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    val byLevel = rows.groupBy(_._1)
    assert(byLevel(0L).length === 32)
    assert(byLevel(3L).length === 1)
    val total = Tables.documents(spark, dir).count()
    (0L to 3L).foreach { l =>
      assert(byLevel(l).map(_._4).sum === total, s"level $l rows lost")
    }
    val l0 = byLevel(0L).map(r => r._2 -> r._3).toMap
    Seq((1L, 4L), (2L, 16L), (3L, 32L)).foreach { case (l, d) =>
      byLevel(l).foreach { case (_, node, sig, _) =>
        val kids = l0.filter(_._1 / d == node).values
        assert(kids.reduce(_ ^ _) === sig,
          s"level $l node $node does not fold from level 0")
      }
    }
    // localization: flip one leaf hash -> one changed node per level
    val flipped = l0.updated(0L, l0(0L) ^ 12345L)
    Seq((1L, 4L), (2L, 16L), (3L, 32L)).foreach { case (l, d) =>
      val before = byLevel(l).map(r => r._2 ->
        l0.filter(_._1 / d == r._2).values.reduce(_ ^ _)).toMap
      val after = byLevel(l).map(r => r._2 ->
        flipped.filter(_._1 / d == r._2).values.reduce(_ ^ _)).toMap
      assert(before.count { case (k, v) => after(k) != v } === 1,
        s"level $l: a one-leaf change must flip exactly one node")
    }
  }
}
