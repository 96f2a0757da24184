package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** The bucketized range join must equal the naive theta join
  * row-for-row — full recall (an interval covers every bucket a
  * contained point can land in) and no duplicates (a point belongs to
  * exactly one bucket) — for bucket widths far smaller and far larger
  * than the interval spans.
  */
class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random fixtures: intervals of wildly mixed
  // span (0 to ~40 units) over a 1000-unit domain, incl. empty-overlap
  // and point (lo == hi) intervals
  private lazy val intervals = spark.range(0, 120)
    .select(col("id").as("iid"),
      (pmod(hash(col("id") * 7 + 1), lit(1000))).cast("long").as("lo"))
    .withColumn("hi",
      col("lo") + pmod(hash(col("iid") * 13 + 5), lit(41)).cast("long"))
  private lazy val points = spark.range(0, 400)
    .select(col("id").as("pid"),
      pmod(hash(col("id") * 3 + 2), lit(1000)).cast("long").as("pt"))

  private def naive: Set[(Long, Long)] =
    points.crossJoin(intervals)
      .filter(col("pt") >= col("lo") && col("pt") <= col("hi"))
      .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet

  private def bucketized(w: Long): Set[(Long, Long)] = {
    val out = RangeJoin.pointInInterval(points, "pt", intervals,
      "lo", "hi", w)
    // no duplicates: each containment surfaces exactly once
    assert(out.groupBy("pid", "iid").count().filter(col("count") > 1)
      .isEmpty, s"duplicate pairs at width $w")
    out.select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
  }

  test("bucketized == naive theta join at width << span, ~span, >> span") {
    val expect = naive
    assert(expect.nonEmpty)
    for (w <- Seq(3L, 40L, 5000L))
      assert(bucketized(w) == expect, s"mismatch at bucket width $w")
  }

  test("pointInIntervalBlocked == pointInInterval BIT-IDENTICAL at " +
    "every density: under-cap (salts=1) and a sliceCap that salts " +
    "EVERY populated bucket (the flash-crowd shape)") {
    val expect = naive
    // width 5000 puts all 400 points in ONE bucket — cap 16 forces 25
    // blocks; width 3 leaves most buckets under any cap
    for ((w, cap) <- Seq((3L, 1000), (3L, 2), (5000L, 16))) {
      val out = RangeJoin.pointInIntervalBlocked(points, "pt",
        ptKey = struct(col("pid"), col("pt")), intervals, "lo", "hi",
        w, sliceCap = cap)
      assert(out.groupBy("pid", "iid").count().filter(col("count") > 1)
        .isEmpty, s"duplicate pairs at width $w cap $cap")
      assert(out.select(col("pid"), col("iid"))
        .as[(Long, Long)].collect().toSet === expect,
        s"blocked range join drifted at width $w cap $cap")
    }
  }

  test("intervalOverlap == naive theta join, duplicate-free, at " +
    "width << span, ~span, >> span") {
    val l = intervals.select(col("iid").as("lid"), col("lo").as("llo"),
      col("hi").as("lhi"))
    val r = intervals.select(col("iid").as("rid"),
      (col("lo") + 7L).as("rlo"), (col("hi") + 7L).as("rhi"))
    val expect = l.crossJoin(r)
      .filter(col("llo") <= col("rhi") && col("rlo") <= col("lhi"))
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(expect.nonEmpty)
    for (w <- Seq(3L, 40L, 5000L)) {
      val out = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi", w)
      assert(out.groupBy("lid", "rid").count().filter(col("count") > 1)
        .isEmpty, s"duplicate pairs at width $w")
      assert(out.select(col("lid"), col("rid")).as[(Long, Long)]
        .collect().toSet == expect, s"mismatch at bucket width $w")
    }
  }

  test("intervalOverlapCapped: bit-identical to exact below the cap; " +
    "above it a within-salt subset with the predicate intact") {
    val l = intervals.select(col("iid").as("lid"), col("lo").as("llo"),
      col("hi").as("lhi"))
    val r = intervals.select(col("iid").as("rid"),
      (col("lo") + 7L).as("rlo"), (col("hi") + 7L).as("rhi"))
    val exact = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi",
        40L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // every slice is under a generous cap -> salts == 1 everywhere ->
    // the result IS the exact overlap, row for row
    val under = RangeJoin.intervalOverlapCapped(l, "llo", "lhi", "lid",
        r, "rlo", "rhi", "rid", 40L, sliceCap = 100000)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(under === exact, "below the cap the capped op must be exact")
    // forced over the cap: pairs only survive within a salt — a strict,
    // deterministic, non-empty subset whose every row still satisfies
    // the overlap predicate
    val over = RangeJoin.intervalOverlapCapped(l, "llo", "lhi", "lid",
        r, "rlo", "rhi", "rid", 40L, sliceCap = 3)
    val overPairs = over.select(col("lid"), col("rid"))
      .as[(Long, Long)].collect().toSet
    assert(overPairs.nonEmpty && overPairs.subsetOf(exact),
      "capped output must be a subset of the exact overlap")
    assert(overPairs.size < exact.size,
      "cap=3 on dense slices must actually drop cross-salt pairs")
    assert(over.filter(!(col("llo") <= col("rhi") &&
        col("rlo") <= col("lhi"))).isEmpty,
      "surviving pairs must still overlap")
    assert(over.groupBy("lid", "rid").count().filter(col("count") > 1)
      .isEmpty, "capped op must stay duplicate-free")
    val again = RangeJoin.intervalOverlapCapped(l, "llo", "lhi", "lid",
        r, "rlo", "rhi", "rid", 40L, sliceCap = 3)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(again === overPairs, "salting must be deterministic")
  }

  test("intervalOverlapBlocked: bit-identical to exact intervalOverlap " +
    "at EVERY density — including slices forced far over the cap") {
    val l = intervals.select(col("iid").as("lid"), col("lo").as("llo"),
      col("hi").as("lhi"))
    val r = intervals.select(col("iid").as("rid"),
      (col("lo") + 7L).as("rlo"), (col("hi") + 7L).as("rhi"))
    val exact = RangeJoin.intervalOverlap(l, "llo", "lhi", r, "rlo", "rhi",
        40L)
      .select(col("lid"), col("rid")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    // cap=3 forces multi-block slices (the same setting under which the
    // CAPPED op provably drops pairs, pinned above) — the blocked op
    // must still return every pair exactly once
    for (cap <- Seq(3, 100000)) {
      val out = RangeJoin.intervalOverlapBlocked(l, "llo", "lhi", "lid",
        r, "rlo", "rhi", 40L, sliceCap = cap)
      assert(out.groupBy("lid", "rid").count().filter(col("count") > 1)
        .isEmpty, s"duplicate pairs at cap $cap")
      assert(out.select(col("lid"), col("rid")).as[(Long, Long)]
        .collect().toSet == exact,
        s"blocked op must be exact at cap $cap")
    }
  }

  test("negative keys are rejected, not silently mis-bucketed") {
    val badPts = Seq((1L, -5L)).toDF("pid", "pt")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(badPts, "pt", intervals, "lo", "hi", 10L)
        .count()
    }
    assert(ex.getMessage != null)
  }

  test("hi < lo intervals are rejected (descending sequence would " +
    "replicate to wrong buckets)") {
    val bad = Seq((1L, 50L, 20L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.pointInInterval(points, "pt", bad, "lo", "hi", 10L)
        .count()
    }
    assert(ex.getMessage != null)
  }
}
