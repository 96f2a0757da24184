package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval (range) join.
  *
  * Spark has no native range-join strategy: `p.pt BETWEEN i.lo AND
  * i.hi` with no equi-key plans as BroadcastNestedLoopJoin — O(|P|·|I|)
  * comparisons and one side forced through the driver. (The reference
  * has no range joins at all — SURVEY.md §2.5 — but a training-data
  * pipeline needs them the moment intervals enter the picture:
  * sessions, maintenance windows, contaminated spans.)
  *
  * This operator makes the join an EQUI join on a derived bucket key:
  * intervals replicate to every width-`W` bucket they touch
  * (`sequence(lo div W, hi div W)` — replication factor
  * 1 + span/W, bounded when W is sized to the typical span), points
  * map to exactly one bucket, and the exact predicate re-checks inside
  * the joined bucket. Each (point, interval) containment surfaces in
  * EXACTLY one bucket — the point's — so the output needs no
  * dedup: it equals the naive theta-join result row-for-row
  * (RangeJoinSpec pins this against a crossJoin-filter baseline).
  *
  * 100 TB: both sides shuffle once on the bucket key (sort-merge /
  * shuffled-hash — AQE's choice); work per bucket is |P_b|·|I_b|,
  * i.e. quadratic only within a time slice, never across the corpus.
  * Skewed buckets (a flash-crowd hour) split under AQE skew-join
  * handling because the join IS a plain equi join. Pick `W` near the
  * median interval span: smaller W trades interval replication for
  * smaller per-bucket cross products.
  */
object RangeJoin {

  /** Join `points` to every `intervals` row whose `[loCol, hiCol]`
    * (inclusive both ends) contains `ptCol`. All three columns must be
    * LONG in the same unit (e.g. epoch micros); column names across
    * the two frames must be disjoint (as in any Spark join). Extra
    * predicates (e.g. "different user") belong on the returned frame —
    * they filter strictly after containment, so recall is unaffected.
    */
  def pointInInterval(points: DataFrame, ptCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // `div` floors toward -inf only for non-negative operands; shift
    // is unnecessary for epoch-micros domains but negative lows would
    // silently mis-bucket — fail loudly instead (floorDiv in both
    // arms would also work; no current caller has negative keys).
    val iv = intervals
      .withColumn("_rj_bkt",
        explode(sequence(
          longDiv(assertNonNeg(col(loCol)), bucketWidth),
          longDiv(assertOrdered(col(loCol), col(hiCol)), bucketWidth))))
    val pts = points
      .withColumn("_rj_bkt", longDiv(assertNonNeg(col(ptCol)), bucketWidth))
    pts.join(iv,
        pts("_rj_bkt") === iv("_rj_bkt") &&
          col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_rj_bkt")
  }

  /** Join two interval sets on OVERLAP: every (left, right) pair with
    * `[lLo,lHi] ∩ [rLo,rHi] ≠ ∅` (closed ends). Same bucketization as
    * [[pointInInterval]], but since an overlapping pair can share many
    * buckets, each pair is ANCHORED to the single bucket containing
    * `max(lLo, rLo)` — which lies inside both intervals whenever they
    * overlap (max of lows ≤ min of highs), so every overlapping pair
    * surfaces exactly once and no dedup shuffle is needed.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
                      right: DataFrame, rLo: String, rHi: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def spread(df: DataFrame, lo: String, hi: String) = df
      .withColumn("_rj_bkt",
        explode(sequence(
          longDiv(assertNonNeg(col(lo)), bucketWidth),
          longDiv(assertOrdered(col(lo), col(hi)), bucketWidth))))
    val l = spread(left, lLo, lHi)
    val r = spread(right, rLo, rHi)
    l.join(r,
        l("_rj_bkt") === r("_rj_bkt") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          l("_rj_bkt") === longDiv(greatest(col(lLo), col(rLo)), bucketWidth))
      .drop("_rj_bkt")
  }

  /** Exact non-negative long division as a long column (`Column./` is
    * IEEE double division; `(c - c%w)/w` is exactly divisible, so the
    * double it passes through is integral and lossless below 2^53).
    */
  private def longDiv(c: Column, w: Long): Column =
    ((c - (c % lit(w))) / lit(w)).cast("long")

  private def assertNonNeg(c: Column): Column =
    when(c < 0, raise_error(lit(
      "RangeJoin: negative keys unsupported (would mis-bucket under " +
        "truncating div); shift the domain first")))
      .when(c > (1L << 53), raise_error(lit(
        "RangeJoin: keys above 2^53 unsupported (longDiv's double " +
          "pass-through would round); rescale the unit (e.g. nanos -> " +
          "micros) first")))
      .otherwise(c)

  /** `sequence(a, b)` with b < a silently steps DOWNWARD in Spark —
    * a malformed interval would replicate to wrong buckets instead of
    * matching nothing. Fail loudly.
    */
  private def assertOrdered(lo: Column, hi: Column): Column =
    assertNonNeg(when(hi < lo, raise_error(lit(
      "RangeJoin: interval with hi < lo"))).otherwise(hi))
}
