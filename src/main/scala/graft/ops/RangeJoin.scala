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

  /** [[pointInInterval]] with per-bucket SKEW BLOCKING — exact output,
    * bounded tasks (r13 verdict 7c: the [[intervalOverlapBlocked]]
    * treatment promoted to the point-in-interval path). AQE's skew
    * split works on shuffle-block SIZE, which catches a big bucket of
    * rows but not a DENSE one whose quadratic |P_b|·|I_b| re-check
    * runs inside a single task; this variant bounds the task shape
    * deterministically instead: points of an over-dense bucket
    * (population > `sliceCap`) split into ceil(pop / sliceCap)
    * key-hash blocks, intervals REPLICATE to every block of each
    * bucket they touch, and each (point, interval) containment still
    * meets exactly once — in the point's (bucket, block). Bit-
    * identical to [[pointInInterval]] at every density (RangeJoinSpec
    * pins an over-cap bucket). The salt decides only WHERE a pair
    * meets, never WHETHER — so it may use xxhash64 (answer-invisible;
    * the house-hash rule binds only answer-visible salts).
    *
    * `ptKey` is any expression over the point row (a struct of id
    * columns) used to spread points uniformly across blocks.
    */
  def pointInIntervalBlocked(points: DataFrame, ptCol: String,
                             ptKey: Column,
                             intervals: DataFrame, loCol: String,
                             hiCol: String, bucketWidth: Long,
                             sliceCap: Int = DefaultSliceCap)
      : DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(sliceCap > 0, "sliceCap must be positive")
    val pts = points
      .withColumn("_rj_bkt", longDiv(assertNonNeg(col(ptCol)), bucketWidth))
    val salts = pts.groupBy("_rj_bkt").agg(count(lit(1)).as("_rj_pop"))
      .select(col("_rj_bkt"),
        ceil(col("_rj_pop") / lit(sliceCap)).cast("int").as("_rj_salts"))
    val l = pts.join(broadcast(salts), Seq("_rj_bkt"), "left")
      .withColumn("_rj_salt",
        pmod(xxhash64(ptKey), coalesce(col("_rj_salts"), lit(1))))
      .drop("_rj_salts")
    // intervals in point-less buckets miss the broadcast (salts only
    // lists populated buckets) → 1 replica, matching nothing
    val iv = intervals
      .withColumn("_rj_bkt",
        explode(sequence(
          longDiv(assertNonNeg(col(loCol)), bucketWidth),
          longDiv(assertOrdered(col(loCol), col(hiCol)), bucketWidth))))
      .join(broadcast(salts), Seq("_rj_bkt"), "left")
      .withColumn("_rj_salt",
        explode(sequence(lit(0L),
          coalesce(col("_rj_salts"), lit(1)).cast("long") - 1)))
      .drop("_rj_salts")
    l.join(iv,
        l("_rj_bkt") === iv("_rj_bkt") &&
          l("_rj_salt") === iv("_rj_salt") &&
          col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_rj_bkt").drop("_rj_salt")
  }

  /** The single source of truth for [[intervalOverlapCapped]]'s slice
    * cap (the [[NswIndex.DefaultBlockCap]] discipline): callers that
    * replay results elsewhere pass it explicitly.
    */
  val DefaultSliceCap = 256

  /** [[intervalOverlap]] with a per-slice DENSITY CAP — the q257/NSW
    * salt-cap applied to time slices.
    *
    * The anchored-bucket rewrite makes the join equi and AQE-splittable,
    * but the within-slice pair surface is quadratic in temporal density:
    * 10× the users in the same calendar hours is ~100× the pairs
    * (measured on the co-presence corpus: Σ slice² grew exactly 100×
    * for 10× rows). Density is the data's property, not the plan's —
    * so above the cap this operator stops being exact, the same honest
    * trade the NSW build makes: every slice whose LEFT-side replica
    * population exceeds `sliceCap` is salted into ceil(pop / sliceCap)
    * deterministic sub-blocks (hash of the caller-named key column —
    * content-independent, replayable) and pairs only form within
    * (slice, salt), so Σ block² ≤ replicas · sliceCap = O(n). Pairs
    * whose two keys hash to different salts of an over-dense slice are
    * SACRIFICED — surviving per-slice pair mass is a ~1/salts uniform
    * sample. Below the cap every salt count is 1 and the result is
    * bit-identical to [[intervalOverlap]] (RangeJoinSpec pins both);
    * callers needing exactness above the cap use [[intervalOverlap]]
    * and own the quadratic.
    *
    * The per-slice population frame is O(#slices) (hours-over-years
    * scale, never corpus scale) and broadcasts into both sides.
    */
  def intervalOverlapCapped(left: DataFrame, lLo: String, lHi: String,
                            lKey: String,
                            right: DataFrame, rLo: String, rHi: String,
                            rKey: String,
                            bucketWidth: Long,
                            sliceCap: Int = DefaultSliceCap): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(sliceCap > 0, "sliceCap must be positive")
    def spread(df: DataFrame, lo: String, hi: String) = df
      .withColumn("_rj_bkt",
        explode(sequence(
          longDiv(assertNonNeg(col(lo)), bucketWidth),
          longDiv(assertOrdered(col(lo), col(hi)), bucketWidth))))
    val salts = spread(left, lLo, lHi)
      .groupBy("_rj_bkt").agg(count(lit(1)).as("_rj_pop"))
      .select(col("_rj_bkt"),
        ceil(col("_rj_pop") / lit(sliceCap)).cast("int").as("_rj_salts"))
    // the salt is ANSWER-VISIBLE here (over-cap slices keep only
    // within-salt pairs), so it uses the house md5 hash — the only
    // hash both engines can replay — never xxhash64 (q361's DuckDB
    // oracle replays this op literally, salts included)
    def salted(df: DataFrame, lo: String, hi: String, key: String) =
      spread(df, lo, hi)
        .join(broadcast(salts), Seq("_rj_bkt"), "left")
        .withColumn("_rj_salt",
          pmod(graft.functions.TextAnalysis.tokenHash(
            concat(lit("rj:"), col(key).cast("string"))),
            coalesce(col("_rj_salts"), lit(1))))
        .drop("_rj_salts")
    val l = salted(left, lLo, lHi, lKey)
    val r = salted(right, rLo, rHi, rKey)
    l.join(r,
        l("_rj_bkt") === r("_rj_bkt") && l("_rj_salt") === r("_rj_salt") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          l("_rj_bkt") === longDiv(greatest(col(lLo), col(rLo)), bucketWidth))
      .drop("_rj_bkt").drop("_rj_salt")
  }

  /** [[intervalOverlap]] with per-slice SKEW BLOCKING — exact output,
    * bounded tasks. The r12 advice fix: [[intervalOverlapCapped]]
    * SAMPLES over-dense slices (cross-salt pairs are sacrificed),
    * which is the wrong contract for a query that advertises the
    * exact co-presence graph. This variant keeps every pair: the LEFT
    * side of an over-dense slice splits into ceil(pop / sliceCap)
    * deterministic key-hash blocks exactly as in the capped op, but
    * the RIGHT side REPLICATES to every block of the slice, so each
    * overlapping pair still meets in (anchor bucket, left block) —
    * exactly once, because the left row carries one block and the
    * right row is present in all of them. Bit-identical to
    * [[intervalOverlap]] at every density (RangeJoinSpec pins an
    * over-cap slice).
    *
    * Cost model, honestly: the exact answer's within-slice pair
    * surface Σ |L_b|·|R_b| is the data's property and no plan avoids
    * paying it — what blocking buys is SKEW, not work: one mega-slice
    * becomes `salts` independent tasks of ≤ sliceCap·|R_b| comparisons
    * each instead of one straggler task of |L_b|·|R_b|, and the right
    * replication factor (= salts, only in over-dense slices) is the
    * pair surface divided by sliceCap — always ≤ the comparisons the
    * task must do anyway. Callers that would rather sample than pay
    * the quadratic use [[intervalOverlapCapped]] and own the recall.
    */
  def intervalOverlapBlocked(left: DataFrame, lLo: String, lHi: String,
                             lKey: String,
                             right: DataFrame, rLo: String, rHi: String,
                             bucketWidth: Long,
                             sliceCap: Int = DefaultSliceCap): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(sliceCap > 0, "sliceCap must be positive")
    def spread(df: DataFrame, lo: String, hi: String) = df
      .withColumn("_rj_bkt",
        explode(sequence(
          longDiv(assertNonNeg(col(lo)), bucketWidth),
          longDiv(assertOrdered(col(lo), col(hi)), bucketWidth))))
    val salts = spread(left, lLo, lHi)
      .groupBy("_rj_bkt").agg(count(lit(1)).as("_rj_pop"))
      .select(col("_rj_bkt"),
        ceil(col("_rj_pop") / lit(sliceCap)).cast("int").as("_rj_salts"))
    val l = spread(left, lLo, lHi)
      .join(broadcast(salts), Seq("_rj_bkt"), "left")
      .withColumn("_rj_salt",
        pmod(xxhash64(col(lKey)), coalesce(col("_rj_salts"), lit(1))))
      .drop("_rj_salts")
    val r = spread(right, rLo, rHi)
      .join(broadcast(salts), Seq("_rj_bkt"), "left")
      .withColumn("_rj_salt",
        explode(sequence(lit(0L),
          coalesce(col("_rj_salts"), lit(1)).cast("long") - 1)))
      .drop("_rj_salts")
    l.join(r,
        l("_rj_bkt") === r("_rj_bkt") && l("_rj_salt") === r("_rj_salt") &&
          col(lLo) <= col(rHi) && col(rLo) <= col(lHi) &&
          l("_rj_bkt") === longDiv(greatest(col(lLo), col(rLo)), bucketWidth))
      .drop("_rj_bkt").drop("_rj_salt")
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
