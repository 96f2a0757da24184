package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{RangeJoin, TopK}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ninth pipeline group — the interval dimension and statistical
  * corpus-health audits:
  *
  *  - point-in-interval RANGE JOIN via [[graft.ops.RangeJoin]] (the
  *    equi-bucketized rewrite of a theta join Spark would otherwise
  *    plan as BroadcastNestedLoop; reference has none — SURVEY §2.5);
  *  - Good-Turing count-of-counts + Kneser-Ney absolute discounts
  *    (Chen & Goodman '98 — the smoothing constants every n-gram LM
  *    scorer in the repo presupposes);
  *  - Zipf rank-frequency slope per source (corpus naturalness audit:
  *    templated/synthetic sources flatten the curve away from −1);
  *  - embedding-space dispersion per label (mean cosine to the label
  *    centroid — collapsed embeddings mean a broken encoder).
  *
  * Float rules as established (PipelineQueries5 header): log-derived
  * quantities quantize to integer milli/micro units BEFORE any
  * aggregation, cross-row sums are integer sums (order-free, so
  * bit-deterministic under any partitioning), remaining float ops are
  * single expressions with parenthesization mirrored verbatim in the
  * oracle, and signed quantization uses the shared [[fdiv]] floor
  * form. (Measured, correcting earlier repo lore: Spark `div` and
  * DuckDB `//` BOTH truncate toward zero — −7÷2 = −3 in each — so
  * they agree at every sign; fdiv is used where FLOOR semantics are
  * wanted for negative values, not to reconcile the engines.)
  */
object PipelineQueries9 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"

  /** DuckDB twin of TextAnalysis.tokenHash (md5 first 8 hex digits). */
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** DuckDB twin of TextAnalysis.gramHashesPositional over `toks`
    * (lockstep with the PipelineQueries4/5 twins).
    */
  private def gramHashSql(k: Int): String = {
    val cat = (0 until k).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len(toks) >= $k THEN
       |  list_transform(generate_series(1, len(toks) - ${k - 1}),
       |    i -> ${hashSql(s"($cat)")})
       |ELSE [] END""".stripMargin
  }

  /** Exact FLOOR division for possibly-negative S (integer columns):
    * subtract the canonical non-negative remainder, then the division
    * is exact — and on an exactly-divisible numerator the engines'
    * shared truncation IS floor. (`Column./` passes through an IEEE
    * double, which is lossless here for the same reason.)
    */
  private def fdiv(s: Column, n: Column): Column =
    ((s - ((s % n) + n) % n) / n).cast("long")

  /** DuckDB twin of [[fdiv]] (same canonical-remainder form). */
  private def fdivSql(s: String, n: String): String =
    s"(($s) - ((($s) % ($n)) + ($n)) % ($n)) // ($n)"

  /** Per-user 30-min-gap session intervals in epoch micros (the q18
    * semantics: `session_window` == the gaps-and-islands oracle).
    */
  private def sessionIntervals(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id").as("iu"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(unix_micros(min(col("ts"))).as("lo"),
        unix_micros(max(col("ts"))).as("hi"))
      .select(col("iu"), col("lo"), col("hi"))

  /** DuckDB twin of [[sessionIntervals]]: CTEs ending in
    * `iv(iu, lo, hi)`.
    */
  private val sessionIvSql =
    """flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |           > INTERVAL 30 MINUTE OR
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |    THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM flagged),
      |iv AS (SELECT user_id AS iu, epoch_us(min(ts)) AS lo,
      |         epoch_us(max(ts)) AS hi
      |       FROM sessions GROUP BY user_id, session_id)""".stripMargin

  def defs: Seq[QDef] = Seq(

    // Point-in-interval range join: per-user 30-minute-gap session
    // intervals (q18 semantics) probed with EVERY event — how much
    // other-user traffic lands inside each user's active sessions
    // (co-activity audit). The naive `ts BETWEEN lo AND hi` theta join
    // is O(|events|·|sessions|) and plans as BroadcastNestedLoop;
    // RangeJoin buckets both sides on hour-wide keys so the work is
    // |P_b|·|I_b| per time slice and the join is a plain equi join.
    // Bucket width 1 h ≈ the max observed session span, so intervals
    // replicate ≤ 2×. The BLOCKED variant is the default path (r13
    // verdict 7c): a flash-crowd hour's quadratic re-check splits
    // into deterministic ≤sliceCap point blocks instead of relying on
    // AQE's size-based (not density-based) skew split — exact at
    // every density, bit-identical to the plain bucketized join.
    QDef("q141_session_overlap_rangejoin",
      (s, dir) => {
        val pts = Tables.events(s, dir).select(col("user_id").as("pu"),
          unix_micros(col("ts")).as("pt"))
        val iv = sessionIntervals(s, dir)
          .localCheckpoint() // probed by the range join + session count
        val ov = RangeJoin.pointInIntervalBlocked(pts, "pt",
            ptKey = struct(col("pu"), col("pt")), iv, "lo", "hi",
            bucketWidth = 3600L * 1000000L)
          .filter(col("pu") =!= col("iu"))
          .groupBy("iu").agg(count(lit(1)).as("n_overlap"))
        iv.groupBy("iu").agg(count(lit(1)).as("n_sessions"))
          .join(ov, Seq("iu"), "left")
          .select(col("iu").as("user_id"), col("n_sessions"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      },
      Some(s"""WITH $sessionIvSql,
             |ov AS (SELECT iv.iu, count(*) AS n_overlap
             |       FROM iv JOIN events e
             |         ON epoch_us(e.ts) >= iv.lo AND epoch_us(e.ts) <= iv.hi
             |         AND e.user_id <> iv.iu
             |       GROUP BY iv.iu),
             |ns AS (SELECT iu, count(*) AS n_sessions FROM iv GROUP BY iu)
             |SELECT ns.iu AS user_id, ns.n_sessions,
             |  coalesce(ov.n_overlap, 0) AS n_overlap
             |FROM ns LEFT JOIN ov USING (iu)""".stripMargin)),

    // Good-Turing count-of-counts + Kneser-Ney absolute discounts
    // (Chen & Goodman '98) at the BIGRAM level — the sparse count
    // stratum where smoothing actually operates (this corpus's unigram
    // vocabulary is closed: min token count 26, so unigram N_1..N_4
    // are all zero): the N_r histogram for r ≤ 20 plus the standard
    // D_1/D_2/D_3+ discount estimates in milli units,
    // algebraically reduced to single rationals —
    //   D_1 = N1/(N1+2N2),  D_2 = 2 − 3·N1·N3/((N1+2N2)·N2),
    //   D_3+ = 3 − 4·N1·N4/((N1+2N2)·N3)
    // — so each needs exactly one floor-division (fdiv; possibly
    // negative numerators). The triple products overflow int64 once
    // N_r counts pass ~5·10⁷ — reachable at the 100 TB target — so
    // the N_r scalars compute in DECIMAL(38,0) on the Spark side and
    // DuckDB's native HUGEINT sums on the oracle side: exact to 10³⁸
    // in both engines. The histogram is two groupBys off one token
    // scan: corpus-size-independent output (≤ 20 rows), map-side
    // partials all the way down.
    QDef("q142_good_turing",
      (s, dir) => {
        // `toks` MUST be its own projection before the lambda indexes
        // into it (the PLANS.md re-evaluation trap — a non-attribute
        // subtree would re-split the text once per bigram)
        val cc = Tables.documents(s, dir)
          .select(tokens(col("text")).as("toks"))
          .select(explode(when(size(col("toks")) >= 2,
            transform(sequence(lit(1), size(col("toks")) - 1),
              i => concat_ws(" ", element_at(col("toks"), i),
                element_at(col("toks"), i + 1))))
            .otherwise(array().cast("array<string>"))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
          .groupBy(col("c").as("r")).agg(count(lit(1)).as("n_types"))
          .localCheckpoint() // feeds the N1..N4 pivot + the output rows
        val d38 = org.apache.spark.sql.types.DecimalType(38, 0)
        val n = cc.agg(
          sum(when(col("r") === 1, col("n_types")).otherwise(0L))
            .cast(d38).as("n1"),
          sum(when(col("r") === 2, col("n_types")).otherwise(0L))
            .cast(d38).as("n2"),
          sum(when(col("r") === 3, col("n_types")).otherwise(0L))
            .cast(d38).as("n3"),
          sum(when(col("r") === 4, col("n_types")).otherwise(0L))
            .cast(d38).as("n4"))
        def dm(num: Column, den: Column): Column =
          when(den > 0, fdiv(num, den))
        val y = col("n1") + lit(2L) * col("n2")
        val d = n.select(explode(array(
            struct(lit(1L).as("r"),
              dm(lit(1000L) * col("n1"), y).as("d_milli")),
            struct(lit(2L).as("r"),
              dm(lit(2000L) * y * col("n2") -
                lit(3000L) * col("n1") * col("n3"),
                y * col("n2")).as("d_milli")),
            struct(lit(3L).as("r"),
              dm(lit(3000L) * y * col("n3") -
                lit(4000L) * col("n1") * col("n4"),
                y * col("n3")).as("d_milli")))).as("x"))
          .select(col("x.r").as("r"), col("x.d_milli").as("d_milli"))
        cc.filter(col("r") <= 20)
          .join(broadcast(d), Seq("r"), "left")
          .select(col("r"), col("n_types"),
            coalesce(col("d_milli"), lit(-999999L)).as("d_milli"))
      },
      Some(s"""WITH tt AS (SELECT $toksSql AS toks FROM documents),
              |t AS (SELECT unnest(CASE WHEN len(toks) >= 2 THEN
              |        list_transform(generate_series(1, len(toks) - 1),
              |          i -> toks[i] || ' ' || toks[i+1])
              |        ELSE [] END) AS tok FROM tt),
              |c AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
              |cc AS (SELECT c AS r, count(*) AS n_types FROM c GROUP BY 1),
              |n AS (SELECT
              |    sum(CASE WHEN r=1 THEN n_types ELSE 0 END) AS n1,
              |    sum(CASE WHEN r=2 THEN n_types ELSE 0 END) AS n2,
              |    sum(CASE WHEN r=3 THEN n_types ELSE 0 END) AS n3,
              |    sum(CASE WHEN r=4 THEN n_types ELSE 0 END) AS n4
              |  FROM cc),
              |d AS (
              |  SELECT 1 AS r, CASE WHEN n1+2*n2 > 0 THEN
              |    ${fdivSql("1000*n1", "n1+2*n2")} END
              |    AS d_milli FROM n
              |  UNION ALL
              |  SELECT 2, CASE WHEN (n1+2*n2)*n2 > 0 THEN
              |    ${fdivSql("2000*(n1+2*n2)*n2 - 3000*n1*n3",
                             "(n1+2*n2)*n2")} END
              |    FROM n
              |  UNION ALL
              |  SELECT 3, CASE WHEN (n1+2*n2)*n3 > 0 THEN
              |    ${fdivSql("3000*(n1+2*n2)*n3 - 4000*n1*n4",
                             "(n1+2*n2)*n3")} END
              |    FROM n)
              |SELECT cc.r, cc.n_types,
              |  CAST(coalesce(d.d_milli, -999999) AS BIGINT) AS d_milli
              |FROM cc LEFT JOIN d USING (r) WHERE cc.r <= 20""".stripMargin)),

    // Zipf rank-frequency slope per source: least-squares fit of
    // ln(count) on ln(rank) over each source's top-100 tokens. Natural
    // corpora sit near −1; templated or synthetic sources flatten (or
    // cliff) the curve, so the slope is a one-number naturalness
    // screen per ingest source. The per-source top-100 comes from the
    // bounded two-phase TopK operator (no window over a corpus-scale
    // partition); the regression runs on ≤ 100 integer-quantized
    // points per source, closed form, one final floor-division on
    // offset ground. ln() quantizes to milli BEFORE the sums, so every
    // aggregate is an exact integer.
    QDef("q143_zipf_slope",
      (s, dir) => {
        val counts = Tables.documents(s, dir)
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .groupBy("source", "tok").agg(count(lit(1)).as("cnt"))
        val top = TopK.perGroup(counts, "source",
            struct((-col("cnt")).as("nc"), col("tok").as("tok")), 100)
          .select(col("source"),
            floor(lit(1000.0) *
              log((col("rank") + lit(1L)).cast("double"))).cast("long")
              .as("x"),
            floor(lit(1000.0) *
              log((-col("key.nc")).cast("double"))).cast("long").as("y"))
        val fit = top.groupBy("source").agg(
          count(lit(1)).as("n_top"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        val den = col("n_top") * col("sxx") - col("sx") * col("sx")
        val num = col("n_top") * col("sxy") - col("sx") * col("sy")
        fit.filter(den > 0)
          .select(col("source"), col("n_top"),
            (fdiv(lit(1000L) * num + lit(10000L) * den, den)
              - lit(10000L)).as("slope_milli"))
      },
      Some(s"""WITH t AS (SELECT source, unnest($toksSql) AS tok
              |          FROM documents),
              |c AS (SELECT source, tok, count(*) AS cnt
              |      FROM t GROUP BY 1, 2),
              |r AS (SELECT source, cnt, row_number() OVER (
              |        PARTITION BY source ORDER BY cnt DESC, tok ASC)
              |        AS rn FROM c QUALIFY rn <= 100),
              |q AS (SELECT source,
              |    CAST(floor(1000.0 * ln(CAST(rn AS DOUBLE))) AS BIGINT)
              |      AS x,
              |    CAST(floor(1000.0 * ln(CAST(cnt AS DOUBLE))) AS BIGINT)
              |      AS y FROM r),
              |f AS (SELECT source, count(*) AS n_top, sum(x) AS sx,
              |        sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
              |      FROM q GROUP BY source)
              |SELECT source, n_top,
              |  CAST((1000*(n_top*sxy - sx*sy) + 10000*(n_top*sxx - sx*sx))
              |    // (n_top*sxx - sx*sx) - 10000 AS BIGINT) AS slope_milli
              |FROM f WHERE n_top*sxx - sx*sx > 0""".stripMargin)),

    // Embedding-space dispersion per label: mean cosine similarity of
    // each vector to its label centroid. A healthy encoder separates
    // labels into tight-but-not-degenerate cells; dispersion ≈ 1
    // means collapsed (constant) embeddings, ≈ 0 means the label
    // carries no geometric signal. All cross-row sums are integer
    // (micro-quantized components, integer dot products), so the
    // result is bit-deterministic under any partitioning — the q106
    // k-means discipline. Per-row cosine is one mirrored float
    // expression over exact-integer inputs; per-label mean re-enters
    // integer ground before averaging.
    QDef("q144_embedding_dispersion",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
          .select(col("vec_id"), col("label"),
            transform(col("embedding"), x =>
              floor(x.cast("double") * lit(1000000.0)).cast("long"))
              .as("vq"))
          .localCheckpoint() // centroid agg + per-row cosine probe
        val comp = e.select(col("label"), posexplode(col("vq"))
          .as(Seq("i", "v")))
        val cent = comp.groupBy("label", "i")
          .agg(sum(col("v")).as("sv"), count(lit(1)).as("nv"))
          .select(col("label"), col("i"), fdiv(col("sv"), col("nv")).as("cq"))
          .groupBy("label")
          .agg(transform(array_sort(collect_list(struct(col("i"),
            col("cq")))), p => p.getField("cq")).as("cq"))
        val dots = e.join(broadcast(cent), "label")
          .withColumn("dot", aggregate(zip_with(col("vq"), col("cq"),
            (a, b) => a * b), lit(0L), (acc, t) => acc + t))
          .withColumn("na", aggregate(col("vq"), lit(0L),
            (acc, t) => acc + t * t))
          .withColumn("nb", aggregate(col("cq"), lit(0L),
            (acc, t) => acc + t * t))
          .filter(col("na") > 0 && col("nb") > 0)
          .select(col("label"),
            floor((lit(1000000.0) * col("dot")) /
              (sqrt(col("na").cast("double")) *
                sqrt(col("nb").cast("double")))).cast("long").as("cm"))
        dots.groupBy("label")
          .agg(count(lit(1)).as("n_vecs"), sum(col("cm")).as("sc"))
          .select(col("label").cast("long").as("label"), col("n_vecs"),
            fdiv(col("sc"), col("n_vecs")).as("mean_cos_micro"))
      },
      Some(s"""WITH e AS (SELECT vec_id, label,
              |    list_transform(embedding, x ->
              |      CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
              |      AS vq FROM embeddings),
              |comp AS (SELECT label,
              |    unnest(generate_series(1, len(vq))) AS i,
              |    unnest(vq) AS v FROM e),
              |cent AS (SELECT label, i,
              |    ${fdivSql("sum(v)", "count(*)")} AS cq
              |  FROM comp GROUP BY label, i),
              |centarr AS (SELECT label, list(cq ORDER BY i) AS cq
              |  FROM cent GROUP BY label),
              |z AS (SELECT e.vec_id, e.label,
              |    unnest(e.vq) AS v, unnest(c.cq) AS cv
              |  FROM e JOIN centarr c USING (label)),
              |srow AS (SELECT vec_id, any_value(label) AS label,
              |    sum(v*cv) AS dot, sum(v*v) AS na, sum(cv*cv) AS nb
              |  FROM z GROUP BY vec_id),
              |crow AS (SELECT label,
              |    CAST(floor((1000000.0 * dot) /
              |      (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE))))
              |      AS BIGINT) AS cm
              |  FROM srow WHERE na > 0 AND nb > 0)
              |SELECT CAST(label AS BIGINT) AS label, count(*) AS n_vecs,
              |  CAST(${fdivSql("sum(cm)", "count(*)")} AS BIGINT)
              |    AS mean_cos_micro
              |FROM crow GROUP BY label""".stripMargin)),

    // Interval-OVERLAP self join: the co-presence graph — for every
    // user pair, how many of their session intervals overlap in time.
    // The anchored-bucket construction (RangeJoin.intervalOverlap)
    // keeps this a plain equi join on hour buckets: an overlapping
    // pair surfaces only in the bucket of max(lo_a, lo_b), so there is
    // no post-join dedup shuffle, and per-bucket work is |I_b|² within
    // a time slice — never sessions² across the corpus. The naive
    // `a.lo <= b.hi AND b.lo <= a.hi` form is a BNLJ theta join
    // (plan-contract-pinned away, like q141).
    QDef("q145_session_copresence",
      (s, dir) => {
        val iv = sessionIntervals(s, dir).localCheckpoint() // self-join
        val a = iv.select(col("iu").as("iu_a"), col("lo").as("lo_a"),
          col("hi").as("hi_a"))
        val b = iv.select(col("iu").as("iu_b"), col("lo").as("lo_b"),
          col("hi").as("hi_b"))
        // Skew-BLOCKED overlap (r12 advice fix): the within-slice pair
        // surface is the corpus density's quadratic (measured 100×
        // pairs for 10× rows) and this query advertises the EXACT
        // co-presence graph, so it must pay that surface at every
        // scale — the capped op would silently sample cross pairs
        // once a slice exceeds the cap (sf1's key-replicated slices
        // reach ~1680 replicas). Blocking keeps the answer
        // bit-identical to intervalOverlap while splitting each dense
        // slice into ≤cap-sized left blocks so no straggler task owns
        // a whole mega-slice.
        RangeJoin.intervalOverlapBlocked(a, "lo_a", "hi_a", "iu_a",
            b, "lo_b", "hi_b", bucketWidth = 3600L * 1000000L)
          .filter(col("iu_a") < col("iu_b"))
          .groupBy("iu_a", "iu_b")
          .agg(count(lit(1)).as("n_overlapping_sessions"))
      },
      Some(s"""WITH $sessionIvSql
             |SELECT a.iu AS iu_a, b.iu AS iu_b,
             |  count(*) AS n_overlapping_sessions
             |FROM iv a JOIN iv b
             |  ON a.lo <= b.hi AND b.lo <= a.hi AND a.iu < b.iu
             |GROUP BY 1, 2""".stripMargin)),

    // The SAMPLED co-presence graph — q145's capped sibling, now a
    // first-class oracle-checked query (r12 advice follow-through:
    // the capped op's recall trade must be a tested contract, not a
    // silent property). sliceCap = 8 forces real salting at every SF
    // (sf0.01 slices reach ~17 left replicas), and the DuckDB oracle
    // replays the op LITERALLY — bucket spread, per-slice population,
    // ceil quota, md5 salt, anchor dedup — so which pairs survive is
    // pinned bit-for-bit, not just "some subset". Callers needing the
    // exact graph use q145 (intervalOverlapBlocked) and pay the
    // density quadratic; this shape is the bounded-budget audit that
    // scales as O(cap · replicas).
    QDef("q361_copresence_sampled",
      (s, dir) => {
        val iv = sessionIntervals(s, dir).localCheckpoint() // self-join
        val a = iv.select(col("iu").as("iu_a"), col("lo").as("lo_a"),
          col("hi").as("hi_a"))
        val b = iv.select(col("iu").as("iu_b"), col("lo").as("lo_b"),
          col("hi").as("hi_b"))
        RangeJoin.intervalOverlapCapped(a, "lo_a", "hi_a", "iu_a",
            b, "lo_b", "hi_b", "iu_b",
            bucketWidth = 3600L * 1000000L, sliceCap = 8)
          .filter(col("iu_a") < col("iu_b"))
          .groupBy("iu_a", "iu_b")
          .agg(count(lit(1)).as("n_overlapping_sessions"))
      },
      Some {
        val W = 3600L * 1000000L
        val cap = 8
        def mdh(t: String) =
          s"CAST('0x' || substr(md5($t), 1, 8) AS BIGINT)"
        s"""WITH $sessionIvSql,
           |sa AS (SELECT iu AS iu_a, lo AS lo_a, hi AS hi_a,
           |    unnest(generate_series(lo // $W, hi // $W)) AS bkt
           |  FROM iv),
           |sl AS (SELECT bkt,
           |    (count(*) + ${cap - 1}) // $cap AS salts
           |  FROM sa GROUP BY 1),
           |aa AS (SELECT sa.iu_a, sa.lo_a, sa.hi_a, sa.bkt,
           |    ${mdh(s"'rj:' || CAST(iu_a AS VARCHAR)")} %
           |      coalesce(sl.salts, 1) AS salt
           |  FROM sa LEFT JOIN sl USING (bkt)),
           |sb AS (SELECT iu AS iu_b, lo AS lo_b, hi AS hi_b,
           |    unnest(generate_series(lo // $W, hi // $W)) AS bkt
           |  FROM iv),
           |bb AS (SELECT sb.iu_b, sb.lo_b, sb.hi_b, sb.bkt,
           |    ${mdh(s"'rj:' || CAST(iu_b AS VARCHAR)")} %
           |      coalesce(sl.salts, 1) AS salt
           |  FROM sb LEFT JOIN sl USING (bkt)),
           |j AS (SELECT iu_a, iu_b
           |  FROM aa JOIN bb USING (bkt, salt)
           |  WHERE lo_a <= hi_b AND lo_b <= hi_a
           |    AND bkt = greatest(lo_a, lo_b) // $W
           |    AND iu_a < iu_b)
           |SELECT iu_a, iu_b,
           |  CAST(count(*) AS BIGINT) AS n_overlapping_sessions
           |FROM j GROUP BY 1, 2""".stripMargin
      }),

    // Lag-k autocorrelation of the hourly event-count series (k =
    // 1..24): the rhythm audit that separates organic traffic from
    // replayed/synthetic firehoses (flat or period-24-spiked ACF).
    // The corpus-scale work is ONE groupBy down to O(#hours) rows;
    // the 24 lag alignments and Pearson fits run on that tiny series
    // (broadcast self-join on shifted hour), with every sum an exact
    // integer and one mirrored float sqrt at the end.
    QDef("q146_hourly_autocorrelation",
      (s, dir) => {
        val hourly = Tables.events(s, dir)
          .select(((unix_micros(col("ts")) -
            (unix_micros(col("ts")) % lit(3600000000L))) /
            lit(3600000000L)).cast("long").as("h"))
          .groupBy("h").agg(count(lit(1)).as("n"))
          .localCheckpoint() // both sides of 24 lag alignments
        val lags = s.range(1, 25).select(col("id").as("lag"))
        val pairs = hourly.select(col("h"), col("n").as("x"))
          .crossJoin(broadcast(lags))
          .join(broadcast(hourly.select(col("h").as("h2"),
            col("n").as("y"))), col("h2") === col("h") + col("lag"))
        val f = pairs.groupBy("lag").agg(
          count(lit(1)).as("n_pairs"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        val d1 = col("n_pairs") * col("sxx") - col("sx") * col("sx")
        val d2 = col("n_pairs") * col("syy") - col("sy") * col("sy")
        val num = col("n_pairs") * col("sxy") - col("sx") * col("sy")
        f.filter(d1 > 0 && d2 > 0)
          .select(col("lag"), col("n_pairs"),
            floor((lit(1000.0) * num) /
              (sqrt(d1.cast("double")) * sqrt(d2.cast("double"))))
              .cast("long").as("r_milli"))
      },
      Some("""WITH hourly AS (
             |  SELECT epoch_us(ts) // 3600000000 AS h, count(*) AS n
             |  FROM events GROUP BY 1),
             |pairs AS (
             |  SELECT l.lag, a.n AS x, b.n AS y
             |  FROM (SELECT unnest(generate_series(1, 24)) AS lag) l
             |    CROSS JOIN hourly a JOIN hourly b ON b.h = a.h + l.lag),
             |f AS (SELECT lag, count(*) AS n_pairs,
             |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(x*y) AS BIGINT) AS sxy,
             |    CAST(sum(x*x) AS BIGINT) AS sxx,
             |    CAST(sum(y*y) AS BIGINT) AS syy
             |  FROM pairs GROUP BY lag)
             |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
             |  CAST(floor((1000.0 * (n_pairs*sxy - sx*sy)) /
             |    (sqrt(CAST(n_pairs*sxx - sx*sx AS DOUBLE)) *
             |     sqrt(CAST(n_pairs*syy - sy*sy AS DOUBLE)))) AS BIGINT)
             |    AS r_milli
             |FROM f
             |WHERE n_pairs*sxx - sx*sx > 0 AND n_pairs*syy - sy*sy > 0"""
        .stripMargin)),

    // 8-gram novelty / saturation curve under the TRAINING order (the
    // q75 deterministic 'shard:' hash order, not ingest order): per
    // hash-range checkpoint, how many gram instances arrive and how
    // many distinct 8-grams are NEW — the diminishing-returns curve
    // that prices further data acquisition (a saturated tail means new
    // data re-treads old n-grams). Same decomposition as q139: first
    // occurrence is a groupBy-min over the order key (bucket is a pure
    // function of the min hash), per-checkpoint news are one count,
    // and the only running sum is over the O(#checkpoints ≤ 32) bucket
    // table.
    QDef("q147_gram_novelty_curve",
      (s, dir) => {
        val t = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(
            tokenHash(concat(lit("shard:"), col("doc_id").cast("string")))
              .as("h"),
            gramHashesPositional(col("toks"), 8).as("gh"))
          .localCheckpoint() // per-bucket totals + first occurrences
        val tb = t
          .select(expr("h div 134217728").as("bucket"),
            size(col("gh")).cast("long").as("ng"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n_docs"), sum(col("ng")).as("gi"))
        val nv = t
          .select(col("h"), explode(array_distinct(col("gh"))).as("g"))
          .groupBy("g").agg(min(col("h")).as("fh"))
          .select(expr("fh div 134217728").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("novel"))
        val w = Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        tb.join(nv, Seq("bucket"), "left")
          .select(col("bucket"), col("n_docs"), col("gi"),
            coalesce(col("novel"), lit(0L)).as("novel"))
          .select(col("bucket"),
            sum("n_docs").over(w).as("docs_cum"),
            sum("gi").over(w).as("instances_cum"),
            sum("novel").over(w).as("novel_cum"),
            when(col("gi") > 0,
              expr("(1000 * novel) div gi")).otherwise(lit(0L))
              .as("novelty_milli"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (SELECT
              |    ${hashSql("'shard:' || CAST(doc_id AS VARCHAR)")} AS h,
              |    ${gramHashSql(8)} AS gh FROM t),
              |tb AS (SELECT h // 134217728 AS bucket, count(*) AS n_docs,
              |    CAST(sum(len(gh)) AS BIGINT) AS gi FROM g GROUP BY 1),
              |e AS (SELECT h, unnest(list_distinct(gh)) AS gv FROM g),
              |fo AS (SELECT gv, min(h) AS fh FROM e GROUP BY gv),
              |nv AS (SELECT fh // 134217728 AS bucket, count(*) AS novel
              |    FROM fo GROUP BY 1),
              |j AS (SELECT tb.bucket, tb.n_docs, tb.gi,
              |    coalesce(nv.novel, 0) AS novel
              |  FROM tb LEFT JOIN nv USING (bucket))
              |SELECT bucket,
              |  CAST(sum(n_docs) OVER w AS BIGINT) AS docs_cum,
              |  CAST(sum(gi) OVER w AS BIGINT) AS instances_cum,
              |  CAST(sum(novel) OVER w AS BIGINT) AS novel_cum,
              |  CAST(CASE WHEN gi > 0 THEN (1000 * novel) // gi
              |    ELSE 0 END AS BIGINT) AS novelty_milli
              |FROM j
              |WINDOW w AS (ORDER BY bucket
              |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""
        .stripMargin))
  )
}
