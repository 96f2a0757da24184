package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Forty-seventh pipeline group — weighted near-dup and estimator
  * honesty:
  *
  *  - q309: WEIGHTED-Jaccard near-duplicate pairs over SHINGLE
  *    multisets. Set-Jaccard (q25/q66) collapses repeated content: a
  *    document that loops one paragraph five times has the same
  *    shingle SET as the single paragraph; the weighted measure
  *    J_w = Σ min(tf_a,tf_b) / Σ max(tf_a,tf_b) over 3-gram
  *    multiplicities does not. MinHash cannot sketch J_w directly,
  *    but for INTEGER weights it reduces exactly to set-Jaccard over
  *    replicated virtual elements (shingle, 1..tf) — so the whole
  *    proven q25 LSH stack (affine signatures, band keys, bucket
  *    join) applies verbatim to the virtual-element hashes. The
  *    multiset lives on SHINGLES, not tokens, for the same reason
  *    q313 measures shingle coverage: this corpus has ~31 token
  *    types, and a 31·cap virtual universe makes every minhash
  *    bucket Θ(n) — measured as an 85 s/sf0.1 quadratic blowup
  *    before this was switched (tokens) → after (shingles, 16.5k
  *    types): bucket joins are q25-bounded again. Multiplicities are
  *    capped at 3 (sublinear-tf clamp: replication O(3·shingles); the
  *    capped J_w IS the advertised deterministic measure in both
  *    engines). 12 bands × 2 rows (miss ≈ 5e-6 at the 0.8 threshold,
  *    q25's analysis); exact capped-tf verification on candidates
  *    only.
  *  - q310: sampling-error audit — the honesty check every
  *    sample-based cost estimate needs. A deterministic 1/16 CLUSTER
  *    sample (md5 of l_orderkey, so whole orders survive together —
  *    sampling units must match the correlation structure) estimates
  *    per-returnflag row counts and revenue; the audit joins the
  *    scaled estimates against the exact aggregates and reports
  *    relative errors in micro. At 100 TB the sample predicate pushes
  *    to the scan and the "estimate" branch reads 1/16 of the data —
  *    the audit quantifies exactly what that factor-16 saving costs in
  *    accuracy.
  */
object PipelineQueries47 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private val tokenHashSql =
    "CAST('0x' || substr(md5(__T__), 1, 8) AS BIGINT)"
  /** Sublinear-tf clamp for q309's weighted Jaccard. */
  private val TfCap = 3
  private val WjThresholdMicro = 800000L

  val defs: Seq[QDef] = Seq(

    QDef("q309_neardup_weighted_jaccard",
      (s, dir) => {
        // capped per-doc shingle multiplicities — the weighted-set
        // table both the sketch and the exact verification read.
        // gramHashesPositional keeps duplicate shingles (multiset),
        // unlike q25's distinct shingleHashes.
        val tf = Tables.documents(s, dir)
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"),
            explode(gramHashesPositional(col("toks"), 3)).as("h"))
          .groupBy(col("doc_id"), col("h"))
          .agg(least(count(lit(1)), lit(TfCap.toLong)).as("tf"))
          .localCheckpoint() // feeds signatures AND pair verification
        val sizes = tf.groupBy("doc_id").agg(sum("tf").as("sz"))
        // virtual elements (h, 1..tf), hashed portably; one md5 per
        // virtual element, O(TfCap · tokens) total.
        val sigs = tf
          .select(col("doc_id"),
            explode(sequence(lit(1L), col("tf"))).as("r"), col("h"))
          .select(col("doc_id"),
            tokenHash(concat(col("h").cast("string"), lit("#"),
              col("r").cast("string"))).as("vh"))
          .groupBy("doc_id").agg(collect_list("vh").as("vhs"))
          .select(col("doc_id"), minhashAffine(col("vhs"), 24).as("mh"))
        val bands = sigs.select(col("doc_id"),
          posexplode(Dedup.bandKeyArray(col("mh"), 12, 2))
            .as(Seq("band", "key")))
        val cands = bands.as("a")
          .join(bands.as("b"),
            col("a.band") === col("b.band") &&
              col("a.key") === col("b.key") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("doc_a"),
            col("b.doc_id").as("doc_b"))
          .distinct()
        // exact capped-tf weighted Jaccard on candidates only
        val inter = cands
          .join(tf.as("ta"), col("doc_a") === col("ta.doc_id"))
          .join(tf.as("tb"),
            col("doc_b") === col("tb.doc_id") &&
              col("ta.h") === col("tb.h"))
          .groupBy("doc_a", "doc_b")
          .agg(sum(least(col("ta.tf"), col("tb.tf"))).as("i"))
        inter
          .join(sizes.select(col("doc_id").as("doc_a"),
            col("sz").as("sa")), "doc_a")
          .join(sizes.select(col("doc_id").as("doc_b"),
            col("sz").as("sb")), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            expr("i * 1000000L div (sa + sb - i)")
              .as("wjaccard_micro"))
          .filter(col("wjaccard_micro") >= WjThresholdMicro)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks
              |  FROM documents),
              |tf AS MATERIALIZED (SELECT doc_id,
              |    ${tokenHashSql.replace("__T__", "g")} AS h,
              |    least(CAST(count(*) AS BIGINT), $TfCap) AS tf
              |  FROM (SELECT doc_id,
              |      toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
              |        AS g
              |    FROM t, unnest(generate_series(1, len(toks) - 2))
              |      AS gs(i)
              |    WHERE len(toks) >= 3)
              |  GROUP BY 1, 2),
              |sz AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS sz
              |  FROM tf GROUP BY 1),
              |it AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              |    CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS i
              |  FROM tf a JOIN tf b ON a.h = b.h
              |    AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT doc_a, doc_b,
              |  i * 1000000 // (sa.sz + sb.sz - i) AS wjaccard_micro
              |FROM it JOIN sz sa ON it.doc_a = sa.doc_id
              |  JOIN sz sb ON it.doc_b = sb.doc_id
              |WHERE i * 1000000 // (sa.sz + sb.sz - i)
              |  >= $WjThresholdMicro""".stripMargin)),

    QDef("q310_sample_error_audit",
      (s, dir) => {
        // revenue carried in MILLI units and the relative error divides
        // the denominator down first (sum_exact div 1e6) rather than
        // multiplying the numerator up — a micro-unit corpus revenue
        // sum × 1e6 overflows int64 at sf1 scale. Both operands stay
        // non-negative, so trunc (Spark div) == floor (DuckDB //).
        val li = Tables.lineitem(s, dir)
          .select(col("l_returnflag"),
            floor(col("l_extendedprice") * lit(1000.0)).cast("long")
              .as("pm"),
            (conv(substring(md5(col("l_orderkey").cast("string")),
              1, 8), 16, 10).cast("long") % 16).as("bucket"))
        val exact = li.groupBy("l_returnflag")
          .agg(count(lit(1)).as("n_exact"), sum("pm").as("sum_exact"))
        val est = li.filter(col("bucket") === 0)
          .groupBy("l_returnflag")
          .agg((count(lit(1)) * 16).as("n_est"),
            (sum("pm") * 16).as("sum_est"))
        exact.join(est, Seq("l_returnflag"), "left")
          .select(col("l_returnflag"), col("n_exact"),
            coalesce(col("n_est"), lit(0L)).as("n_est"),
            col("sum_exact"),
            coalesce(col("sum_est"), lit(0L)).as("sum_est"),
            expr("abs(n_exact - coalesce(n_est, 0L)) * 1000000L" +
              " div n_exact").as("n_err_micro"),
            expr("abs(sum_exact - coalesce(sum_est, 0L))" +
              " div greatest(1L, sum_exact div 1000000L)")
              .as("sum_err_micro"))
      },
      Some("""WITH li AS (SELECT l_returnflag,
             |    CAST(floor(l_extendedprice * 1000.0) AS BIGINT)
             |      AS pm,
             |    CAST('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),
             |      1, 8) AS BIGINT) % 16 AS bucket
             |  FROM lineitem),
             |ex AS (SELECT l_returnflag,
             |    CAST(count(*) AS BIGINT) AS n_exact,
             |    CAST(sum(pm) AS BIGINT) AS sum_exact
             |  FROM li GROUP BY 1),
             |es AS (SELECT l_returnflag,
             |    CAST(count(*) * 16 AS BIGINT) AS n_est,
             |    CAST(sum(pm) AS BIGINT) * 16 AS sum_est
             |  FROM li WHERE bucket = 0 GROUP BY 1)
             |SELECT ex.l_returnflag, n_exact,
             |  coalesce(n_est, 0) AS n_est, sum_exact,
             |  coalesce(sum_est, 0) AS sum_est,
             |  abs(n_exact - coalesce(n_est, 0)) * 1000000 // n_exact
             |    AS n_err_micro,
             |  abs(sum_exact - coalesce(sum_est, 0))
             |    // greatest(1, sum_exact // 1000000)
             |    AS sum_err_micro
             |FROM ex LEFT JOIN es USING (l_returnflag)""".stripMargin))
  )
}
