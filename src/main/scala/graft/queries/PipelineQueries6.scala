package graft.queries

import graft.Tables
import graft.functions.TextAnalysis._
import graft.ops.{Dedup, Sketches}
import graft.ops.VectorSearch._
import org.apache.spark.sql.functions._

/** Sixth pipeline group: the sketch / clustering layer —
  *
  *  - q106: DISTRIBUTED Lloyd k-means (the scale path of the seeded
  *    driver-side trainer behind q30/q85: here every vector
  *    participates in training, with integer micro-unit sums keeping
  *    the distributed aggregation bit-deterministic).
  *  - q107: SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning
  *    at web-scale through semantic deduplication", 2023): semantic
  *    near-dup pruning WITHIN k-means clusters — the pair join is
  *    bounded by cluster size, never corpus-wide.
  *  - q108: bigram-LM mean NLL per document (add-1 smoothing) — the
  *    sequence-aware upgrade of q78's unigram proxy.
  *  - q109: Bloom-gated decontamination — membership of each corpus
  *    8-gram against the prior/benchmark gram set through an 8 KiB
  *    packed bitset, exact-verified only for bloom candidates. At
  *    100 TB the prior gram set does not fit a broadcast hash set;
  *    the bloom bitset always does, and no-false-negatives means the
  *    exact verify only pays for candidates.
  *  - q110: count-min heavy hitters — the CMS estimate gates which
  *    token occurrences enter the count shuffle, so light tokens
  *    never shuffle; the ≥-estimate property makes the exact verify
  *    complete.
  *  - q111: HyperLogLog per-language distinct-shingle cardinality
  *    (p=8) — partial-max register aggregation IS the sketch merge.
  *  - q112: cross-corpus MinHash near-dup (new batch × prior corpus) —
  *    the incremental-crawl dedup; candidates scale with the batch.
  *  - q113: per-source KL(P_src ‖ P_corpus) token-distribution drift —
  *    the corpus-health monitor, micro-nat-quantized terms.
  *  - q114: histogram-sketch quantiles — the mergeable bounded-state
  *    approximate-percentile path (integer arithmetic end to end).
  *
  * Float rules as established (PipelineQueries5 header): log-derived
  * quantities quantize to integer micro/milli units, IEEE fold order
  * is mirrored verbatim in the oracle SQL, embedded constants are
  * exactly representable or 17-digit round-trips.
  */
object PipelineQueries6 {

  private val toksSql = "list_filter(string_split(text, ' '), x -> x != '')"
  private def hashSql(t: String) =
    s"cast('0x' || substr(md5($t), 1, 8) as bigint)"

  /** DuckDB fragment: positional k-gram hashes over a `toks` column
    * (lockstep with TextAnalysis.gramHashesPositional).
    */
  private def gramHashSql(k: Int): String = {
    val cat = (0 until k).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""CASE WHEN len(toks) >= $k THEN
       |  list_transform(generate_series(1, len(toks) - ${k - 1}),
       |    i -> ${hashSql(s"($cat)")})
       |ELSE [] END""".stripMargin
  }

  /** DuckDB fragment: distinct n-gram hashes (lockstep with
    * TextAnalysis.ngramHashes — q70's shape).
    */
  private def ngramSql(n: Int): String =
    s"list_distinct(${gramHashSql(n)})"

  /** q108's oracle — also the contract of q382 (the served-LM twin):
    * the per-doc mean NLL must be identical whether the count tables
    * are rebuilt inline or served as write-once artifacts. */
  private[queries] val bigramNllOracleSql: String =
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |gp AS (SELECT doc_id, toks, ${gramHashSql(2)} AS gh FROM t),
       |s0 AS (SELECT doc_id, toks,
       |         unnest(generate_series(1, len(gh))) AS i,
       |         unnest(gh) AS g2
       |       FROM gp),
       |s AS (SELECT doc_id, g2, ${hashSql("toks[i]")} AS h1 FROM s0),
       |c2 AS (SELECT g2, count(*) AS c2 FROM s GROUP BY g2),
       |c1 AS (SELECT h1, count(*) AS c1 FROM s GROUP BY h1),
       |vv AS (SELECT count(DISTINCT h1) AS v FROM s),
       |sc AS (SELECT s.doc_id, count(*) AS n_bigrams,
       |         sum(CAST(floor(1000.0 * ln(
       |           (CAST(c2.c2 AS DOUBLE) + 1.0) /
       |           (CAST(c1.c1 AS DOUBLE) + CAST(vv.v AS DOUBLE))))
       |           AS BIGINT)) AS smnat
       |       FROM s JOIN c2 USING (g2) JOIN c1 USING (h1)
       |       CROSS JOIN vv
       |       GROUP BY s.doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |  coalesce(round(CAST(-sc.smnat AS DOUBLE) /
       |    CAST(sc.n_bigrams AS DOUBLE) / 1000.0, 6), 0.0) AS mean_nll
       |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin

  // ---- vector fragments (lockstep with VectorQueries' copies) ----
  private def dotSql(a: String, b: String): String =
    VectorOracleSql.dot(a, b)
  private def normSql(a: String): String = VectorOracleSql.norm(a)
  private def cosSql(a: String, b: String): String =
    VectorOracleSql.cos(a, b)
  private val vSql = "list_transform(embedding, x -> x::DOUBLE)"

  private def dbl(x: Double): String = VectorOracleSql.dbl(x)

  /** DuckDB replay of [[graft.ops.VectorSearch.assignBest]]: the
    * descending (sim, cell) struct sort against literal centroids.
    */
  private def cellsSql(centroids: Array[Array[Double]]): String = {
    def vlit(c: Array[Double]) = VectorOracleSql.vlit(c)
    centroids.zipWithIndex.map { case (c, i) =>
      val n = dbl(math.sqrt(c.map(x => x * x).sum))
      s"{'sim': ${dotSql("v", vlit(c))} / (${normSql("v")} * $n), 'cell': $i}"
    }.mkString("[", ",\n", "]")
  }

  /** q106's late-bound oracle: final-round centroid literals. */
  private object KmOracle { @volatile var sql: Option[String] = None }

  /** q107's late-bound oracle: assignment + within-cluster pair scan. */
  private object SemOracle { @volatile var sql: Option[String] = None }

  // bloom / cms parameters (shared between query and oracle SQL)
  private val BloomM = 65536
  private val BloomK = 5
  private val CmsD = 4
  private val CmsW = 1024

  /** DuckDB twin of [[graft.ops.Sketches]]' affine position hash for
    * seed `s`: (a·g + b) mod p with the minhash parameter family.
    */
  private def affineSql(g: String, seed: Int): String = {
    val (a, b) = graft.functions.TextAnalysis.affineParam(seed)
    s"(($g * $a + $b) % ${graft.functions.TextAnalysis.MinhashPrime})"
  }

  val defs: Seq[QDef] = Seq(

    // Distributed Lloyd k-means over the full embedding corpus. The
    // driver-side sampled trainer (q30/q85/q89) is the bounded
    // APPROXIMATION; this is the exact-assignment path a 100 TB
    // semantic-clustering job needs: per round, one scan assigns every
    // vector against k literal centroids (codegen'd dots, no join) and
    // one groupBy((cell, dim)) re-estimates — k·dims aggregate rows,
    // map-side combined. Components quantize to integer micro-units
    // before the sum (exact long arithmetic, partition-order-free), so
    // training is bit-reproducible and the oracle replays the final
    // assignment from centroid literals (the q30 late-oracle pattern).
    QDef("q106_kmeans_assign",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val init = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 256, seed = 77),
          k = 8, iters = 0, seed = 77)
        val cents = lloydRoundsDistributed(emb, "vec_id", "embedding",
          init, rounds = 3)
        KmOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
             |a AS (SELECT vec_id,
             |        list_reverse_sort(${cellsSql(cents)}) AS cs
             |      FROM e)
             |SELECT vec_id, cs[1].cell AS cell,
             |  round(cs[1].sim, 6) AS sim
             |FROM a""".stripMargin)
        emb.select(col("vec_id"),
            assignBest(toDouble(col("embedding")), cents).as("a"))
          .select(col("vec_id"), col("a.cell").as("cell"),
            round(col("a.sim"), 6).as("sim"))
      },
      None,
      Some(() => KmOracle.sql)),

    // SemDeDup: semantic near-duplicate pruning within k-means
    // clusters. Pair mining joins ONLY on the cluster id, so candidate
    // volume is Σ cell² (the IVF shape) instead of n²; retention is
    // the deterministic lowest-id rule (a vector is removed when a
    // smaller-id vector in ITS cluster is within the cosine
    // threshold). Cross-cluster near-dups are accepted misses — the
    // recall/cost dial is k, exactly the paper's trade.
    QDef("q107_semdedup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val init = kmeansCentroids(
          sampleVectors(emb, "vec_id", "embedding", n = 256, seed = 88),
          k = 8, iters = 0, seed = 88)
        val cents = lloydRoundsDistributed(emb, "vec_id", "embedding",
          init, rounds = 2)
        SemOracle.sql = Some(
          s"""WITH e AS (SELECT vec_id, $vSql AS v FROM embeddings),
             |a AS (SELECT vec_id, v,
             |        list_reverse_sort(${cellsSql(cents)})[1].cell AS cell
             |      FROM e),
             |r AS (SELECT DISTINCT b.vec_id FROM a x JOIN a b
             |        ON x.cell = b.cell AND x.vec_id < b.vec_id
             |      WHERE ${cosSql("x.v", "b.v")} >= 0.4)
             |SELECT a.vec_id, a.cell,
             |  r.vec_id IS NOT NULL AS removed
             |FROM a LEFT JOIN r ON a.vec_id = r.vec_id""".stripMargin)
        val e = emb.select(col("vec_id").as("id"),
            toDouble(col("embedding")).as("v"))
          .withColumn("nrm", norm(col("v")))
          .withColumn("cell", assignBest(col("v"), cents).getField("cell"))
          .localCheckpoint() // feeds both self-join sides + the output
        val pairs = e.as("a").join(e.as("b"),
            col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
          .withColumn("sim",
            dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
          .filter(col("sim") >= 0.4)
        val removed = pairs.select(col("b.id").as("id")).distinct()
          .withColumn("removed", lit(true))
        e.select(col("id"), col("cell"))
          .join(removed, Seq("id"), "left")
          .select(col("id").as("vec_id"), col("cell"),
            coalesce(col("removed"), lit(false)).as("removed"))
      },
      None,
      Some(() => SemOracle.sql)),

    // Bigram-LM mean NLL per document, add-1 smoothed over the
    // bigram-prefix vocabulary — the sequence-aware quality score
    // (q78's unigram proxy cannot see scrambled word order; this
    // does). One checkpointed (doc, bigram-hash, prefix-hash) stream
    // feeds the bigram counts, the prefix counts, and the scoring
    // probe; both count joins key on 8-byte hashes (sort-merge at
    // scale, map-side-combined counts), and the per-position logprob
    // quantizes to integer milli-nats before the per-doc sum.
    QDef("q108_bigram_nll",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val withG = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            gramHashesPositional(col("toks"), 2).as("g2arr"))
        val stream = withG
          .select(col("doc_id"), col("toks"),
            posexplode_outer(col("g2arr")).as(Seq("pos", "g2")))
          .filter(col("g2").isNotNull) // outer + generated-col guard
          .select(col("doc_id"), col("g2"),
            tokenHash(element_at(col("toks"), col("pos") + 1)).as("h1"))
          .localCheckpoint() // feeds c2, c1, vocab AND the probe
        val c2 = stream.groupBy("g2").agg(count(lit(1)).as("c2"))
        val c1 = stream.groupBy("h1").agg(count(lit(1)).as("c1"))
        val vDf = stream.agg(count_distinct(col("h1")).as("v"))
        val scored = stream
          .join(c2, "g2").join(c1, "h1")
          .crossJoin(broadcast(vDf))
          .withColumn("mnat", floor(lit(1000.0) * log(
            (col("c2").cast("double") + 1.0) /
              (col("c1").cast("double") + col("v").cast("double"))))
            .cast("long"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"), sum(col("mnat")).as("smnat"))
          .withColumn("mean_nll",
            round((-col("smnat")).cast("double") /
              col("n_bigrams").cast("double") / lit(1000.0), 6))
        docs.select(col("doc_id"))
          .join(scored, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("mean_nll"), lit(0.0)).as("mean_nll"))
      },
      Some(bigramNllOracleSql)),

    // Bloom-gated decontamination: the prior/benchmark corpus's
    // distinct 8-gram hashes pack into a 2^16-bit bloom (8 KiB — a
    // broadcast literal at ANY corpus size, which the exact gram set
    // is not); every probe-side gram pays k=5 O(1) bit tests, and only
    // bloom candidates enter the exact-verify join. No false negatives
    // (spec-pinned), so `contaminated` is exact; n_bloom_hit > the
    // exact hit count measures the FP tax the 8 KiB bought.
    QDef("q109_bloom_decontaminate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val grams = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), explode(ngramHashes(col("toks"), 8)).as("g"))
          .localCheckpoint() // feeds bloom build, probe, and exact verify
        val prior = grams.filter(col("doc_id") % 31 === 0)
          .select(col("g")).distinct()
        val words = Sketches.bloomBuild(prior, col("g"), BloomM, BloomK)
        val flagged = grams.filter(col("doc_id") % 31 =!= 0)
          .withColumn("hit", Sketches.bloomProbe(col("g"), words,
            BloomM, BloomK))
        val perDoc = flagged.groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("hit"), 1L).otherwise(0L)).as("n_bloom_hit"))
        val exactDocs = flagged.filter(col("hit"))
          .join(prior, Seq("g"), "left_semi")
          .select(col("doc_id")).distinct()
          .withColumn("contaminated", lit(true))
        docs.filter(col("doc_id") % 31 =!= 0).select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .join(exactDocs, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("n_bloom_hit"), lit(0L)).as("n_bloom_hit"),
            coalesce(col("contaminated"), lit(false)).as("contaminated"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |ga AS (SELECT doc_id, ${ngramSql(8)} AS gs FROM t),
              |g AS (SELECT doc_id, unnest(gs) AS g FROM ga),
              |pg AS (SELECT DISTINCT g FROM g WHERE doc_id % 31 = 0),
              |pp AS (SELECT DISTINCT
              |         (${affineSql("g", 9001)} +
              |          i * ${affineSql("g", 9002)}) % $BloomM AS p
              |       FROM pg CROSS JOIN
              |         unnest(generate_series(0, ${BloomK - 1})) AS ti(i)),
              |pr AS (SELECT doc_id, g FROM g WHERE doc_id % 31 <> 0),
              |ph AS (SELECT pr.doc_id, pr.g, count(pp.p) = $BloomK AS hit
              |       FROM pr CROSS JOIN
              |         unnest(generate_series(0, ${BloomK - 1})) AS ti(i)
              |       LEFT JOIN pp ON pp.p =
              |         (${affineSql("pr.g", 9001)} +
              |          i * ${affineSql("pr.g", 9002)}) % $BloomM
              |       GROUP BY pr.doc_id, pr.g),
              |pd AS (SELECT doc_id, count(*) AS n_grams,
              |         sum(CASE WHEN hit THEN 1 ELSE 0 END) AS n_bloom_hit
              |       FROM ph GROUP BY doc_id),
              |ex AS (SELECT DISTINCT pr.doc_id FROM pr JOIN pg USING (g))
              |SELECT d.doc_id,
              |  CAST(coalesce(pd.n_grams, 0) AS BIGINT) AS n_grams,
              |  CAST(coalesce(pd.n_bloom_hit, 0) AS BIGINT) AS n_bloom_hit,
              |  ex.doc_id IS NOT NULL AS contaminated
              |FROM documents d
              |LEFT JOIN pd USING (doc_id)
              |LEFT JOIN ex USING (doc_id)
              |WHERE d.doc_id % 31 <> 0""".stripMargin)),

    // Count-min heavy hitters: the d×w counter matrix (one bounded
    // collect, 32 KiB) gates which token OCCURRENCES enter the exact
    // count shuffle — light tokens are dropped at the scan, so the
    // groupBy only ever sees occurrences of candidate heavy tokens.
    // CMS never underestimates, so every true heavy hitter survives
    // the gate and the exact-verified output is complete. Threshold =
    // ceil(N/200) with N read exactly off the sketch (any row sums to
    // the stream length).
    QDef("q110_cms_heavy_hitters",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = docs
          .select(explode(tokens(col("text"))).as("tok"))
          .select(col("tok"), tokenHash(col("tok")).as("h"))
          .localCheckpoint() // feeds the sketch build AND the gated count
        val counters = Sketches.cmsBuild(toks, col("h"), CmsD, CmsW)
        val n = Sketches.cmsTotal(counters, CmsW)
        val t = (n + 199) / 200
        toks
          .filter(Sketches.cmsEstimate(col("h"), counters, CmsD, CmsW)
            >= lit(t))
          .groupBy("tok").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") >= lit(t))
          .withColumn("est_cnt",
            Sketches.cmsEstimate(tokenHash(col("tok")), counters, CmsD, CmsW))
          .select(col("tok"), col("cnt"), col("est_cnt"))
      },
      Some {
        val a1 = affineSql("h", 9101); val a2 = affineSql("h", 9102)
        s"""WITH e AS (SELECT unnest($toksSql) AS tok FROM documents),
           |eh AS (SELECT tok, ${hashSql("tok")} AS h FROM e),
           |tot AS (SELECT count(*) AS n FROM eh),
           |ctr AS (SELECT ri.i AS r, ($a1 + ri.i * $a2) % $CmsW AS c,
           |          count(*) AS cnt
           |        FROM eh CROSS JOIN
           |          unnest(generate_series(0, ${CmsD - 1})) AS ri(i)
           |        GROUP BY 1, 2),
           |c AS (SELECT tok, count(*) AS cnt FROM eh GROUP BY tok),
           |th AS (SELECT tok, ${hashSql("tok")} AS h FROM c),
           |est AS (SELECT th.tok, min(ctr.cnt) AS est_cnt
           |        FROM th CROSS JOIN
           |          unnest(generate_series(0, ${CmsD - 1})) AS ri(i)
           |        JOIN ctr ON ctr.r = ri.i
           |          AND ctr.c = ($a1 + ri.i * $a2) % $CmsW
           |        GROUP BY th.tok)
           |SELECT c.tok, c.cnt, est.est_cnt
           |FROM c JOIN est USING (tok) CROSS JOIN tot
           |WHERE c.cnt >= (tot.n + 199) // 200""".stripMargin
      }),

    // HyperLogLog distinct 3-gram shingles per language (p=8, 256
    // registers): bucket = low 8 hash bits, rho = leading-zero run of
    // the remaining 52 bits. groupBy(lang, bucket).max(rho) IS the
    // register merge — Spark's partial aggregation does sketch
    // unioning map-side, so the shuffle carries ≤ 256 rows per lang
    // per task no matter how many shingles stream through. The
    // estimate folds 2^-register in ascending bucket order (exact
    // powers of two from a literal table — no pow() libm) with the
    // standard linear-counting correction below 2.5m; the exact
    // distinct count rides along for calibration.
    QDef("q111_hll_distinct",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sh = docs
          .select(col("lang"), tokens(col("text")).as("toks"))
          .select(col("lang"), explode(shingles3(col("toks"))).as("g"))
          .localCheckpoint() // feeds the register agg AND the exact count
        val regs = sh
          .select(col("lang"), Sketches.hash60(col("g")).as("h"))
          .select(col("lang"), Sketches.hllBucket(col("h")).as("bucket"),
            Sketches.hllRho(col("h")).as("rho"))
          .groupBy("lang", "bucket").agg(max("rho").as("r"))
          .groupBy("lang")
          .agg(sort_array(collect_list(struct(col("bucket"), col("r"))))
            .as("regs"))
        val exact = sh.groupBy("lang")
          .agg(count_distinct(col("g")).as("exact_distinct"))
        regs.select(col("lang"),
            Sketches.hllEstimateMilli(col("regs")).as("est_milli"))
          .join(broadcast(exact), Seq("lang")) // one row per language
      },
      Some {
        val m = Sketches.HllM
        val alpha2 = dbl((0.7213 / (1.0 + 1.079 / m)) * m * m)
        val pw = Array.tabulate(54)(j => dbl(math.pow(2.0, -j)))
          .mkString("[", ", ", "]")
        s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
           |g AS (SELECT lang, unnest(list_distinct(
           |        CASE WHEN len(toks) >= 3 THEN
           |          list_transform(generate_series(1, len(toks) - 2),
           |            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           |        ELSE [] END)) AS g
           |      FROM t),
           |h AS (SELECT lang, g,
           |        cast('0x' || substr(md5(g), 1, 15) as bigint) AS h
           |      FROM g),
           |br AS (SELECT lang, h & 255 AS bucket,
           |         CASE WHEN (h >> 8) = 0 THEN 53
           |           ELSE 53 - len(bin(h >> 8)) END AS rho
           |       FROM h),
           |rg AS (SELECT lang, bucket, max(rho) AS r FROM br
           |       GROUP BY lang, bucket),
           |rl AS (SELECT lang,
           |         list({'bucket': bucket, 'r': r} ORDER BY bucket) AS regs
           |       FROM rg GROUP BY lang),
           |es AS (SELECT lang,
           |         list_reduce(list_prepend(0.0::DOUBLE,
           |           list_transform(regs, x -> ($pw)[x.r + 1])),
           |           (p, q) -> p + q) +
           |         CAST($m - len(regs) AS DOUBLE) AS s,
           |         CAST($m - len(regs) AS DOUBLE) AS vz
           |       FROM rl),
           |ee AS (SELECT lang,
           |         CASE WHEN ($alpha2 / s) <= ${dbl(2.5 * m)} AND vz > 0.0
           |           THEN ${dbl(m.toDouble)} * ln(${dbl(m.toDouble)} / vz)
           |           ELSE ($alpha2 / s) END AS est
           |       FROM es),
           |ex AS (SELECT lang, count(DISTINCT g) AS exact_distinct FROM g
           |       GROUP BY lang)
           |SELECT ee.lang,
           |  CAST(floor(1000.0 * ee.est) AS BIGINT) AS est_milli,
           |  CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
           |FROM ee JOIN ex USING (lang)""".stripMargin
      }),

    // Cross-corpus near-dup: which NEW documents (odd ids) near-
    // duplicate the PRIOR corpus (even ids) — the incremental-crawl
    // dedup every production pipeline runs on arrival, as opposed to
    // the q25 within-corpus self-join. Same LSH geometry as q25
    // (b=12, r=2: miss ≈5e-6 at the 0.8 threshold), but the band join
    // is new×prior so candidate volume scales with the BATCH; the
    // prior signature table is write-once state at scale. Oracle =
    // exhaustive exact-Jaccard across the split.
    QDef("q112_crossdup_minhash",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Dedup.nearDupMinhashCross(
          docs.filter(col("doc_id") % 2 === 1),
          docs.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", numBands = 12, rowsPerBand = 2, threshold = 0.8)
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |sh AS (SELECT doc_id, ${ngramSql(3)} AS hs FROM t),
              |p AS (SELECT a.doc_id AS doc_new, b.doc_id AS doc_prior,
              |        len(list_intersect(a.hs, b.hs)) AS inter,
              |        len(a.hs) + len(b.hs)
              |          - len(list_intersect(a.hs, b.hs)) AS uni
              |      FROM sh a JOIN sh b
              |        ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
              |      WHERE len(a.hs) > 0 AND len(b.hs) > 0)
              |SELECT doc_new, doc_prior,
              |  round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6)
              |    AS jaccard
              |FROM p
              |WHERE CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE) >= 0.8"""
        .stripMargin)),

    // Per-source distribution drift: KL(P_source || P_corpus) over the
    // token unigram distribution — the corpus-health monitor that
    // catches a crawl source going off-distribution (spam floods,
    // boilerplate, encoding breakage) before it trains. Each
    // (source, token) term quantizes to integer micro-nats BEFORE the
    // per-source sum (the q78 rule: one ln per term, exact long
    // aggregation, partition-order-free). Scale shape: one checkpointed
    // token stream feeds the (source,tok) counts, the global tok
    // counts, and the per-source totals; the per-term join keys on the
    // token (map-side-combined counts on both sides), totals broadcast.
    QDef("q113_source_drift",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val toks = docs
          .select(col("source"), explode(tokens(col("text"))).as("tok"))
          .localCheckpoint() // feeds st-counts, g-counts, and totals
        val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("cst"))
        val gc = toks.groupBy("tok").agg(count(lit(1)).as("ct"))
        val stot = toks.groupBy("source").agg(count(lit(1)).as("ns"))
        val gtot = toks.agg(count(lit(1)).as("n"))
        val ps = col("cst").cast("double") / col("ns").cast("double")
        val p = col("ct").cast("double") / col("n").cast("double")
        st.join(gc, "tok")
          .join(broadcast(stot), "source")
          .crossJoin(broadcast(gtot))
          .withColumn("term_micro",
            floor(lit(1000000.0) * (ps * log(ps / p))).cast("long"))
          .groupBy("source")
          .agg(max(col("ns")).as("n_tokens"),
            sum(col("term_micro")).as("kl_micro"))
          .select(col("source"), col("n_tokens"), col("kl_micro"))
      },
      Some(s"""WITH e AS (SELECT source, unnest($toksSql) AS tok
              |          FROM documents),
              |st AS (SELECT source, tok, count(*) AS cst FROM e
              |       GROUP BY source, tok),
              |gc AS (SELECT tok, count(*) AS ct FROM e GROUP BY tok),
              |stot AS (SELECT source, count(*) AS ns FROM e GROUP BY source),
              |gtot AS (SELECT count(*) AS n FROM e),
              |terms AS (SELECT st.source,
              |    CAST(floor(1000000.0 *
              |      ((CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE)) *
              |       ln((CAST(cst AS DOUBLE) / CAST(ns AS DOUBLE)) /
              |          (CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))))
              |      AS BIGINT) AS term_micro,
              |    ns
              |  FROM st JOIN gc USING (tok) JOIN stot USING (source)
              |  CROSS JOIN gtot)
              |SELECT source,
              |  CAST(max(ns) AS BIGINT) AS n_tokens,
              |  CAST(sum(term_micro) AS BIGINT) AS kl_micro
              |FROM terms GROUP BY source""".stripMargin)),

    // Histogram-sketch quantiles: per-language token-length p10/p50/p90
    // from a 256-bin fixed-width histogram — the MERGEABLE quantile
    // path q73's exact percentile documents as its scale swap.
    // approx_percentile's GK sketch is arrival-order-dependent (not
    // oracle-checkable); a fixed-bin histogram is pure integer counts:
    // merge = vector add (Spark's partial agg), state O(langs·256), and
    // the quantile read-off is a cumulative scan of ≤256 rows per lang.
    // Estimates are bin midpoints (width 8, capped at bin 255) — error
    // bounded by the bin width; every step is integer arithmetic, so
    // the oracle replays it exactly.
    QDef("q114_histogram_quantiles",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val hist = docs
          .select(col("lang"), tokens(col("text")).as("toks"))
          .select(col("lang"),
            least(floor(size(col("toks")).cast("long") / lit(8L)),
              lit(255L)).cast("long").as("bin"))
          .groupBy("lang", "bin").agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("bin") // ≤256 rows per lang
        val cum = hist
          .withColumn("cum", sum("cnt").over(w))
          .withColumn("total",
            sum("cnt").over(org.apache.spark.sql.expressions.Window
              .partitionBy("lang")))
        def pick(thresholdExpr: String, name: String) =
          min(when(col("cum") >= expr(thresholdExpr),
            col("bin") * 8 + 4)).as(name)
        cum.groupBy("lang")
          .agg(max("total").as("n_docs"),
            pick("(total + 9) div 10", "p10_est"),
            pick("(total + 1) div 2", "p50_est"),
            pick("(9 * total + 9) div 10", "p90_est"))
      },
      Some(s"""WITH t AS (SELECT lang, $toksSql AS toks FROM documents),
              |b AS (SELECT lang,
              |        least(len(toks) // 8, 255) AS bin FROM t),
              |h AS (SELECT lang, bin, count(*) AS cnt FROM b
              |      GROUP BY lang, bin),
              |c AS (SELECT lang, bin, cnt,
              |        sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
              |        sum(cnt) OVER (PARTITION BY lang) AS total
              |      FROM h)
              |SELECT lang,
              |  CAST(max(total) AS BIGINT) AS n_docs,
              |  CAST(min(CASE WHEN cum >= (total + 9) // 10
              |    THEN bin * 8 + 4 END) AS BIGINT) AS p10_est,
              |  CAST(min(CASE WHEN cum >= (total + 1) // 2
              |    THEN bin * 8 + 4 END) AS BIGINT) AS p50_est,
              |  CAST(min(CASE WHEN cum >= (9 * total + 9) // 10
              |    THEN bin * 8 + 4 END) AS BIGINT) AS p90_est
              |FROM c GROUP BY lang""".stripMargin)),

    // Context-window chunking with overlap (size 64, stride 48): the
    // retrieval/eval-prep splitter — distinct from q72's packing
    // (which concatenates SHORT docs; this splits LONG ones, keeping a
    // 16-token overlap so no boundary-straddling span is lost). Chunk
    // count is 1 + ceil(max(n-size,0)/stride) — integer-exact via
    // floor((g+stride-1)/stride.0) — and each chunk is a slice of the
    // materialized token array: one scan, no shuffle at any scale.
    // The outer-explode + generated-column guard keeps the chunk-index
    // pipeline out of inferred filters (PLANS lesson 7).
    QDef("q115_chunk_overlap",
      (s, dir) => {
        val sz = 64
        val stride = 48
        val docs = Tables.documents(s, dir)
        val withIdx = docs
          .select(col("doc_id"), tokens(col("text")).as("toks"))
          .select(col("doc_id"), col("toks"),
            when(size(col("toks")) > 0, sequence(lit(0),
              floor((greatest(size(col("toks")) - lit(sz), lit(0)) +
                lit(stride - 1)) / lit(stride.toDouble)).cast("int")))
              .otherwise(array().cast("array<int>")).as("idx"))
        withIdx
          .select(col("doc_id"), col("toks"),
            posexplode_outer(col("idx")).as(Seq("chunk_idx", "ci")))
          .filter(col("ci").isNotNull) // outer + generated-col guard
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            slice(col("toks"), col("ci") * stride + 1, lit(sz)).as("ctoks"))
          .select(col("doc_id"), col("chunk_idx"),
            size(col("ctoks")).cast("long").as("n_tokens_chunk"),
            array_join(col("ctoks"), " ").as("chunk_text"))
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
              |c AS (SELECT doc_id, toks,
              |        unnest(generate_series(0, CAST(floor(
              |          (greatest(n - 64, 0) + 47) / 48.0) AS INT))) AS ci
              |      FROM n WHERE n > 0),
              |ch AS (SELECT doc_id, ci,
              |         list_slice(toks, ci*48 + 1, ci*48 + 64) AS ctoks
              |       FROM c)
              |SELECT doc_id,
              |  CAST(ci AS BIGINT) AS chunk_idx,
              |  CAST(len(ctoks) AS BIGINT) AS n_tokens_chunk,
              |  array_to_string(ctoks, ' ') AS chunk_text
              |FROM ch""".stripMargin))
  )
}
