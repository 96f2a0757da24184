package graft.ops

import graft.functions.TextAnalysis._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale design: exact dedup is one hash aggregation on the content
  * hash. Near-dup detection is MinHash-LSH — linear signature pass, then
  * a shuffle keyed on (band, bandValue) so only docs sharing a band ever
  * meet. The exact-Jaccard verification runs only on candidate pairs,
  * never on the full cross product: at 100 TB the candidate set is
  * O(n·dup_rate), not O(n²).
  */
object Dedup {

  /** Fan a narrow input out to full parallelism before a compute-heavy
    * per-row stage. On a cluster the scan already has one split per
    * row-group/file and this is a no-op; the local testdata is a single
    * row group, so without it every downstream hash runs on one core.
    */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Array of per-band LSH keys over a minhash signature column: band
    * k's key = xxhash64(k, mh[k·r+1 .. k·r+r]) — one long per band.
    * Shared with the streaming variant (streaming/StreamDedup) so batch
    * and stream bucket identically.
    */
  private[graft] def bandKeyArray(mh: Column, numBands: Int,
                                  rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)), k =>
      xxhash64((k +: (0 until rowsPerBand).map(r =>
        element_at(mh, k * rowsPerBand + r + 1))): _*))

  /** Multi-probe band keys for MinHash-LSH (Lv et al., VLDB 2007 —
    * the sign-LSH fan-out of
    * [[graft.ops.VectorSearch.multiProbeKeys]] applied to the near-dup
    * band family): per band, the base key PLUS `extraProbes` perturbed
    * keys, probe j swapping the band's j-th LEAST-STABLE slot — the
    * slot whose runner-up hash (`mh2`, [[graft.functions.TextAnalysis
    * .minhash2Affine]]) sits closest to its minimum, i.e. the slot one
    * shingle edit is most likely to flip — for that runner-up value.
    * The CORPUS side keeps ONE key per band forever
    * ([[bandKeyArray]] unchanged — no extra storage); only the query
    * fans out, so recall rises at the price of `1 + extraProbes`
    * bucket lookups per band instead of another index copy. Every
    * expression is a Column over the row (no driver math) and the flip
    * choice is a deterministic array_sort on (gap, slot) pairs,
    * replayable literally in SQL (the q140 lesson). Returns an array
    * of (band, key) structs. */
  private[graft] def multiProbeBandKeys(mh: Column, mh2: Column,
                                        numBands: Int, rowsPerBand: Int,
                                        extraProbes: Int): Column = {
    require(extraProbes <= rowsPerBand,
      "each probe swaps one distinct slot of the band")
    val perBand = (0 until numBands).flatMap { k =>
      def m(s: Int) = element_at(mh, k * rowsPerBand + s + 1)
      def m2(s: Int) = element_at(mh2, k * rowsPerBand + s + 1)
      val base = xxhash64((lit(k).cast("int") +:
        (0 until rowsPerBand).map(m)): _*)
      // slots ordered by (runner-up − min) gap ascending, slot index
      // breaking ties — ascending struct sort, the multiProbeKeys idiom
      val order = array_sort(array((0 until rowsPerBand).map(s =>
        struct((m2(s) - m(s)).as("g"), lit(s).as("s"))): _*))
      val probes = base +: (0 until extraProbes).map { j =>
        val flip = element_at(order, j + 1).getField("s")
        xxhash64((lit(k).cast("int") +: (0 until rowsPerBand).map(s =>
          when(flip === s, m2(s)).otherwise(m(s)))): _*)
      }
      probes.map(key => struct(lit(k).as("band"), key.as("bk")))
    }
    array(perBand: _*)
  }

  /** Exact dedup by content hash: one row per distinct content with the
    * canonical (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_dups"))

  /** MinHash-LSH near-duplicate pairs with exact Jaccard verification.
    *
    * @param numHashes total minhash functions (numBands * rowsPerBand)
    * @param threshold keep pairs with shingle-set Jaccard >= threshold
    *
    * With r=2, b=12 the miss probability for a true pair at s=0.8 is
    * (1-s^2)^b ≈ 0.36^12 ≈ 5e-6 (and ~1e-9 at the s≥0.9 regime planted
    * dups live in) — the affine signatures are cheap enough that the
    * extra bands cost nothing, and the hash-equality gate vs the exact
    * oracle stays robust to new fixtures. Candidates below threshold are
    * filtered exactly.
    */
  /** The checkpointed (doc_id, shingle-hash array, minhash signature)
    * table both minhash flavors run on — one md5 per shingle total,
    * everything downstream on long arrays (see [[nearDupMinhash]] for
    * the inlining/caching rationale the shape encodes).
    */
  private def sigTable(docs: DataFrame, idCol: String, textCol: String,
                       numHashes: Int): DataFrame =
    spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), shingleHashes(col("toks")).as("hs"))
      .withColumn("mh", minhashAffine(col("hs"), numHashes))
      .localCheckpoint()

  /** Cross-corpus MinHash-LSH: which NEW documents near-duplicate a
    * PRIOR corpus — the incremental-crawl dedup shape. Same geometry
    * as [[nearDupMinhash]] (identical shingles, signatures, band
    * keys), but the band join is new×prior instead of a self-join, so
    * candidate volume scales with the new batch, not the full corpus.
    * At production scale the prior side's signature/band table is
    * persisted state written once and joined by every arriving batch
    * (the batch twin of [[graft.streaming.StreamDedup.nearDupBands]]'
    * state store); here it derives inline from the prior partition.
    */
  def nearDupMinhashCross(newDocs: DataFrame, priorDocs: DataFrame,
                          idCol: String, textCol: String,
                          numBands: Int = 12, rowsPerBand: Int = 2,
                          threshold: Double = 0.8): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val sigN = sigTable(newDocs, idCol, textCol, numHashes)
    val sigP = sigTable(priorDocs, idCol, textCol, numHashes)
    def bands(sig: DataFrame) = sig.select(col("doc_id"),
      explode(bandKeyArray(col("mh"), numBands, rowsPerBand)).as("bk"))
    val cand = bands(sigN).as("x").join(bands(sigP).as("y"), "bk")
      .select(col("x.doc_id").as("doc_new"), col("y.doc_id").as("doc_prior"))
      .distinct()
    cand
      .join(sigN.select(col("doc_id").as("doc_new"), col("hs").as("hs_n")),
        "doc_new")
      .join(sigP.select(col("doc_id").as("doc_prior"), col("hs").as("hs_p")),
        "doc_prior")
      .withColumn("inter", size(array_intersect(col("hs_n"), col("hs_p"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("hs_n")) + size(col("hs_p")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_new"), col("doc_prior"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  def nearDupMinhash(docs: DataFrame, idCol: String, textCol: String,
                     numBands: Int = 12, rowsPerBand: Int = 2,
                     threshold: Double = 0.8): DataFrame = {
    val numHashes = numBands * rowsPerBand
    // One md5 per shingle, materialized once; everything downstream
    // (signatures, bucketing, verification) runs on the long array.
    // tokens() is materialized as its own projection first: shingles3
    // indexes into it per element, and an inlined expression there would
    // re-tokenize the document once per shingle (O(n²) per doc).
    //
    // The signature table is cached: it is referenced four times below
    // (both sides of the bucket join + both sides of the verification
    // join), and without the cache Catalyst re-plans and re-executes the
    // whole hashing + minhash subtree per reference (checkpoint cuts the
    // lineage, so analysis + cache-matching never re-walk it). Footprint
    // is one long-array + 16 longs per doc — tiny next to the corpus.
    // The no-shingle guard filters on token count, NOT on size(hs):
    // Catalyst pushes filters through projections by inlining them, and
    // an inlined size(shingleHashes(...)) > 0 at the scan would re-run
    // the whole O(n²) shingle pipeline single-threaded. size(toks) >= 3
    // inlines to one cheap split per row and is equivalent (≥3 tokens ⇔
    // ≥1 shingle).
    val sig = sigTable(docs, idCol, textCol, numHashes)
    // Band key = xxhash64 of the band's rowsPerBand signature values —
    // a single long shuffle key per (doc, band).
    val bands = sig.select(col("doc_id"),
      explode(bandKeyArray(col("mh"), numBands, rowsPerBand)).as("bk"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.bk") === col("y.bk") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    // Exact-Jaccard verification on the fixed-width hash arrays — the
    // shuffle never carries shingle strings.
    val a = sig.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = sig.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** [[nearDupMinhash]] behind the [[ArtifactStore]]: EIGHTEEN query
    * surfaces run the LSH pair table over the full corpus at the
    * default (12, 2) geometry and 0.8 threshold (the dedup-graph
    * family — components, k-core, purity, budgets, ...), and each
    * inline call re-runs the tokenize→shingle→minhash pass plus the
    * band self-join. Addressed by the (id, text) corpus fingerprint +
    * geometry + threshold, the first caller in a sweep builds it and
    * every later caller reads parquet — identical rows either way
    * (integer signatures, deterministic verify, parquet-exact
    * round-trip). No artifact root → plain [[nearDupMinhash]]. */
  def nearDupMinhashArtifact(docs: DataFrame, idCol: String,
                             textCol: String, fpKey: String,
                             numBands: Int = 12, rowsPerBand: Int = 2,
                             threshold: Double = 0.8): DataFrame = {
    val s = docs.sparkSession
    if (ArtifactStore.root(s).isEmpty)
      nearDupMinhash(docs, idCol, textCol, numBands, rowsPerBand, threshold)
    else ArtifactStore.buildOrServe(s, "neardup_minhash_pairs",
      ArtifactStore.fingerprint(
        docs.select(col(idCol), col(textCol)), fpKey),
      // full-precision threshold in the (MD5-hashed) params: rounding to
      // milli-units collided thresholds within 0.0005 onto one content
      // address — the silent-wrong-serve class the full hashing exists
      // to prevent (r16 advice)
      s"nb=$numBands,r=$rowsPerBand,t=$threshold",
      fpKey)(
      nearDupMinhash(docs, idCol, textCol, numBands, rowsPerBand,
        threshold))
  }

  /** Prefix-filtered set-similarity self-join — the AllPairs/PPJoin
    * prefix principle, giving deterministic FULL recall at the
    * threshold (the guarantee-path complement to MinHash-LSH's
    * probabilistic recall). Under any global element order, two sets
    * with Jaccard >= t share their smallest common element inside both
    * length-scaled prefixes (first `|s| - ceil(t*|s|) + 1` of the
    * sorted set): if that element sat past either prefix, the elements
    * before it would all be non-common, leaving fewer than ceil(t*|s|)
    * common elements — below what J >= t forces. So the candidate join
    * keys on prefix elements only: shuffle volume O(n * prefix), bucket
    * sizes shrunk by the t-scaling, never the O(n²) cross product.
    * Verification is exact Jaccard on the sorted hash arrays.
    */
  def nearDupPrefix(docs: DataFrame, idCol: String, textCol: String,
                    threshold: Double = 0.7): DataFrame = {
    val sig = spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_sort(shingleHashes(col("toks"))).as("hs"))
      .localCheckpoint()
    // ceil over double arithmetic overshoots at exact multiples
    // (0.7 * 20 = 14.000000000000002 → ceil 15), which would shorten
    // the prefix below the recall guarantee and over-tighten the length
    // filter exactly at the threshold — the epsilon keeps exact-boundary
    // pairs (J == t) inside both
    def ceilT(n: Column): Column = ceil(lit(threshold) * n - lit(1e-9))
    // The prefix theorem holds under ANY global element order; the
    // canonical AllPairs choice is ascending DOCUMENT FREQUENCY (ties
    // by hash), putting each document's RAREST shingles in its prefix.
    // Measured at sf0.1: 173k → 104k candidate pairs vs hash order —
    // modest here because this synthetic corpus has near-uniform
    // shingle frequencies (most df=1), so the surviving candidates are
    // genuine near-dup families below the threshold, which any
    // full-recall filter must verify. On natural text (Zipfian shingle
    // df) the frequency ranking is what keeps common-shingle buckets
    // out of the join; the extra frequency pass is one cheap agg.
    val exploded = sig.select(col("doc_id"), explode(col("hs")).as("tok"))
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    // checkpointed for the same reason as `sig`: both sides of the
    // candidate self-join reference this subtree, and without the cut
    // the explode+agg+join ranking pipeline is re-planned and
    // re-executed per reference.
    // The rank key packs (df, tok) into ONE long — df in the high bits
    // (capped at 2^31-1; ties among ultra-common shingles fall back to
    // tok order, still a deterministic global order since df is a
    // function of tok), tok (< 2^32) in the low bits. Longs sort with
    // the primitive comparator and shuffle flat — no struct
    // collect/sort/re-project pass — and key equality ⟺ tok equality,
    // so the candidate join can run on the packed keys directly.
    val ranked = exploded.join(freq, "tok")
      .select(col("doc_id"),
        (least(col("df"), lit(2147483647L)) * lit(4294967296L) + col("tok"))
          .as("k"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("k"))).as("hsr"))
      .localCheckpoint()
    val prefixLen = size(col("hsr")) - ceilT(size(col("hsr"))).cast("int") + 1
    val pref = ranked.select(col("doc_id"), size(col("hsr")).as("len"),
      posexplode(slice(col("hsr"), lit(1), prefixLen)))
      .withColumnRenamed("col", "tok")
    // AllPairs length filter: J(a,b) >= t forces t*|a| <= |b| (and
    // symmetrically). PPJoin positional filter on top: matching at
    // 0-based positions (i, j) bounds the overlap by 1 + min(|x|-i-1,
    // |y|-j-1), which must reach the required overlap
    // α = ceil(t/(1+t)·(|x|+|y|)). Sound for full recall: a true
    // pair's FIRST common element (in the global order) sits in both
    // prefixes with all earlier elements non-common, so that row always
    // passes the bound even if deeper matches do not.
    val alpha = ceil(lit(threshold / (1 + threshold)) *
      (col("x.len") + col("y.len")) - lit(1e-9))
    val ubound = lit(1) + least(col("x.len") - col("x.pos") - 1,
      col("y.len") - col("y.pos") - 1)
    val cand = pref.as("x").join(pref.as("y"),
        col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id") &&
          col("y.len") >= ceilT(col("x.len")) &&
          col("x.len") >= ceilT(col("y.len")) &&
          ubound >= alpha)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    val a = sig.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = sig.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("hs_a")) + size(col("hs_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** [[nearDupPrefix]] behind the [[ArtifactStore]] — the verified
    * full-recall pair table is a write-once artifact addressed by the
    * (id, text) corpus fingerprint + threshold, because FIVE query
    * surfaces need exactly this table (the q66 pairs themselves, the
    * q241 strata, and the full-recall truth denominators of q236/
    * q389/q398): within one sweep the first caller pays the prefix
    * join, every later caller reads parquet — identical rows either
    * way (the join is integer/shingle-deterministic and doubles
    * round-trip parquet bit-exactly). No artifact root → plain
    * [[nearDupPrefix]], the spec-pinned inline shape. */
  def nearDupPrefixArtifact(docs: DataFrame, idCol: String,
                            textCol: String, threshold: Double,
                            fpKey: String): DataFrame = {
    val s = docs.sparkSession
    if (ArtifactStore.root(s).isEmpty)
      nearDupPrefix(docs, idCol, textCol, threshold)
    else ArtifactStore.buildOrServe(s, "neardup_prefix_pairs",
      ArtifactStore.fingerprint(
        docs.select(col(idCol), col(textCol)), fpKey),
      s"t=$threshold", fpKey)( // full precision — see nearDupMinhashArtifact
      nearDupPrefix(docs, idCol, textCol, threshold))
  }

  /** One-sided containment pairs: C(a→b) = |S(a) ∩ S(b)| / |S(a)| over
    * the distinct 3-shingle hash sets — the asymmetric near-dup
    * detector (quotations, excerpts, copies-with-additions) that the
    * Jaccard operators structurally miss: when container b is much
    * larger than contained a, J = |∩|/|∪| collapses toward |a|/|b|
    * while C(a→b) stays at 1. Emits ordered pairs with C >= t.
    *
    * Scale design — the AllPairs/PPJoin prefix-filter family (q66),
    * adapted to the one-sided threshold. Required overlap
    * α(a) = ceil(t·|a|). Under ANY global element order, a container
    * must share one of a's first |a| − α + 1 elements (pigeonhole:
    * missing all of them caps the overlap at α − 1), so the PROBE side
    * emits only that prefix (~(1−t) of each doc's shingles); the INDEX
    * side must post every element — containment puts no lower bound on
    * how deep in b the shared elements sit, which is exactly why the
    * symmetric PPJoin length filter does not apply here. Candidate
    * volume is O(n·(1−t)·posting), never n². The global order is
    * ascending document frequency (packed (df, hash) longs — the q66
    * ranking), so probe prefixes hold each doc's RAREST shingles and
    * hot buckets stay out of the join. Positional filter: a first
    * common element at 0-based (i, j) bounds the overlap by
    * min(|a|−i, |b|−j) ≥ α — sound for full recall because a true
    * pair's first common element always passes it. Verification is
    * exact set intersection on the hash arrays, candidates only.
    */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double = 0.9): DataFrame = {
    val sig = spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), array_sort(shingleHashes(col("toks"))).as("hs"))
      .localCheckpoint() // feeds ranking, both join sides, and verify
    // same epsilon as nearDupPrefix: ceil over double arithmetic must
    // not overshoot at exact multiples (0.9 * 20 = 18.000000000000004)
    def ceilT(n: Column): Column = ceil(lit(threshold) * n - lit(1e-9))
    val exploded = sig.select(col("doc_id"), explode(col("hs")).as("tok"))
    val freq = exploded.groupBy("tok").agg(count(lit(1)).as("df"))
    val ranked = exploded.join(freq, "tok")
      .select(col("doc_id"),
        (least(col("df"), lit(2147483647L)) * lit(4294967296L) + col("tok"))
          .as("k"))
      .groupBy("doc_id")
      .agg(array_sort(collect_list(col("k"))).as("hsr"))
      .localCheckpoint() // probe and index sides share this subtree
    val len = size(col("hsr"))
    val prefixLen = len - ceilT(len).cast("int") + 1
    val probe = ranked.select(col("doc_id"), len.as("len"),
        posexplode(slice(col("hsr"), lit(1), prefixLen)))
      .withColumnRenamed("col", "tok")
    val post = ranked.select(col("doc_id"), len.as("len"),
        posexplode(col("hsr")))
      .withColumnRenamed("col", "tok")
    // b-side positional filter: overlap from the first common element
    // onward is at most |b| − j; a-side is enforced by the prefix cut
    val alpha = ceilT(col("a.len"))
    val cand = probe.as("a").join(post.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          (col("b.len") - col("b.pos")) >= alpha)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val a = sig.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
    val b = sig.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))))
      .withColumn("containment",
        col("inter").cast("double") / size(col("hs_a")).cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("containment"), 6).as("containment"))
  }

  /** THE Manku block projection (Manku et al., WWW 2007): one
    * (doc_id, simhash, blk, key) row per blocking slice — `blocks`
    * consecutive slices of `sliceBits` bits each. ONE copy (r15
    * verdict #3): the inline 32-bit family, the wide 60-bit family,
    * and the maintained signature index
    * ([[graft.streaming.StreamSimhashIndex.blocked]]) all derive
    * their blocking keys here, so the pigeonhole recall contract —
    * two hashes within hamming distance `blocks − 1` agree exactly on
    * at least one slice — is defined once, never re-learned per copy.
    */
  def simhashBlocked(sigs: DataFrame, blocks: Int,
                     sliceBits: Int): DataFrame =
    sigs.select(col("doc_id"), col("simhash"), explode(
      transform(sequence(lit(0), lit(blocks - 1)), k =>
        struct(k.as("blk"),
          call_function("shiftright", col("simhash"), k * sliceBits)
            .bitwiseAND((1 << sliceBits) - 1).as("key"))))
      .as("e"))
      .select(col("doc_id"), col("simhash"), col("e.blk"), col("e.key"))

  /** The blocked hamming self-join over a (doc_id, simhash) table —
    * candidates meet only inside (slice, value) buckets (O(n·bucket),
    * never the cross product), verification is pure bit_count. */
  private def simhashBlockPairs(sh: DataFrame, blocks: Int,
                                sliceBits: Int, maxDist: Int): DataFrame = {
    require(maxDist < blocks,
      s"$blocks-slice blocking guarantees recall only to distance " +
        s"${blocks - 1}")
    val blocked = simhashBlocked(sh, blocks, sliceBits)
    blocked.as("x").join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        hamming(col("x.simhash"), col("y.simhash")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** SimHash near-dup pairs: hamming distance <= maxDist over the 32-bit
    * simhash. Blocked on the four 8-bit bytes: by pigeonhole, two hashes
    * within hamming distance 3 agree exactly on at least one byte, so the
    * self-join only meets inside byte-value buckets — O(n·bucket), never
    * the full cross product.
    */
  def nearDupSimhash(docs: DataFrame, idCol: String, textCol: String,
                     maxDist: Int = 3): DataFrame = {
    // Cached for the same reason as the minhash table: both sides of the
    // blocked self-join reference it, and the simhash expression tree is
    // expensive to re-plan and re-execute.
    val sh = spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), simhash32(tokens(col(textCol))).as("simhash"))
      .localCheckpoint()
    simhashBlockPairs(sh, blocks = 4, sliceBits = 8, maxDist = maxDist)
  }

  /** [[nearDupSimhash]] at the WIDE geometry — 60-bit simhash
    * ([[graft.functions.TextAnalysis.simhash60]]) blocked on four
    * 15-bit slices. The recall guarantee is the same pigeonhole
    * (distance <= 3 cannot touch all 4 slices), but each slice has
    * 32768 bucket values instead of 256, so the blocked join's
    * Σ bucket² term — measured SUPER-LINEAR on the 32-bit sketch
    * (q27: 15.5x for 10x data at sf1, every bucket's occupancy
    * growing with the corpus at fixed 1024 total buckets) — collapses
    * toward linear: past ~10k docs per slice-bucket-space the narrow
    * sketch pays quadratically for its width, the wide one doesn't.
    * This is the 100 TB geometry; the 32-bit variant stays for the
    * reference-fixture scale and the cross-engine 32-bit oracle.
    */
  def nearDupSimhashWide(docs: DataFrame, idCol: String, textCol: String,
                         maxDist: Int = 3): DataFrame = {
    val sh = spread(docs.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), simhash60(tokens(col(textCol))).as("simhash"))
      .localCheckpoint()
    simhashBlockPairs(sh, blocks = 4, sliceBits = 15, maxDist = maxDist)
  }
}
