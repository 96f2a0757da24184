package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, shingling, portable hashing, MinHash, SimHash,
  * fingerprinting, and quality metrics.
  *
  * Everything here is built from Catalyst higher-order functions — no
  * Scala UDFs — so the whole pipeline stays inside whole-stage codegen
  * and the optimizer can prune/push as usual. Hashes are md5-derived so
  * results are engine-portable (the DuckDB oracle reproduces them
  * bit-for-bit); at 100 TB the md5 cost is still trivially
  * scan-dominated.
  */
object TextAnalysis {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** Distinct word 3-gram shingles (set semantics, for Jaccard).
    *
    * `toks` MUST be a materialized column (project [[tokens]] first, as
    * its own select), not an inline expression: the lambda below indexes
    * into `toks` per shingle, and Catalyst re-evaluates non-attribute
    * subtrees inside lambda bodies per element — an inlined tokenizer
    * would re-split the document once per shingle reference.
    */
  def shingles3(toks: Column): Column = {
    val idx = when(size(toks) >= 3, sequence(lit(1), size(toks) - 2))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(idx, i =>
      concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
        element_at(toks, i + 2))))
  }

  /** Portable 32-bit token hash: first 8 hex digits of md5 as a long.
    * DuckDB equivalent: `cast('0x' || substr(md5(t),1,8) as bigint)`.
    */
  def tokenHash(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** Rolling polynomial document fingerprint over the token stream:
    * fold (acc * 31 + h(token)) mod 1e9+7. Order-sensitive by design —
    * distinguishes permuted documents that shingle-free hashes collapse.
    */
  def fingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 31 + tokenHash(t)) % 1000000007L)

  /** Distinct int64 hashes of word n-gram shingles for arbitrary n —
    * the decontamination primitive (train/eval overlap runs on 8-13
    * token grams, where a shared gram is near-certain verbatim copying).
    * Same materialized-`toks` contract as [[shingles3]].
    */
  def ngramHashes(toks: Column, n: Int): Column =
    array_distinct(gramHashesPositional(toks, n))

  /** POSITIONAL int64 hashes of word n-grams — one hash per gram
    * position, duplicates kept (unlike [[ngramHashes]]): the winnowing
    * input, where the sliding window is over gram POSITIONS. Same
    * materialized-`toks` contract as [[shingles3]].
    */
  def gramHashesPositional(toks: Column, n: Int): Column = {
    val idx = when(size(toks) >= n, sequence(lit(1), size(toks) - (n - 1)))
      .otherwise(array().cast("array<int>"))
    transform(idx, i =>
      tokenHash(concat_ws(" ",
        (0 until n).map(k => element_at(toks, i + k)): _*)))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD 2003): slide a window of `w` consecutive gram hashes and
    * select each window's MINIMUM value; the distinct selected values
    * are the document's fingerprints. Guarantee (the paper's theorem,
    * which holds for value-set selection): any verbatim run of at least
    * w + k - 1 tokens shared by two documents yields at least one
    * shared fingerprint — both documents contain the identical window,
    * and each selects that window's minimum. Expected density is
    * 2/(w+1) of gram positions, so the index is ~(w+1)/2× smaller than
    * indexing every k-gram (q70's shape) at the same detection
    * granularity. Docs shorter than one window contribute the min of
    * all their grams. Runs as interpreted HOFs (slice+array_min per
    * window — ~w nodes/window); a codegen kernel is the upgrade if
    * fingerprinting ever dominates a profile, but at 100 TB the
    * adjacent tokenize+md5 already costs more per row.
    */
  def winnowFingerprints(gramHashes: Column, w: Int): Column = {
    val nWin = when(size(gramHashes) >= 1,
      sequence(lit(1), greatest(size(gramHashes) - (w - 1), lit(1))))
      .otherwise(array().cast("array<int>"))
    array_distinct(transform(nWin, j =>
      array_min(slice(gramHashes, j, lit(w)))))
  }

  /** Distinct int64 hashes of the word 3-gram shingles: each shingle is
    * hashed exactly ONCE (one md5 per shingle, total), and all downstream
    * minhash / verification math runs on the fixed-width hashes — at
    * corpus scale the shuffle carries small long arrays, never the
    * shingle strings.
    */
  def shingleHashes(toks: Column): Column =
    array_distinct(transform(shingles3(toks), g => tokenHash(g)))

  /** Smallest prime above 2^32 — modulus of the affine minhash family. */
  val MinhashPrime: Long = 4294967311L

  /** Deterministic md5-derived affine parameters (a_j, b_j) for hash j.
    * a_j ∈ [1, 2^31): with h < 2^32, a·h + b < 2^63 — no long overflow.
    */
  private[graft] def affineParam(j: Int): (Long, Long) = {
    val a = (md5Hex8(s"a:$j") % ((1L << 31) - 1)) + 1
    val b = md5Hex8(s"b:$j") % (1L << 31)
    (a, b)
  }

  /** First 8 md5 hex digits of a string as a long — the plan-time Scala
    * twin of [[tokenHash]] (same values).
    */
  private[graft] def md5Hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** MinHash signature over pre-hashed shingles: signature j is
    * min over h of (a_j·h + b_j) mod p — one cheap affine pass per seed
    * over an in-memory long array, instead of one md5 pass per seed over
    * the shingle strings. Runs as a codegen'd kernel
    * ([[graft.expressions.MinHashSignature]]): the HOF form of the same
    * math pays ~10 interpreted expression nodes per (seed × shingle),
    * which dominates the whole near-dup query.
    */
  def minhashAffine(hashes: Column, numHashes: Int): Column = {
    val params = (0 until numHashes).map(affineParam)
    org.apache.spark.sql.GraftExpr.column(
      graft.expressions.MinHashSignature(
        org.apache.spark.sql.GraftExpr.expression(hashes),
        params.map(_._1).toArray, params.map(_._2).toArray, MinhashPrime))
  }

  /** Runner-up MinHash signature: signature j is the SECOND-smallest
    * (a_j·h + b_j) mod p over the shingle hashes (multiset semantics;
    * the minimum itself for a single-shingle doc) — same affine family
    * as [[minhashAffine]], so slot j's (min, runner-up) gap says how
    * stable that slot is. Multi-probe near-dup probing perturbs the
    * least-stable slots ([[graft.ops.Dedup.multiProbeBandKeys]]).
    * Codegen kernel like the base signature
    * ([[graft.expressions.MinHash2Signature]]).
    */
  def minhash2Affine(hashes: Column, numHashes: Int): Column = {
    val params = (0 until numHashes).map(affineParam)
    org.apache.spark.sql.GraftExpr.column(
      graft.expressions.MinHash2Signature(
        org.apache.spark.sql.GraftExpr.expression(hashes),
        params.map(_._1).toArray, params.map(_._2).toArray, MinhashPrime))
  }

  /** 32-bit SimHash over the token multiset: bit b is set iff the sum of
    * per-token votes (+1 when bit b of the token hash is set, else -1)
    * is positive. Ties (sum == 0) clear the bit.
    *
    * Runs as a codegen'd kernel ([[graft.expressions.SimHash32]]) over
    * the md5 token hashes — one tight loop instead of ~33 interpreted
    * expression nodes per (token × bit).
    */
  def simhash32(toks: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.SimHash32(
      org.apache.spark.sql.GraftExpr.expression(
        transform(toks, t => tokenHash(t)))))

  /** 60-bit SimHash over [[graft.ops.Sketches.hash60]] token hashes —
    * the WIDE dedup geometry ([[simhash32]]'s majority rule, 60
    * positions): four 15-bit blocking slices give 32768 buckets each,
    * collapsing the blocked self-join's bucket density at corpus
    * scale while keeping the distance-3 pigeonhole recall guarantee.
    */
  def simhash60(toks: Column): Column =
    org.apache.spark.sql.GraftExpr.column(graft.expressions.SimHashBits(
      org.apache.spark.sql.GraftExpr.expression(
        transform(toks, t => graft.ops.Sketches.hash60(t))), 60))

  /** Hamming distance between two simhash values. */
  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Ratio of tokens found in `words` (e.g. stopword ratio, language
    * marker score). Exact rational emitted as double.
    */
  def wordSetRatio(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks,
      t => array_contains(array(words.map(lit): _*), t)))
    when(size(toks) > 0, hits.cast("double") / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** PII / URL patterns — ASCII-simple so Java regex (Spark) and RE2
    * (DuckDB oracles) agree on every match. Category pairs are mutually
    * non-overlapping (emails contain '@', URLs '://', IPs dotted quads,
    * phones exclude dots), so sequential redaction cannot double-apply.
    */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPat = "https?://[A-Za-z0-9./_?=&-]+"
  val IpPat = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhonePat = "\\+?[0-9][0-9-]{7,}[0-9]"

  /** Scrub emails, URLs, IPv4s, and phone numbers from a text column
    * (applied in that order), replacing each with a typed tag.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, lit(EmailPat), lit("<EMAIL>")),
          lit(UrlPat), lit("<URL>")),
        lit(IpPat), lit("<IP>")),
      lit(PhonePat), lit("<PHONE>"))

  /** Common-English marker words for the n-gram/stopword language-ID
    * heuristic (SURVEY: trigram search without indexes → scan-time
    * scoring).
    */
  val EnglishMarkers: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
}
