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

  /** Distinct word 3-gram shingles (set semantics, for Jaccard). */
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

  /** MinHash signature: for hash seed j, min over shingles of
    * md5(j:shingle) (lexicographic min over hex = uniform min-hash).
    */
  def minhash(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      array_min(transform(shingles,
        t => md5(concat(j.cast("string"), lit(":"), t)))))

  /** 32-bit SimHash over the token multiset: bit b is set iff the sum of
    * per-token votes (+1 when bit b of the token hash is set, else -1)
    * is positive. Ties (sum == 0) clear the bit.
    */
  def simhash32(toks: Column): Column = {
    val hashes = transform(toks, t => tokenHash(t))
    aggregate(sequence(lit(0), lit(31)), lit(0L), (acc, b) => {
      val vote = aggregate(hashes, lit(0L),
        (a, h) => a + when(call_function("shiftright", h, b)
          .bitwiseAND(1) === 1, 1L).otherwise(-1L))
      acc + when(vote > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)
    })
  }

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

  /** Common-English marker words for the n-gram/stopword language-ID
    * heuristic (SURVEY: trigram search without indexes → scan-time
    * scoring).
    */
  val EnglishMarkers: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
}
