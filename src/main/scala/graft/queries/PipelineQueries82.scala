package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.streaming.StreamSimhashIndex
import org.apache.spark.sql.functions._

/** Eighty-second pipeline group — the maintained SimHash signature
  * index ([[graft.streaming.StreamSimhashIndex]]): with it, every
  * dedup/similarity family the engine carries has a maintained
  * corpus-side store (MinHash bands q393, winnow fingerprints q383,
  * sign-LSH buckets q386, IVF postings q395, NSW graph q358 — and
  * now the bit sketch).
  *
  *  - q401: q27's blocked hamming near-dup answered ENTIRELY off the
  *    maintained index — the store keeps the 8-byte signatures, the
  *    Manku byte-blocks derive at read time, and verification is
  *    bit_count over the same served rows: the one dedup question
  *    that never touches document text at all. Same oracle as q27
  *    verbatim (brute-force hamming — EXACT, not probabilistic: the
  *    pigeonhole guarantees a shared byte at distance ≤ 3), so the
  *    maintained and single-shot paths cannot drift.
  *
  * CONCURRENCY SCOPE: drives a fixed `target/` store path — correct
  * under the strictly-single-threaded driver contract (see
  * [[PipelineQueries75]]'s scope note).
  */
object PipelineQueries82 {

  val defs: Seq[QDef] = Seq(

    QDef("q401_simhash_maintained_neardup",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_simhash_serve").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val docs = Tables.documents(s, dir)
        // arrivals in three slices, a mid-life compaction BETWEEN
        // appends — the served index sees the rollup + the late batch
        StreamSimhashIndex.applyBatch(
          docs.where(pmod(col("doc_id"), lit(3)) === 0), 0L,
          "doc_id", "text", store)
        StreamSimhashIndex.applyBatch(
          docs.where(pmod(col("doc_id"), lit(3)) === 1), 1L,
          "doc_id", "text", store)
        StreamSimhashIndex.compact(s, store)
        StreamSimhashIndex.applyBatch(
          docs.where(pmod(col("doc_id"), lit(3)) === 2), 2L,
          "doc_id", "text", store)
        val sigs = StreamSimhashIndex.servedSigs(s, store,
            StreamSimhashIndex.Bits, StreamSimhashIndex.Blocks)
          .localCheckpoint() // both sides of the blocked join read it
        val b = StreamSimhashIndex.blocked(sigs)
        b.as("x").join(b.as("y"),
            col("x.blk") === col("y.blk") &&
              col("x.key") === col("y.key") &&
              col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("doc_a"),
            col("y.doc_id").as("doc_b"),
            TextAnalysis.hamming(col("x.simhash"), col("y.simhash"))
              .as("dist"))
          .distinct()
          .filter(col("dist") <= 3)
      },
      Some(TextQueries.simhashNearDupOracleSql)))
}
