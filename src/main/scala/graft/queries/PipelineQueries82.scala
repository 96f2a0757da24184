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
      Some(TextQueries.simhashNearDupOracleSql)),

    // The WIDE simhash geometry (the sf1 density ledger's promised
    // fix, delivered): 60-bit signatures over hash60 token hashes,
    // blocked on four 15-bit slices — same pigeonhole recall
    // guarantee at distance <= 3, but 32768 bucket values per slice
    // instead of 256, so the blocked self-join's Σ bucket² term (the
    // measured 15.5x-for-10x super-linearity of q27's 32-bit sketch
    // at sf1) collapses toward linear. The oracle replays the 60-bit
    // majority rule and brute-force hamming in DuckDB.
    QDef("q402_neardup_simhash_wide",
      (s, dir) => graft.ops.Dedup.nearDupSimhashWide(
        Tables.documents(s, dir), "doc_id", "text"),
      Some(WideSimhashOracle.sql)),

    // The wide geometry MAINTAINED (the r15 verdict #2 rollout): the
    // q401 lifecycle — three arrival slices, mid-life compaction,
    // part-addressed serve, blocked near-dup entirely off the index —
    // at the 60-bit/15-bit-slice geometry the sf1 ledger promotes to
    // default (q402: 7.0x for 10x data where the 32-bit family pays
    // 17.1x — each blocking slice has 32768 bucket values, so the
    // served self-join's Σ bucket² term stays near-linear). The
    // identity pin keeps this store and q401's 32-bit store mutually
    // refusing; ONE oracle (q402's, verbatim) covers inline and
    // maintained, so the two paths cannot drift.
    QDef("q404_simhash_wide_maintained",
      (s, dir) => {
        val store = new java.io.File(
          "target/stream_simhash_wide").getAbsolutePath
        graft.ops.Fs.wipe(store)
        val docs = Tables.documents(s, dir)
        Seq(0, 1).foreach { b =>
          StreamSimhashIndex.applyBatch(
            docs.where(pmod(col("doc_id"), lit(3)) === b), b.toLong,
            "doc_id", "text", store,
            StreamSimhashIndex.WideBits, StreamSimhashIndex.WideBlocks)
        }
        StreamSimhashIndex.compact(s, store)
        StreamSimhashIndex.applyBatch(
          docs.where(pmod(col("doc_id"), lit(3)) === 2), 2L,
          "doc_id", "text", store,
          StreamSimhashIndex.WideBits, StreamSimhashIndex.WideBlocks)
        val sigs = StreamSimhashIndex.servedSigs(s, store,
            StreamSimhashIndex.WideBits, StreamSimhashIndex.WideBlocks)
          .localCheckpoint() // both sides of the blocked join read it
        val b = StreamSimhashIndex.blocked(sigs,
          StreamSimhashIndex.WideBits, StreamSimhashIndex.WideBlocks)
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
      Some(WideSimhashOracle.sql)))

  /** The 60-bit brute-force oracle — ONE copy for the inline (q402)
    * and maintained (q404) wide-sketch queries: replays the majority
    * rule over hash60 token hashes and exact hamming in DuckDB. */
  private object WideSimhashOracle {
    val sql: String =
      s"""WITH t AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), x -> x != '')
         |    AS toks FROM documents),
         |h AS (SELECT doc_id,
         |  list_transform(toks,
         |    t -> cast('0x' || substr(md5(t), 1, 15) as bigint)) AS hs
         |  FROM t),
         |sh AS (SELECT doc_id,
         |  list_sum(list_transform(generate_series(0, 59), b ->
         |    CASE WHEN list_sum(list_transform(hs,
         |      h -> CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
         |    THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS simhash
         |  FROM h)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS dist
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""".stripMargin
  }
}
