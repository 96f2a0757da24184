package graft.streaming

import graft.functions.TextAnalysis._
import graft.ops.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming shard-manifest maintenance — the streaming twin of q122.
  *
  * The batch manifest's checksum is a bit_xor of per-doc content
  * hashes: commutative and order-free, but NOT idempotent — an
  * at-least-once replay of the same document would toggle the bit
  * pattern and silently corrupt the manifest. The streaming form
  * therefore fuses a first-seen gate into the shard state, keyed on
  * the (doc_id, content) pair actually replayed: a redelivered
  * document is a no-op, while a genuinely distinct document whose
  * text happens to duplicate an earlier one still counts — exactly
  * the batch q122 semantics (every doc counted; equal texts cancel
  * in the xor), now exactly-once under any delivery.
  *
  * State per shard: (n_docs, n_tokens, checksum, seen-key set). The
  * seen set IS the price of replay-proof exact counting — the same
  * O(docs) footprint streaming exact dedup already holds, here
  * partitioned by shard so each task owns its shard's slice.
  *
  * Shard rule: hash-bucketed (`hash(doc_id) mod nShards`) rather than
  * the batch operator's token-balanced prefix sum — a stream cannot
  * know global prefix sums at arrival time. Hash bucketing balances in
  * expectation, is stable under replay, and matches what incremental
  * shard writers do in practice; the token-balanced re-shard is the
  * batch compaction pass (q97/q122) run over the accumulated corpus.
  */
object StreamManifest {

  /** Per-batch updated manifests: emits (shard_id, n_docs, n_tokens,
    * checksum) for every shard touched by the micro-batch, reflecting
    * state AFTER the batch. The drain's latest row per shard (max
    * n_docs — counts are monotone) is the current manifest.
    */
  def manifests(docs: DataFrame, idCol: String, textCol: String,
                nShards: Int = 16): Dataset[(Long, Long, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        pmod(tokenHash(concat(lit("shard:"), col(idCol).cast("string"))),
          lit(nShards.toLong)).cast("long").as("shard"),
        Sketches.hash60(col(textCol)).as("h60"),
        // replay-identity key: the delivered (doc_id, content) pair,
        // NUL-separated so distinct pairs can't concatenate equal
        Sketches.hash60(concat(col(idCol).cast("string"), lit("\u0000"),
          col(textCol))).as("gate"),
        size(tokens(col(textCol))).cast("long").as("n"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (shard: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[(Long, Long, Long, Set[Long])]) =>
          var (nd, nt, cs, seen) =
            state.getOption.getOrElse((0L, 0L, 0L, Set.empty[Long]))
          rows.foreach { case (_, h60, gate, n) =>
            if (!seen.contains(gate)) {
              seen += gate
              nd += 1
              nt += n
              cs ^= h60
            }
          }
          state.update((nd, nt, cs, seen))
          Iterator.single((shard, nd, nt, cs))
      }
  }
}
