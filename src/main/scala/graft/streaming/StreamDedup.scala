package graft.streaming

import graft.functions.TextAnalysis._
import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming dedup: exact (first-seen content hash) and near-dup
  * (MinHash band buckets) across micro-batches.
  *
  * The corpus never arrives in one batch at 100 TB — it streams in as
  * crawls land. Cross-batch dedup therefore needs persistent state:
  * the content hash (or LSH band key) is the grouping key, so Spark's
  * state store holds the per-key memory, partitioned by the same hash
  * the shuffle already uses. State size is O(distinct contents) spread
  * across executors — the same footprint the batch groupBy needs, kept
  * warm instead of recomputed.
  */
object StreamDedup {

  /** Exact first-seen dedup: emit each distinct content exactly once
    * across ALL micro-batches, attributed to its first-seen doc. Within
    * a batch the minimum id wins, matching the batch operator's
    * canonicalization.
    *
    * @param ttlMillis optional state TTL (processing-time): entries
    *        unseen for this long are dropped, bounding state for
    *        endless streams. The trade is recall — a content re-arriving
    *        after the TTL is re-emitted as if never seen. None (the
    *        default) keeps state forever, which is what EXACT global
    *        dedup inherently needs.
    * @return (content_hash, canonical_id) — one row per first-ever-seen
    *         content, emitted in the micro-batch that first carried it
    */
  def firstSeen(docs: DataFrame, idCol: String, contentCol: String,
                ttlMillis: Option[Long] = None): Dataset[(String, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val conf = if (ttlMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .select(md5(col(contentCol)).as("content_hash"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), conf) {
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else if (state.exists) {
            ttlMillis.foreach(state.setTimeoutDuration) // sliding TTL
            Iterator.empty
          } else {
            state.update(true)
            ttlMillis.foreach(state.setTimeoutDuration)
            Iterator.single((hash, rows.map(_._2).min))
          }
      }
  }

  /** Streaming NEAR-dup arrival filter: each arriving doc is flagged if
    * it is a near-duplicate (shingle Jaccard >= threshold) of any
    * retained earlier doc. The batch operator's MinHash-LSH geometry is
    * reused verbatim — same shingles, same affine signatures, same
    * band keys ([[Dedup.bandKeyArray]]) — so batch and stream bucket
    * identically and the stream inherits the measured miss bound
    * (b=12, r=2: ≈5e-6 at s=0.8).
    *
    * State per band key: up to `perBandCap` (id, hash-array) entries of
    * retained (non-duplicate) docs that landed in the bucket. A real
    * near-dup collides with a retained doc in some band with
    * probability 1-(1-s^r)^b; non-dup bucket collisions are rare by
    * LSH design, so the cap only guards the pathological bucket and is
    * a documented recall trade past it. Verification is exact Jaccard
    * on the stored hash arrays, in-function — candidates never shuffle
    * again.
    *
    * A doc may match in several bands → one row per matching band;
    * downstream resolves per-doc with a groupBy min (the drain is
    * already keyed by doc). Emitted: (doc_id, matched_id, jaccard).
    * Note the band-local attribution: a doc flagged (discarded) via
    * band X may still sit in band Y's retained entries, so a later
    * match can attribute to an already-discarded doc. For FILTERING
    * that is correct — near-duplication is transitive enough at these
    * thresholds — and canonical attribution, when needed, is the batch
    * ConnectedComponents pass over the emitted pairs.
    *
    * @param ttlMillis optional sliding state TTL (processing-time): a
    *        band bucket untouched for this long drops its retained
    *        entries, bounding state for endless streams. The trade is
    *        recall — a near-dup of a doc whose buckets all expired is
    *        admitted as novel (the same documented miss as
    *        [[firstSeen]]'s TTL). None keeps state forever, which is
    *        what full-recall global near-dedup inherently costs.
    */
  def nearDupBands(docs: DataFrame, idCol: String, textCol: String,
                   numBands: Int = 12, rowsPerBand: Int = 2,
                   threshold: Double = 0.8,
                   perBandCap: Int = 8,
                   ttlMillis: Option[Long] = None): Dataset[(Long, Long, Double)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val conf = if (ttlMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val sig = docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), shingleHashes(col("toks")).as("hs"))
      .withColumn("mh", minhashAffine(col("hs"), numBands * rowsPerBand))
    sig.select(col("doc_id"), col("hs"),
        explode(Dedup.bandKeyArray(col("mh"), numBands, rowsPerBand)).as("bk"))
      .as[(Long, Seq[Long], Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append(), conf) {
        (_: Long, rows: Iterator[(Long, Seq[Long], Long)],
         state: GroupState[Seq[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var entries = state.getOption.getOrElse(Seq.empty)
            val out = Seq.newBuilder[(Long, Long, Double)]
            // id order within the batch: deterministic regardless of
            // partition-internal arrival order
            rows.toSeq.sortBy(_._1).foreach { case (id, hs, _) =>
              val hsSet = hs.toSet
              val hit = entries.iterator.map { case (cid, chs) =>
                val inter = chs.count(hsSet.contains)
                (cid, inter.toDouble / (hs.size + chs.size - inter))
              }.find(_._2 >= threshold)
              hit match {
                case Some((cid, j)) => out += ((id, cid, j))
                case None =>
                  if (entries.size < perBandCap) entries :+= ((id, hs))
              }
            }
            state.update(entries)
            ttlMillis.foreach(state.setTimeoutDuration) // sliding TTL
            out.result().iterator
          }
      }
  }
}
