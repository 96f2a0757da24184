package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming chunk-level dedup — the [[graft.ops.CdcChunks]] twin for
  * arriving corpora: each micro-batch's documents are chunked at the
  * same content-defined anchors, and each distinct chunk CONTENT is
  * emitted exactly once across all batches (the
  * [[StreamDedup.firstSeen]] state shape, keyed on the 60-bit chunk
  * hash). Chunk-level streaming dedup is what incremental crawl
  * ingestion actually wants: a re-crawled page with one edited
  * paragraph ships only its changed chunks downstream.
  *
  * The batch operator's per-doc prefix-sum window cannot run on a
  * stream (no windows over streaming frames); chunking is per-doc
  * LOCAL, so it runs as a typed flatMap — bit-identical hashes to the
  * column pipeline (same md5-hex-prefix convention, spec-pinned
  * stream == batch chunk sets).
  */
object StreamCdcDedup {

  /** Scala twin of `Sketches.hash60` (first 15 md5 hex digits). */
  private[graft] def md5Hex15(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Scala twin of the `tokenHash` cut predicate (first 8 hex). */
  private[graft] def md5Hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  /** Per-doc chunker, bit-identical to [[graft.ops.CdcChunks]]:
    * boundary BEFORE every token whose 32-bit hash ≡ 0 (mod modulus);
    * returns (chunk_hash60, chunk_len) in document order.
    */
  private[graft] def chunkDoc(text: String,
                              modulus: Int): Seq[(Long, Long)] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    if (toks.isEmpty) return Nil
    val out = Seq.newBuilder[(Long, Long)]
    val cur = new scala.collection.mutable.ArrayBuffer[String]
    def flush(): Unit = if (cur.nonEmpty) {
      out += ((md5Hex15(cur.mkString(" ")), cur.length.toLong))
      cur.clear()
    }
    toks.foreach { t =>
      if (md5Hex8(t) % modulus == 0) flush()
      cur += t
    }
    flush()
    out.result()
  }

  /** Emit each distinct chunk content once across all micro-batches:
    * (chunk_hash, chunk_len, first_doc). Within a batch the smallest
    * doc id wins, matching the batch groupBy-min canonicalization.
    * State is O(distinct chunks) — the same footprint batch chunk
    * dedup needs, kept warm in the state store.
    */
  def firstSeenChunks(docs: DataFrame, idCol: String, textCol: String,
                      modulus: Int = 16): Dataset[(Long, Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        chunkDoc(text, modulus).map { case (h, len) => (h, len, id) }
      }
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (h, it, state) =>
          if (state.exists) Iterator.empty
          else {
            // min doc id among this batch's carriers of the chunk
            val rows = it.toSeq
            val first = rows.minBy(_._3)
            state.update(1L)
            Iterator.single((h, first._2, first._3))
          }
      }
  }
}
