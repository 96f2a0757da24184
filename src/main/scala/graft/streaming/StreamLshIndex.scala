package graft.streaming

import graft.ops.{DeltaPartsStore, VectorSearch}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming-maintained sign-LSH bucket INDEX — the ANN family's
  * corpus-side index (q31/q376's (id, band, key) rows: one key per
  * band per vector, [[graft.ops.VectorSearch.lshCandidates]]) kept
  * current one micro-batch at a time. A vector's bucket keys depend on
  * NOTHING but that vector and the fixed plane geometry, so like the
  * winnow index the maintained store is EXACT:
  *
  *  - slicing invariance holds by construction (per-row index entries,
  *    union fold): drain == batch bit-for-bit, spec-pinned;
  *  - compaction REPACKS (identity rewrite), so the store fingerprint
  *    — the downstream artifact address — is invariant;
  *  - [[servedBuckets]] serves the maintained index part-addressed
  *    through [[graft.ops.ArtifactStore.buildOrServeParts]]: an append
  *    costs one batch-sized part, a re-serve is a multi-path scan.
  *
  * Multi-probe serving needs NO store cooperation (Lv et al., VLDB
  * 2007 — the q376 trade): the corpus keeps ONE key per band forever;
  * only the query side fans out. An index maintained here answers
  * base-probe and multi-probe queries alike.
  *
  * The plane GEOMETRY is part of the store's identity: a key written
  * under (bands, bitsPerBand, dims) is meaningless under any other
  * geometry, so the first apply pins `geometry.txt` and every later
  * apply must match — LOUDLY, because mixed-geometry buckets would
  * serve silently wrong candidates. Store mechanics are
  * [[graft.ops.DeltaPartsStore]]'s.
  */
object StreamLshIndex {

  val bucketSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("band", IntegerType),
    StructField("key", LongType)))

  private def store(storeDir: String) =
    new DeltaPartsStore(storeDir, bucketSchema, identity)

  /** Applied-through batch id (-1 = empty store). */
  def appliedBid(storeDir: String): Long = store(storeDir).appliedBid

  /** The folded index: committed (id, band, key) rows. */
  def buckets(spark: SparkSession, storeDir: String): DataFrame =
    store(storeDir).parts(spark)

  /** Sidecar-folded content fingerprint — O(#batches) metadata; equal
    * to a full-scan fingerprint of [[buckets]] and invariant across
    * [[compact]] (the DeltaPartsStore repack contract). */
  def storeFingerprint(storeDir: String): String =
    store(storeDir).storeFingerprint

  private def geomPath(storeDir: String) = Paths.get(s"$storeDir/geometry.txt")

  private def geomString(bands: Int, bitsPerBand: Int, dims: Int) =
    s"bands=$bands,bitsPerBand=$bitsPerBand,dims=$dims"

  private val GeomRe = """bands=(\d+),bitsPerBand=(\d+),dims=(\d+)""".r

  /** The store's pinned plane geometry as (bands, bitsPerBand, dims),
    * or None for a store no apply has pinned yet. The read-side half
    * of the pin: a query-side caller derives its probe keys from
    * THESE values (or [[requireGeometry]]-checks its own against them)
    * instead of trusting whatever constants it was configured with — a
    * mismatched reader probing raw keys gets silently wrong
    * candidates, the exact failure class the write pin refuses. */
  def geometry(storeDir: String): Option[(Int, Int, Int)] = {
    val p = geomPath(storeDir)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim match {
      case GeomRe(b, bb, d) => Some((b.toInt, bb.toInt, d.toInt))
      case body => throw new IllegalStateException(
        s"unparseable geometry pin at $p: '$body'")
    }
  }

  /** Fail LOUDLY unless the store is pinned to exactly this geometry —
    * the serve-path twin of the apply-path pin. */
  def requireGeometry(storeDir: String, bands: Int, bitsPerBand: Int,
                      dims: Int): Unit = {
    val want = geomString(bands, bitsPerBand, dims)
    val have = geometry(storeDir)
      .map { case (b, bb, d) => geomString(b, bb, d) }
      .getOrElse("<unpinned>")
    require(have == want,
      s"LSH store $storeDir is pinned to geometry '$have'; refusing " +
        s"to answer a query probing under '$want' — a mismatched " +
        "reader gets silently wrong candidates")
  }

  /** Pin-or-check the plane geometry — first apply writes it, every
    * later apply must match exactly. */
  private def checkGeometry(storeDir: String, bands: Int,
                            bitsPerBand: Int, dims: Int): Unit = {
    val want = geomString(bands, bitsPerBand, dims)
    val p = geomPath(storeDir)
    if (Files.exists(p)) {
      val have = new String(Files.readAllBytes(p), StandardCharsets.UTF_8).trim
      require(have == want,
        s"LSH store $storeDir is pinned to geometry '$have'; refusing " +
          s"to apply a batch keyed under '$want' — mixed-geometry " +
          "buckets would serve silently wrong candidates")
    } else {
      Files.createDirectories(Paths.get(storeDir))
      val tmp = Paths.get(s"$storeDir/geometry.txt.tmp")
      Files.write(tmp, want.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Apply one batch: key the batch's vectors, commit the part +
    * sidecar, move the watermark. Null and WRONG-DIMENSION vectors
    * drop (poison-row rule — a truncated vector keyed by zero-padded
    * planes would land in a bucket its true geometry never visits, the
    * same silent-poison class the geometry pin refuses). Honest scope:
    * the single-shot inline path (q31/q376) zero-pads short vectors
    * instead of dropping them, so maintained == single-shot holds for
    * well-formed corpora — every dims-length vector, which is every
    * fixture row; a malformed row diverges by design, the maintained
    * side being the stricter one. A replayed bid is a no-op. Exposed
    * for the spec's slicing experiments. */
  private[graft] def applyBatch(batch: DataFrame, bid: Long,
                                idCol: String, vecCol: String,
                                bands: Int, bitsPerBand: Int, dims: Int,
                                storeDir: String): Unit = {
    val st = store(storeDir)
    if (bid <= st.appliedBid) return
    checkGeometry(storeDir, bands, bitsPerBand, dims)
    st.applyPart(
      VectorSearch.lshCandidates(
        batch.where(col(vecCol).isNotNull && size(col(vecCol)) === dims),
        idCol, vecCol, bands, bitsPerBand, dims)
        .select(col("id").cast("long").as("id"), col("band"),
          col("key").cast("long").as("key")),
      bid)
  }

  /** Repack every committed part into ONE partition — rows and store
    * fingerprint preserved exactly. Returns true if rewritten. */
  def compact(spark: SparkSession, storeDir: String,
              minDirs: Int = 2): Boolean =
    store(storeDir).compact(spark, minDirs)

  /** Serve the maintained index through the artifact store,
    * PART-ADDRESSED by the write-time sidecars (one part per committed
    * batch; compaction collapses the part set). With no artifact root:
    * the folded view directly. */
  def servedBuckets(spark: SparkSession, storeDir: String): DataFrame =
    store(storeDir).serveParts(spark, "lsh_maintained_buckets",
      params = "keys")

  /** [[servedBuckets]] with the caller's probe geometry
    * REQUIRE-MATCHED against the store pin first — the serve-path any
    * query that derived its own probe keys should use (q386 does): the
    * raw-key overload trusts the caller already validated. */
  def servedBuckets(spark: SparkSession, storeDir: String, bands: Int,
                    bitsPerBand: Int, dims: Int): DataFrame = {
    requireGeometry(storeDir, bands, bitsPerBand, dims)
    servedBuckets(spark, storeDir)
  }

  /** Wire an (id, vector) stream into the maintained index.
    * Compaction auto-triggers past `compactAfterBatches` per-batch
    * partitions — OUTSIDE the batch commit. */
  def run(stream: DataFrame, idCol: String, vecCol: String,
          bands: Int, bitsPerBand: Int, dims: Int, storeDir: String,
          trigger: Trigger,
          compactAfterBatches: Int = 48): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyBatch(batch, bid, idCol, vecCol, bands, bitsPerBand, dims,
          storeDir)
        if (store(storeDir).partDirCount > compactAfterBatches) {
          compact(batch.sparkSession, storeDir)
          ()
        }
      }
}
