package graft.streaming

import graft.ops.{DeltaPartsStore, VectorSearch}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField,
  StructType}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming-maintained IVF postings INDEX — the coarse-quantizer
  * assignment table ([[graft.ops.VectorSearch.ivfAssign]]: (id, cell)
  * rows, each vector posted to its `probes` nearest centroids) kept
  * current one micro-batch at a time. The inline IVF probe (q30)
  * re-assigns the whole corpus per question; at 100 TB the postings
  * are built ONCE per arrival and every query's cell probe is a
  * filter over the maintained table. A vector's cells depend on
  * NOTHING but that vector and the fixed centroid matrix, so the
  * maintained store is EXACT:
  *
  *  - slicing invariance holds by construction (per-row postings,
  *    union fold): drain == batch bit-for-bit, spec-pinned;
  *  - compaction REPACKS (identity rewrite), so the store fingerprint
  *    — the downstream artifact address — is invariant;
  *  - [[servedAssign]] serves the postings part-addressed through
  *    [[graft.ops.ArtifactStore.buildOrServeParts]]: an append costs
  *    one batch-sized part, a re-serve is a multi-path parquet scan.
  *
  * The CENTROID MATRIX (and the per-vector assignment multiplicity
  * `probes`) is the store's identity the way plane geometry is the
  * LSH store's: a posting written under one matrix is meaningless
  * under another, so the first apply pins `centroids.txt`
  * (Double.toString round-trips exactly — the pin is lossless) and
  * every later apply — and every validated read — must match LOUDLY.
  * Readers that derive their own probe cells should take the matrix
  * FROM [[centroids]] rather than trusting configured constants.
  *
  * Centroid DRIFT is [[StreamIvfRefresh]]'s job: when its PSI gate
  * retrains, the new matrix is a NEW store identity — rebuild into a
  * fresh store dir and swap, never mix postings across matrices (the
  * same refusal the pin enforces). Store mechanics are
  * [[graft.ops.DeltaPartsStore]]'s.
  */
object StreamIvfIndex {

  val assignSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("cell", IntegerType)))

  private def store(storeDir: String) =
    new DeltaPartsStore(storeDir, assignSchema, identity)

  /** Applied-through batch id (-1 = empty store). */
  def appliedBid(storeDir: String): Long = store(storeDir).appliedBid

  /** The folded postings: committed (id, cell) rows. */
  def assign(spark: SparkSession, storeDir: String): DataFrame =
    store(storeDir).parts(spark)

  /** Sidecar-folded content fingerprint — O(#batches) metadata; equal
    * to a full-scan fingerprint of [[assign]] and invariant across
    * [[compact]] (the DeltaPartsStore repack contract). */
  def storeFingerprint(storeDir: String): String =
    store(storeDir).storeFingerprint

  private def pinPath(storeDir: String) = Paths.get(s"$storeDir/centroids.txt")

  /** Lossless centroid-matrix serialization: a `probes=..,k=..,dims=..`
    * header line, then one comma-joined Double.toString line per
    * centroid (Double.toString → parseDouble round-trips exactly). */
  private def pinString(centroids: Array[Array[Double]],
                        probes: Int): String = {
    require(centroids.nonEmpty,
      "IVF pin needs a non-empty centroid matrix — an empty matrix " +
        "has no cells to post to")
    (s"probes=$probes,k=${centroids.length},dims=${centroids.head.length}" +:
      centroids.map(_.mkString(","))).mkString("\n")
  }

  /** The store's pinned (centroid matrix, probes), or None for a store
    * no apply has pinned yet — the read-side half of the pin: a caller
    * that derives its own probe cells takes the matrix from HERE. */
  def centroids(storeDir: String): Option[(Array[Array[Double]], Int)] = {
    val p = pinPath(storeDir)
    if (!Files.exists(p)) None
    else {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .trim.split("\n")
      val hdr = "probes=(\\d+),k=(\\d+),dims=(\\d+)".r
      lines.head match {
        case hdr(pr, k, d) =>
          val m = lines.tail.map(_.split(",").map(_.toDouble))
          require(m.length == k.toInt,
            s"centroid pin at $p declares k=$k but has ${m.length} rows")
          // a truncated row would hand readers a ragged matrix that
          // probes silently wrong cells — the failure class every
          // other pin read refuses by name
          m.zipWithIndex.foreach { case (row, i) =>
            require(row.length == d.toInt,
              s"centroid pin at $p declares dims=$d but row $i has " +
                s"${row.length} values — refusing a ragged matrix")
          }
          Some((m, pr.toInt))
        case body => throw new IllegalStateException(
          s"unparseable centroid pin at $p: '$body'")
      }
    }
  }

  /** Fail LOUDLY unless the store is pinned to exactly this matrix and
    * multiplicity — the serve-path twin of the apply-path pin. */
  def requireCentroids(storeDir: String, cents: Array[Array[Double]],
                       probes: Int): Unit = {
    val want = pinString(cents, probes)
    val have = centroids(storeDir)
      .map { case (m, pr) => pinString(m, pr) }
      .getOrElse("<unpinned>")
    require(have == want,
      s"IVF store $storeDir is pinned to '${have.linesIterator.next()}'; " +
        s"refusing a caller keyed under " +
        s"'${want.linesIterator.next()}'" +
        (if (have.linesIterator.next() == want.linesIterator.next())
          " (same shape, DIFFERENT centroid values)" else "") +
        " — a mismatched reader probes silently wrong cells")
  }

  /** Pin-or-check — first apply writes the pin, every later apply must
    * match exactly. */
  private def checkCentroids(storeDir: String,
                             cents: Array[Array[Double]],
                             probes: Int): Unit = {
    val p = pinPath(storeDir)
    if (Files.exists(p)) requireCentroids(storeDir, cents, probes)
    else {
      Files.createDirectories(Paths.get(storeDir))
      val tmp = Paths.get(s"$storeDir/centroids.txt.tmp")
      Files.write(tmp,
        pinString(cents, probes).getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Apply one batch: post the batch's vectors to their `probes`
    * nearest cells, commit the part + sidecar, move the watermark.
    * Null and wrong-dimension vectors drop (poison-row rule — the
    * kernel zero-pads, which would post a truncated vector to cells
    * its true geometry never visits; honest scope as StreamLshIndex:
    * the inline path zero-pads, so maintained == inline for
    * well-formed corpora, the maintained side stricter on malformed
    * rows). A replayed bid is a no-op. */
  private[graft] def applyBatch(batch: DataFrame, bid: Long,
                                idCol: String, vecCol: String,
                                cents: Array[Array[Double]], probes: Int,
                                storeDir: String): Unit = {
    require(cents.nonEmpty,
      s"IVF store $storeDir needs a non-empty centroid matrix")
    val st = store(storeDir)
    if (bid <= st.appliedBid) return
    checkCentroids(storeDir, cents, probes)
    val dims = cents.head.length
    st.applyPart(
      VectorSearch.ivfAssign(
        batch.where(col(vecCol).isNotNull && size(col(vecCol)) === dims),
        idCol, vecCol, cents, probes)
        .select(col("id").cast("long").as("id"),
          col("cell").cast("int").as("cell")),
      bid)
  }

  /** Repack every committed part — rows and store fingerprint
    * preserved exactly. Returns true if rewritten. */
  def compact(spark: SparkSession, storeDir: String,
              minDirs: Int = 2): Boolean =
    store(storeDir).compact(spark, minDirs)

  /** Serve the maintained postings through the artifact store,
    * PART-ADDRESSED by the write-time sidecars (one part per committed
    * batch; compaction collapses the part set). With no artifact root:
    * the folded view directly. */
  def servedAssign(spark: SparkSession, storeDir: String): DataFrame =
    store(storeDir).serveParts(spark, "ivf_maintained_assign",
      params = "cells")

  /** [[servedAssign]] with the caller's matrix REQUIRE-MATCHED against
    * the store pin first — the serve path any query that derived its
    * own probe cells should use: the raw overload trusts the caller
    * already validated (or took the matrix from [[centroids]]). */
  def servedAssign(spark: SparkSession, storeDir: String,
                   cents: Array[Array[Double]], probes: Int): DataFrame = {
    requireCentroids(storeDir, cents, probes)
    servedAssign(spark, storeDir)
  }

  /** Wire an (id, vector) stream into the maintained postings.
    * Compaction auto-triggers past `compactAfterBatches` per-batch
    * partitions — OUTSIDE the batch commit. */
  def run(stream: DataFrame, idCol: String, vecCol: String,
          cents: Array[Array[Double]], probes: Int, storeDir: String,
          trigger: Trigger,
          compactAfterBatches: Int = 48): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyBatch(batch, bid, idCol, vecCol, cents, probes, storeDir)
        if (store(storeDir).partDirCount > compactAfterBatches) {
          compact(batch.sparkSession, storeDir)
          ()
        }
      }
}
