package graft.streaming

import graft.functions.TextAnalysis.tokens
import graft.ops.ArtifactStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming incremental AGGREGATE store — the delta-parts pattern
  * ([[graft.ops.ArtifactStore.buildOrServeParts]]'s grain) applied to
  * an unbounded key space: per-(source, token) corpus counts
  * maintained one micro-batch at a time. The q375 artifact's MAINTAIN
  * leg, and the materialized-view shape the reference reaches with
  * trigger-maintained tables (migrations/1590689602-
  * gateway_inventory.sql:64 — maintain once, serve many).
  *
  * Per micro-batch, all bounded by the BATCH:
  *  - the batch PRE-AGGREGATES to its own (source, token, n) counts —
  *    the write is vocab-of-the-batch-sized, never row-sized;
  *  - the counts land in a `bid=N` partition (overwrite mode: a
  *    replayed batch overwrites ITSELF — idempotence with no anti-join
  *    against the standing store) plus an `_fp` content sidecar
  *    ([[graft.ops.ArtifactStore.writeFpPart]]), so any downstream
  *    part-addressed artifact staleness-checks this store in
  *    O(#batches) metadata reads;
  *  - the commit point is the meta file, written strictly last.
  *
  * The FOLDED view ([[counts]]) group-sums the pre-aggregated parts —
  * input is #batches × batch-vocab rows, never the corpus. Because
  * addition is associative-commutative, drain == batch holds EXACTLY
  * (slicing invariance, spec-pinned) — the property the NSW graph
  * store honestly cannot claim.
  *
  * [[compact]] bounds the one-dir-per-batch growth by MERGING rows
  * (group-sum into a single partition) behind the two-atomic-rename
  * discipline. Unlike the NSW compaction (bytes move, rows don't),
  * merging CHANGES the stored rows, so the store fingerprint changes —
  * deliberately: a downstream artifact built over these rows must
  * re-address, because its input rows really did change. What is
  * preserved — and spec-pinned — is the folded view.
  */
object StreamTokenCounts {

  val countSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("token", StringType),
    StructField("n", LongType)))

  private def meta(dir: String) = Paths.get(s"$dir/meta.txt")

  /** Applied-through batch id (-1 = empty store). */
  def appliedBid(storeDir: String): Long =
    if (Files.exists(meta(storeDir)))
      new String(Files.readAllBytes(meta(storeDir)),
        StandardCharsets.UTF_8).trim.toLong
    else -1L

  private def writeMeta(storeDir: String, bid: Long): Unit = {
    Files.createDirectories(Paths.get(storeDir))
    val tmp = Paths.get(s"$storeDir/meta.txt.tmp")
    Files.write(tmp, bid.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, meta(storeDir), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def partsDir(storeDir: String) = s"$storeDir/parts"

  private def committedPart(applied: Long)(part: String): Boolean =
    part.startsWith("bid=") && part.drop(4).toLong <= applied

  /** Committed per-part rows: partitions at or below the meta
    * watermark — a torn later batch is invisible (the BlockIngest
    * reader rule). */
  def parts(spark: SparkSession, storeDir: String): DataFrame = {
    val dir = partsDir(storeDir)
    recoverCompaction(dir)
    val applied = appliedBid(storeDir)
    if (applied < 0 || !Files.exists(Paths.get(dir)))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], countSchema)
    spark.read.option("basePath", dir).parquet(dir)
      .where(col("bid") <= applied)
      .select(countSchema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** The folded view: corpus (source, token) counts — a group-sum over
    * the PRE-AGGREGATED parts (#batches × batch-vocab input rows). */
  def counts(spark: SparkSession, storeDir: String): DataFrame =
    parts(spark, storeDir)
      .groupBy(col("source"), col("token"))
      .agg(sum(col("n")).as("n"))

  /** Content fingerprint of the committed part rows from the
    * write-time sidecars — O(#batches) metadata, no scan; equal to a
    * full-scan fingerprint of [[parts]] (spec-pinned). Changes across
    * [[compact]] — correctly, because compaction merges rows. */
  def storeFingerprint(storeDir: String): String =
    ArtifactStore.fingerprintFromParts(partsDir(storeDir),
      committedPart(appliedBid(storeDir)))

  /** Apply one batch: pre-aggregate, commit the part + sidecar, move
    * the watermark. Exposed for the spec's slicing experiments. */
  private[graft] def applyBatch(batch: DataFrame, bid: Long,
                                srcCol: String, textCol: String,
                                storeDir: String): Unit = {
    val spark = batch.sparkSession
    if (bid <= appliedBid(storeDir)) return // replay is a no-op
    val dir = partsDir(storeDir)
    val part = batch
      .where(col(textCol).isNotNull) // poison-row rule: null text drops
      .select(coalesce(col(srcCol), lit("")).as("source"),
        explode(tokens(col(textCol))).as("token"))
      .groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("n"))
    part.write.mode("overwrite").parquet(s"$dir/bid=$bid")
    // sidecar from the rows AS WRITTEN (a batch-vocab-sized re-read):
    // the fingerprint must reproduce exactly what a reader would hash
    ArtifactStore.writeFpPart(dir, s"bid=$bid",
      ArtifactStore.partFingerprint(
        spark.read.parquet(s"$dir/bid=$bid")
          .select(countSchema.fieldNames.map(col).toIndexedSeq: _*)))
    writeMeta(storeDir, bid) // commit point, strictly last
  }

  /** Merge every committed part into ONE group-summed partition behind
    * the two-atomic-rename discipline (crash at any point leaves the
    * fragmented or the merged store, never a mixture). The folded view
    * is preserved EXACTLY; the stored rows — and so the fingerprint —
    * change, which is the honest signal to downstream artifacts.
    * Returns true if the store was rewritten. */
  def compact(spark: SparkSession, storeDir: String,
              minDirs: Int = 2): Boolean = {
    val applied = appliedBid(storeDir)
    if (applied < 0) return false
    val dir = partsDir(storeDir)
    recoverCompaction(dir)
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return false
    val committedDirs = listDir(d).count { p =>
      val n = p.getFileName.toString
      Files.isDirectory(p) && n.startsWith("bid=") &&
        n.drop(4).toLong <= applied
    }
    if (committedDirs < minDirs) return false
    val tmp = s"$dir.compact.tmp"
    val old = s"$dir.compact.old"
    deleteRec(Paths.get(tmp)); deleteRec(Paths.get(old))
    val merged = parts(spark, storeDir)
      .groupBy(col("source"), col("token"))
      .agg(sum(col("n")).as("n"))
    merged.coalesce(1).write.parquet(s"$tmp/bid=$applied")
    // the merged rows are NEW content — fingerprint them as written
    // (never fold the old sidecars: those hashed the pre-merge rows)
    ArtifactStore.writeFpPart(tmp, s"bid=$applied",
      ArtifactStore.partFingerprint(
        spark.read.parquet(s"$tmp/bid=$applied")
          .select(countSchema.fieldNames.map(col).toIndexedSeq: _*)))
    Files.move(Paths.get(dir), Paths.get(old),
      StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), Paths.get(dir),
      StandardCopyOption.ATOMIC_MOVE)
    deleteRec(Paths.get(old))
    true
  }

  /** Crash recovery: a compaction that died between its two renames
    * leaves the store at `<dir>.compact.old` — restore it; a leftover
    * `.tmp` is garbage. */
  private def recoverCompaction(dir: String): Unit = {
    val d = Paths.get(dir)
    val old = Paths.get(dir + ".compact.old")
    if (!Files.exists(d) && Files.exists(old))
      Files.move(old, d, StandardCopyOption.ATOMIC_MOVE)
    deleteRec(Paths.get(dir + ".compact.tmp"))
  }

  // one shared copy of the list/delete protocol (ops/Fs)
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] =
    graft.ops.Fs.ls(p)

  private def deleteRec(p: java.nio.file.Path): Unit =
    graft.ops.Fs.deleteRec(p)

  /** Wire a (source, text) document stream into the maintained count
    * store. Compaction auto-triggers past `compactAfterBatches`
    * per-batch partitions — OUTSIDE the batch commit, so a compaction
    * failure never loses a batch. */
  def run(stream: DataFrame, srcCol: String, textCol: String,
          storeDir: String, trigger: Trigger,
          compactAfterBatches: Int = 48): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyBatch(batch, bid, srcCol, textCol, storeDir)
        val d = Paths.get(partsDir(storeDir))
        if (Files.isDirectory(d) &&
            listDir(d).count(_.getFileName.toString.startsWith("bid=")) >
              compactAfterBatches) {
          compact(batch.sparkSession, storeDir)
          ()
        }
      }
}
