package graft.streaming

import graft.functions.TextAnalysis
import graft.ops.DeltaPartsStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Streaming-maintained SimHash SIGNATURE index — the bit-sketch
  * dedup family's corpus-side state (q26's per-doc
  * [[graft.functions.TextAnalysis.simhash32]] values) kept current
  * one micro-batch at a time. Unlike the MinHash store (which keeps
  * derived band KEYS and verification reads the corpus), a simhash
  * is 8 bytes and IS both the blocking input and the verification
  * value, so the maintained store keeps the SIGNATURE itself: the
  * Manku byte-blocks (WWW 2007 — two 32-bit hashes within hamming
  * distance 3 agree exactly on one of the four bytes, by pigeonhole)
  * derive at read time as a cheap projection, and hamming
  * verification never touches document text at all — the whole
  * near-dup question answers off the 16-byte-per-doc index.
  *
  * A doc's simhash depends on NOTHING but that doc, so the
  * maintained store is EXACT: slicing-invariant union fold (drain ==
  * batch bit-for-bit), repack compaction (store fingerprint — the
  * downstream artifact address — invariant), part-addressed serving
  * through [[graft.ops.ArtifactStore.buildOrServeParts]].
  *
  * The hash GEOMETRY (bit width + blocking slice count) is the
  * store's pinned identity: the reference-fixture 32/4 sketch and the
  * 100 TB-default 60/4 wide sketch (q402's measured density fix)
  * coexist as mutually-refusing stores, and a store written by a code
  * version with different constants is refused by name. Store
  * mechanics are [[graft.ops.DeltaPartsStore]]'s.
  */
object StreamSimhashIndex {

  val sigSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("simhash", LongType)))

  /** House simhash geometries — lockstep with
    * [[graft.functions.TextAnalysis.simhash32]]/`simhash60` and
    * [[graft.ops.Dedup.nearDupSimhash]]/`nearDupSimhashWide`'s
    * blocking. 32/4 is the reference-fixture geometry; 60/4 (four
    * 15-bit slices, 32768 buckets each) is the 100 TB default — q402
    * measured the wide sketch collapsing the 32-bit family's
    * super-linear sf1 density (7.0× vs 17.1× for 10× data) at the
    * same pigeonhole recall guarantee. The identity pin keeps stores
    * of the two geometries mutually refusing, so they coexist. */
  val Bits = 32
  val Blocks = 4
  val WideBits = 60
  val WideBlocks = 4

  /** The signing kernel for a pinned bit width — refuses an
    * ungeometried width by name (a silently-wrong kernel would sign a
    * DIFFERENT sketch under the store's pin). */
  private def signExpr(bits: Int,
                       toks: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = bits match {
    case 32 => TextAnalysis.simhash32(toks).cast("long")
    case 60 => TextAnalysis.simhash60(toks)
    case b => throw new IllegalArgumentException(
      s"no simhash kernel for bits=$b — house geometries are 32 and 60")
  }

  private def store(storeDir: String) =
    new DeltaPartsStore(storeDir, sigSchema, identity)

  /** Applied-through batch id (-1 = empty store). */
  def appliedBid(storeDir: String): Long = store(storeDir).appliedBid

  /** The folded index: committed (doc_id, simhash) rows. */
  def sigs(spark: SparkSession, storeDir: String): DataFrame =
    store(storeDir).parts(spark)

  /** Sidecar-folded content fingerprint — O(#batches) metadata; equal
    * to a full-scan fingerprint of [[sigs]] and invariant across
    * [[compact]]. */
  def storeFingerprint(storeDir: String): String =
    store(storeDir).storeFingerprint

  private def geomPath(storeDir: String) = Paths.get(s"$storeDir/geometry.txt")

  private def geomString(bits: Int, blocks: Int) =
    s"bits=$bits,blocks=$blocks"

  private val GeomRe = """bits=(\d+),blocks=(\d+)""".r

  /** The store's pinned (bits, blocks), or None for a store no apply
    * has pinned yet. */
  def geometry(storeDir: String): Option[(Int, Int)] = {
    val p = geomPath(storeDir)
    if (!Files.exists(p)) None
    else new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .trim match {
      case GeomRe(b, k) => Some((b.toInt, k.toInt))
      case body => throw new IllegalStateException(
        s"unparseable geometry pin at $p: '$body'")
    }
  }

  /** Fail LOUDLY unless the store is pinned to exactly this geometry. */
  def requireGeometry(storeDir: String, bits: Int, blocks: Int): Unit = {
    val want = geomString(bits, blocks)
    val have = geometry(storeDir)
      .map { case (b, k) => geomString(b, k) }
      .getOrElse("<unpinned>")
    require(have == want,
      s"SimHash store $storeDir is pinned to geometry '$have'; " +
        s"refusing a reader keyed under '$want' — signatures under a " +
        "different bit geometry are a different sketch entirely")
  }

  private def checkGeometry(storeDir: String, bits: Int,
                            blocks: Int): Unit = {
    val p = geomPath(storeDir)
    if (Files.exists(p)) requireGeometry(storeDir, bits, blocks)
    else {
      Files.createDirectories(Paths.get(storeDir))
      val tmp = Paths.get(s"$storeDir/geometry.txt.tmp")
      Files.write(tmp,
        geomString(bits, blocks).getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Apply one batch: sign the batch's docs under the store's pinned
    * geometry, commit the part + sidecar, move the watermark.
    * Null-text rows drop (poison-row rule); zero-token docs sign like
    * the inline path signs them (simhash 0 — no filter, maintained ==
    * inline exactly). A replayed bid is a no-op. */
  private[graft] def applyBatch(batch: DataFrame, bid: Long,
                                idCol: String, textCol: String,
                                storeDir: String, bits: Int = Bits,
                                blocks: Int = Blocks): Unit = {
    val st = store(storeDir)
    if (bid <= st.appliedBid) return
    checkGeometry(storeDir, bits, blocks)
    st.applyPart(
      batch.where(col(textCol).isNotNull)
        .select(col(idCol).cast("long").as("doc_id"),
          signExpr(bits, TextAnalysis.tokens(col(textCol)))
            .as("simhash")),
      bid)
  }

  /** Repack every committed part — rows and store fingerprint
    * preserved exactly. Returns true if rewritten. */
  def compact(spark: SparkSession, storeDir: String,
              minDirs: Int = 2): Boolean =
    store(storeDir).compact(spark, minDirs)

  /** Serve the maintained signatures through the artifact store,
    * PART-ADDRESSED by the write-time sidecars. With no artifact
    * root: the folded view directly. The artifact params carry the
    * PINNED bit width, so a 32-bit and a wide store can never collide
    * on one artifact scope. */
  def servedSigs(spark: SparkSession, storeDir: String): DataFrame = {
    val bits = geometry(storeDir).map(_._1).getOrElse(Bits)
    store(storeDir).serveParts(spark, "simhash_maintained_sigs",
      params = s"sig$bits")
  }

  /** [[servedSigs]] with the caller's geometry REQUIRE-MATCHED against
    * the store pin first. */
  def servedSigs(spark: SparkSession, storeDir: String, bits: Int,
                 blocks: Int): DataFrame = {
    requireGeometry(storeDir, bits, blocks)
    servedSigs(spark, storeDir)
  }

  /** The Manku block projection over a signature frame — one
    * (doc_id, simhash, blk, key) row per blocking slice, derived at
    * read time (the store never materializes keys). Delegates to the
    * ONE house projection ([[graft.ops.Dedup.simhashBlocked]]) so
    * blocking cannot drift from the inline families'. */
  def blocked(sigs: DataFrame, bits: Int = Bits,
              blocks: Int = Blocks): DataFrame =
    graft.ops.Dedup.simhashBlocked(sigs, blocks, bits / blocks)

  /** Wire an (id, text) document stream into the maintained index.
    * Compaction auto-triggers past `compactAfterBatches` per-batch
    * partitions — OUTSIDE the batch commit. */
  def run(stream: DataFrame, idCol: String, textCol: String,
          storeDir: String, trigger: Trigger,
          compactAfterBatches: Int = 48, bits: Int = Bits,
          blocks: Int = Blocks): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, bid: Long) =>
        applyBatch(batch, bid, idCol, textCol, storeDir, bits, blocks)
        if (store(storeDir).partDirCount > compactAfterBatches) {
          compact(batch.sparkSession, storeDir)
          ()
        }
      }
}
