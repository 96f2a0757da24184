package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: opaque `binary` payloads + typed metadata, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The real codec work (JPEG decode, resampling, ffmpeg) is STUBBED —
  * the container has no media libraries — behind `MediaCodec`, which
  * parses this repo's deterministic fake container format:
  *
  *   `FAKEMEDIA;kind=image;w=640;h=480;dur=0;codec=fake;|<base64 payload>`
  *
  * Everything AROUND the codec is the real Spark plumbing this module
  * exists to exercise: binary columns in parquet, schema'd metadata
  * structs, per-partition batched decode (`mapPartitions` over a typed
  * Dataset — one codec instance per partition, the same batch shape a
  * Pandas-UDF/mapInPandas pipeline has), and deterministic
  * feature-extraction into `array<float>` embedding columns that feed
  * the vector-search operators.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, doc_id: Long, kind: String,
                            bytes: Array[Byte])
  final case class MediaMeta(media_id: Long, doc_id: Long, kind: String,
                             width: Int, height: Int, duration_ms: Long,
                             codec: String, payload_bytes: Int)
  final case class MediaFeature(media_id: Long, kind: String,
                                embedding: Array[Float])
  final case class MediaFrame(media_id: Long, frame_no: Int,
                              offset_ms: Long, frame_hash: String)

  /** The stubbed codec boundary. One instance per partition (mirrors
    * opening a decoder context per batch); all outputs deterministic
    * functions of the payload so cross-engine oracles can reproduce
    * them.
    */
  final class MediaCodec {
    def parseHeader(bytes: Array[Byte]): Option[(String, Int, Int, Long, String, Int)] = {
      val s = new String(bytes, "US-ASCII")
      if (!s.startsWith("FAKEMEDIA;")) None
      else {
        val end = s.indexOf('|')
        if (end < 0) None
        else {
          val kv = s.substring(10, end).split(';').filter(_.contains("="))
            .map { p => val Array(k, v) = p.split("=", 2); k -> v }.toMap
          Some((kv.getOrElse("kind", "unknown"),
            kv.get("w").map(_.toInt).getOrElse(0),
            kv.get("h").map(_.toInt).getOrElse(0),
            kv.get("dur").map(_.toLong).getOrElse(0L),
            kv.getOrElse("codec", "fake"),
            s.length - end - 1))
        }
      }
    }

    /** Stub "embedding": 8 floats folded from the payload bytes —
      * stands in for a vision/audio encoder forward pass.
      */
    def features(bytes: Array[Byte], dims: Int = 8): Array[Float] = {
      val start = bytes.indexOf('|'.toByte) + 1
      val acc = new Array[Long](dims)
      var i = start
      while (i < bytes.length) {
        val d = (i - start) % dims
        acc(d) = acc(d) * 31 + (bytes(i) & 0xFF)
        acc(d) %= 1000003L
        i += 1
      }
      acc.map(v => (v % 2000 - 1000) / 1000.0f)
    }
  }

  /** Decode metadata per partition — the batched-decode shape: codec
    * opened once per partition, rows streamed through it, corrupt
    * payloads dropped to a dead-letter side (here: filtered, counted by
    * the caller via an is-valid column if needed).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new MediaCodec
      rows.flatMap { r =>
        codec.parseHeader(r.bytes).map { case (kind, w, h, dur, c, n) =>
          MediaMeta(r.media_id, r.doc_id, kind, w, h, dur, c, n)
        }
      }
    }
  }

  /** Feature extraction per partition → embedding column usable by the
    * vector-search operators.
    */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val codec = new MediaCodec
      rows.map(r => MediaFeature(r.media_id, r.kind, codec.features(r.bytes, dims)))
    }
  }

  /** Frame sampling for time-media (audio/video): every `everyMs`
    * millisecond up to the clip duration, a deterministic frame id
    * (stub for an actual frame grab) — the explode-shaped stage of a
    * video pipeline.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    import media.sparkSession.implicits._
    val meta = decodeMeta(media)
    meta.filter(col("duration_ms") > 0)
      .withColumn("offset_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_no",
        (col("offset_ms") / everyMs).cast("int"))
      .select(col("media_id"), col("frame_no"), col("offset_ms"),
        md5(concat(col("media_id").cast("string"), lit(":"),
          col("offset_ms").cast("string"))).as("frame_hash"))
  }

  /** Fixed-width content-segment hashes of the payload — the
    * content-derived signature for cross-media near-duplicate
    * detection ([[sampleFrames]]'s frame_hash is a position id,
    * deliberately content-independent). FIXED width, not equal
    * division: two different-length payloads sharing a prefix (a
    * re-encoded/trimmed copy of the same clip) then produce aligned,
    * equal segments, which equal-division boundaries would destroy.
    */
  def segmentHashes(media: Dataset[MediaRow], segWidth: Int = 32): DataFrame =
    media.toDF()
      .withColumn("s", col("bytes").cast("string"))
      .select(col("media_id"), col("kind"),
        expr("substring(s, instr(s, '|') + 1)").as("payload"))
      .withColumn("len", length(col("payload")))
      .filter(col("len") > 0)
      .withColumn("seg", explode(sequence(lit(1),
        expr(s"(len + ${segWidth - 1}) div $segWidth"))))
      .select(col("media_id"), col("kind"), col("seg"),
        md5(expr(s"substring(payload, (seg - 1) * $segWidth + 1, $segWidth)"))
          .as("seg_hash"))

  def readMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(dir).as[MediaRow]
  }
}
