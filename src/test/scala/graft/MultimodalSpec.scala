package graft

import graft.ops.{Multimodal, VectorSearch}
import graft.ops.Multimodal.MediaRow
import org.apache.spark.sql.functions._

/** Multimodal plumbing: corrupt payloads are dropped at the decode
  * boundary, metadata parse is exact, and the extracted embeddings are
  * directly usable by the vector-search operators.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def fake(id: Long, kind: String, w: Int, h: Int, dur: Long,
                   payload: String): MediaRow =
    MediaRow(id, id % 10, kind,
      s"FAKEMEDIA;kind=$kind;w=$w;h=$h;dur=$dur;codec=c;|$payload"
        .getBytes("US-ASCII"))

  test("decodeMeta parses headers and drops corrupt rows") {
    val rows = Seq(
      fake(1, "image", 640, 480, 0, "AAAA"),
      fake(2, "video", 320, 240, 9000, "BBBBBB"),
      MediaRow(3, 3, "image", "NOT A CONTAINER".getBytes("US-ASCII")),
      MediaRow(4, 4, "image", "FAKEMEDIA;kind=image".getBytes("US-ASCII")))
    val meta = Multimodal.decodeMeta(rows.toDS()).collect()
    assert(meta.map(_.media_id).toSet === Set(1L, 2L))
    val m1 = meta.find(_.media_id == 1).get
    assert((m1.width, m1.height, m1.duration_ms, m1.payload_bytes) ===
      ((640, 480, 0L, 4)))
  }

  test("frame sampling yields ceil(dur/step) frames with stable hashes") {
    val rows = Seq(fake(7, "video", 320, 240, 12000, "CC")).toDS()
    val frames = Multimodal.sampleFrames(rows, everyMs = 5000L)
      .orderBy("frame_no").collect()
    assert(frames.map(_.getAs[Long]("offset_ms")).toSeq === Seq(0L, 5000L, 10000L))
    val again = Multimodal.sampleFrames(rows, everyMs = 5000L)
      .orderBy("frame_no").collect()
    assert(frames.map(_.getAs[String]("frame_hash")).toSeq ===
      again.map(_.getAs[String]("frame_hash")).toSeq)
  }

  test("segment hashes align shared prefixes of different-length payloads") {
    val base = "A" * 40 + "B" * 40 + "C" * 40 // 120 chars
    val rows = Seq(
      fake(1, "video", 320, 240, 9000, base),
      // trimmed re-encode: keeps a 96-char prefix, fresh tail
      fake(2, "video", 320, 240, 7000, base.substring(0, 96) + "Z" * 20),
      fake(3, "video", 320, 240, 9000, "Q" * 120)).toDS()
    val segs = Multimodal.segmentHashes(rows, segWidth = 32)
    val shared = segs.as("x").join(segs.as("y"),
        col("x.seg") === col("y.seg") &&
          col("x.seg_hash") === col("y.seg_hash") &&
          col("x.media_id") < col("y.media_id"))
      .groupBy(col("x.media_id"), col("y.media_id")).count()
      .as[(Long, Long, Long)].collect().toSet
    // fixed-width segments: 1-2 share segments 1-3 (96 chars = 3 full
    // segments); media 3 shares nothing. Equal-DIVISION boundaries
    // would have misaligned the different-length payloads.
    assert(shared === Set((1L, 2L, 3L)))
    // per-media segment count = ceil(len / 32)
    assert(segs.filter(col("media_id") === 1).count() === 4)
  }

  test("extracted features feed the vector-search operators end-to-end") {
    // two identical payloads + distinct ones: the near-dup pair must be
    // exactly the duplicate payload pair at threshold ~1.0
    val rows = Seq(
      fake(1, "image", 64, 64, 0, "SAMEPAYLOADAAAABBBBCCCC"),
      fake(2, "image", 64, 64, 0, "SAMEPAYLOADAAAABBBBCCCC"),
      fake(3, "image", 64, 64, 0, "OTHERPAYLOADXXXXYYYYZZ"),
      fake(4, "image", 64, 64, 0, "YETANOTHERPAYLOADQQQQ")).toDS()
    val emb = Multimodal.extractFeatures(rows).toDF()
      .select(col("media_id"), col("embedding"))
    val dups = VectorSearch.nearDupExactTiled(emb, "media_id", "embedding",
        threshold = 0.999999, tiles = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(dups === Set((1L, 2L)))
  }
}
