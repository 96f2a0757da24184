package graft.queries

import graft.fixtures.FixtureGen
import graft.ops.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column coverage: binary media payloads with typed
  * metadata, per-partition batched decode, frame sampling, and
  * feature extraction into embedding columns — the Spark plumbing is
  * real (schemas, mapPartitions batch shape, explode stages); only the
  * codec itself is the documented deterministic stub
  * (ops/Multimodal.scala).
  */
object MediaQueries {

  private val mediaPq =
    s"read_parquet('${FixtureGen.FixtureDir}/media.parquet/*.parquet')"

  /** Shared DuckDB view of the fake container: header fields +
    * payload.
    */
  private val mCte =
    s"""m AS (
       |  SELECT media_id, doc_id, kind, decode(bytes) AS s FROM $mediaPq),
       |p AS (
       |  SELECT media_id, doc_id, kind,
       |    CAST(regexp_extract(s, 'w=(\\d+)', 1) AS INT) AS width,
       |    CAST(regexp_extract(s, 'h=(\\d+)', 1) AS INT) AS height,
       |    CAST(regexp_extract(s, 'dur=(\\d+)', 1) AS BIGINT) AS duration_ms,
       |    regexp_extract(s, 'codec=([^;]+)', 1) AS codec,
       |    substr(s, strpos(s, '|') + 1) AS payload
       |  FROM m)""".stripMargin

  val defs: Seq[QDef] = Seq(

    // Batched metadata decode: binary -> typed meta struct via one codec
    // instance per partition.
    QDef("q44_media_meta",
      (s, _) => {
        val media = Multimodal.readMedia(s,
          s"${FixtureGen.FixtureDir}/media.parquet")
        Multimodal.decodeMeta(media).toDF()
      },
      Some(s"""WITH $mCte
        |SELECT media_id, doc_id, kind, width, height, duration_ms, codec,
        |  CAST(length(payload) AS INT) AS payload_bytes
        |FROM p""".stripMargin)),

    // Frame sampling (video/audio): explode per-media time grid with
    // deterministic frame ids — the frame-grab stage of a video
    // pipeline, shaped for downstream per-frame feature extraction.
    QDef("q45_media_frames",
      (s, _) => {
        val media = Multimodal.readMedia(s,
          s"${FixtureGen.FixtureDir}/media.parquet")
        Multimodal.sampleFrames(media, everyMs = 5000L)
      },
      Some(s"""WITH $mCte
        |SELECT media_id,
        |  CAST(off / 5000 AS INT) AS frame_no, off AS offset_ms,
        |  md5(media_id || ':' || off) AS frame_hash
        |FROM (
        |  SELECT media_id,
        |    unnest(range(0, duration_ms, 5000)) AS off
        |  FROM p WHERE duration_ms > 0)""".stripMargin)),

    // Cross-media near-duplicate detection: media sharing >= 2 aligned
    // 32-char content segments (a re-encoded/trimmed copy of the same
    // clip keeps a long payload prefix — the fixture plants 30 such
    // pairs). The frame/segment signature JOIN is the video-dedup
    // shape at scale: shuffle keyed on (kind, seg, hash) — candidate
    // volume is only hash-equal segments, never an all-pairs media
    // comparison; the per-pair count is one aggregation. With a real
    // codec the segment hash becomes a perceptual frame hash, same
    // plan.
    QDef("q100_media_neardup",
      (s, _) => {
        val media = Multimodal.readMedia(s,
          s"${FixtureGen.FixtureDir}/media.parquet")
        // checkpointed: the signature table feeds both sides of the
        // self-join (the PLANS.md self-join re-execution trap)
        val segs = Multimodal.segmentHashes(media).localCheckpoint()
        segs.as("x").join(segs.as("y"),
            col("x.kind") === col("y.kind") &&
              col("x.seg") === col("y.seg") &&
              col("x.seg_hash") === col("y.seg_hash") &&
              col("x.media_id") < col("y.media_id"))
          .select(col("x.media_id").as("media_a"),
            col("y.media_id").as("media_b"))
          .groupBy("media_a", "media_b")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
      },
      Some(s"""WITH $mCte,
        |segs AS (
        |  SELECT media_id, kind, seg,
        |    md5(substr(payload, (seg - 1) * 32 + 1, 32)) AS seg_hash
        |  FROM (
        |    SELECT media_id, kind, payload,
        |      unnest(generate_series(1,
        |        (CAST(length(payload) AS INT) + 31) // 32)) AS seg
        |    FROM p WHERE length(payload) > 0) t)
        |SELECT x.media_id AS media_a, y.media_id AS media_b,
        |  count(*) AS n_shared
        |FROM segs x JOIN segs y ON x.kind = y.kind AND x.seg = y.seg
        |  AND x.seg_hash = y.seg_hash AND x.media_id < y.media_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin)),

    // Overlap/trim audit over q100's detected pairs: overlap share of
    // the SHORTER clip plus the is_trim verdict (every segment of the
    // shorter side shared ⇒ a pure trim/re-encode; partial overlap ⇒
    // spliced or watermarked variants). Same segment-join candidates
    // as q100 — the per-media segment counts ride a tiny aggregate
    // broadcast back at the pair frame, so the audit adds no second
    // corpus pass.
    QDef("q242_media_overlap",
      (s, _) => {
        val media = Multimodal.readMedia(s,
          s"${FixtureGen.FixtureDir}/media.parquet")
        val segs = Multimodal.segmentHashes(media).localCheckpoint()
        val counts = segs.groupBy("media_id")
          .agg(count(lit(1)).as("n_segs"))
        val pairs = segs.as("x").join(segs.as("y"),
            col("x.kind") === col("y.kind") &&
              col("x.seg") === col("y.seg") &&
              col("x.seg_hash") === col("y.seg_hash") &&
              col("x.media_id") < col("y.media_id"))
          .select(col("x.media_id").as("media_a"),
            col("y.media_id").as("media_b"))
          .groupBy("media_a", "media_b")
          .agg(count(lit(1)).as("n_shared"))
          .filter(col("n_shared") >= 2)
        pairs
          .join(broadcast(counts.select(col("media_id").as("media_a"),
            col("n_segs").as("na"))), "media_a")
          .join(broadcast(counts.select(col("media_id").as("media_b"),
            col("n_segs").as("nb"))), "media_b")
          .select(col("media_a"), col("media_b"), col("n_shared"),
            expr("(1000 * n_shared) div least(na, nb)")
              .as("overlap_milli"),
            expr("n_shared = least(na, nb)").as("is_trim"))
      },
      Some(s"""WITH $mCte,
        |segs AS (
        |  SELECT media_id, kind, seg,
        |    md5(substr(payload, (seg - 1) * 32 + 1, 32)) AS seg_hash
        |  FROM (
        |    SELECT media_id, kind, payload,
        |      unnest(generate_series(1,
        |        (CAST(length(payload) AS INT) + 31) // 32)) AS seg
        |    FROM p WHERE length(payload) > 0) t),
        |cnt AS (SELECT media_id, CAST(count(*) AS BIGINT) AS n_segs
        |        FROM segs GROUP BY 1),
        |pr AS (SELECT x.media_id AS media_a, y.media_id AS media_b,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM segs x JOIN segs y ON x.kind = y.kind AND x.seg = y.seg
        |    AND x.seg_hash = y.seg_hash AND x.media_id < y.media_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT media_a, media_b, n_shared,
        |  (1000 * n_shared) // least(a.n_segs, b.n_segs)
        |    AS overlap_milli,
        |  n_shared = least(a.n_segs, b.n_segs) AS is_trim
        |FROM pr
        |JOIN cnt a ON a.media_id = pr.media_a
        |JOIN cnt b ON b.media_id = pr.media_b""".stripMargin)),

    // Feature extraction: payload -> deterministic 8-dim embedding (the
    // stub encoder), exploded to (media_id, dim, feat) so the check is
    // engine-portable; the float embedding itself feeds VectorSearch in
    // MultimodalSpec.
    QDef("q46_media_embed",
      (s, _) => {
        import s.implicits._
        val media = Multimodal.readMedia(s,
          s"${FixtureGen.FixtureDir}/media.parquet")
        Multimodal.extractFeatures(media).toDF()
          .select(col("media_id"), posexplode(col("embedding")))
          .select(col("media_id"), col("pos").as("dim"),
            round(col("col").cast("double"), 3).as("feat"))
      },
      Some(s"""WITH $mCte,
        |dims AS (SELECT unnest(generate_series(0, 7)) AS dim)
        |SELECT media_id, dim,
        |  round(CAST(list_reduce(list_prepend(0::BIGINT,
        |    list_transform(
        |      list_filter(generate_series(1, CAST(length(payload) AS INT)),
        |        i -> (i - 1) % 8 = dim),
        |      i -> CAST(ascii(substr(payload, CAST(i AS INT), 1)) AS BIGINT))),
        |    (a, c) -> (a * 31 + c) % 1000003) % 2000 - 1000 AS DOUBLE)
        |    / 1000.0, 3) AS feat
        |FROM p, dims""".stripMargin))
  )
}
