package graft.queries

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal-column plumbing driven end-to-end: binary payloads with
  * typed metadata, stub header decode, and frame sampling. The binary
  * payloads are derived deterministically from the documents fixture
  * (UTF-8 bytes) so DuckDB can mirror the byte arithmetic with
  * `encode()`/`octet_length`.
  */
object MultimodalQueries extends QueryPack {

  override val queries: Seq[Q] = Seq(

    // Metadata decode over binary media columns (stubbed codec header
    // parse — deterministic arithmetic on payload length).
    Q("mm_decode_meta",
      (s, dir) => Multimodal.decodeMetaColumns(
          Multimodal.fakeMediaFromDocs(t(s, dir, "documents")))
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
                     ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                     octet_length(encode(text)) AS n_bytes,
                     64 + octet_length(encode(text)) % 577 AS width,
                     64 + (octet_length(encode(text)) * 31) % 433 AS height,
                     CASE WHEN ['image','audio','video'][(doc_id % 3) + 1] = 'video'
                          THEN 1 + octet_length(encode(text)) % 24 ELSE 1 END AS n_frames
              FROM documents ORDER BY media_id""")),

    // Frame sampling: explode every 4th frame index of video rows —
    // narrow columns only, payload bytes never enter the explode.
    Q("mm_frame_sample",
      (s, dir) => {
        import s.implicits._
        val media = Multimodal.fakeMediaFromDocs(t(s, dir, "documents"))
          .as[Multimodal.MediaRow]
        Multimodal.sampleFrames(Multimodal.decodeMeta(media), stride = 4)
          .orderBy("media_id", "frame_idx")
      },
      Some("""WITH meta AS (
                SELECT doc_id AS media_id,
                       octet_length(encode(text)) AS n_bytes,
                       1 + octet_length(encode(text)) % 24 AS n_frames
                FROM documents
                WHERE ['image','audio','video'][(doc_id % 3) + 1] = 'video')
              SELECT media_id, unnest(range(0, n_frames, 4)) AS frame_idx,
                     unnest(range(0, n_frames, 4)) * n_bytes / n_frames AS byte_offset
              FROM meta ORDER BY media_id, frame_idx""")))
}
