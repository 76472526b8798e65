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

  /** The fixture media frame (PNG encode included), memoized per
    * (session, fixture) and pinned: building the fixture is test-harness
    * work — the operators under measurement are the DECODE paths, which
    * still run per query. Bounded: one pin per fixture dir ever touched.
    */
  private object SharedMedia {
    private val memo = new SessionMemo[String, org.apache.spark.sql.DataFrame](
      SessionMemo.unpersistDf)
    def apply(s: org.apache.spark.sql.SparkSession, dir: String)
        : org.apache.spark.sql.DataFrame =
      memo(s, dir)(
        Multimodal.fakeMediaFromDocs(graft.Tables.table(s, dir, "documents"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  /** The twin-augmented media frame for the near-dup pair demo,
    * memoized for the same reason as [[SharedMedia]]: encoding the
    * planted twins is fixture-building, not the operator under
    * measurement (the DECODE + hash + band join still run per query).
    */
  private object SharedMediaWithTwins {
    private val memo = new SessionMemo[String, org.apache.spark.sql.DataFrame](
      SessionMemo.unpersistDf)
    def apply(s: org.apache.spark.sql.SparkSession, dir: String)
        : org.apache.spark.sql.DataFrame =
      memo(s, dir)(
        Multimodal.withBrightenedTwins(SharedMedia(s, dir), delta = 8,
            twinOffset = 1000000L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }

  override val queries: Seq[Q] = Seq(

    // Metadata decode over binary media columns. Image rows are REAL
    // PNGs: Spark encodes them with javax.imageio and decodes the
    // dimensions back by parsing the payload (genuine codec round trip);
    // the oracle predicts those dimensions from the deterministic encode
    // parameters — if the decode were fake, the parse would not
    // reproduce them. Audio/video remain stub arithmetic on payload
    // length (no codec libs in this container). n_bytes is projected
    // away: a compressed PNG's byte count is a codec artifact no
    // independent engine can predict.
    Q("mm_decode_meta",
      (s, dir) => Multimodal.decodeMetaColumns(SharedMedia(s, dir))
        .select("media_id", "kind", "width", "height", "n_frames")
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
                     ['image','audio','video'][(doc_id % 3) + 1] AS kind,
                     CASE WHEN doc_id % 3 = 0 THEN 16 + doc_id % 48
                          ELSE 64 + octet_length(encode(text)) % 577 END AS width,
                     CASE WHEN doc_id % 3 = 0 THEN 16 + (doc_id * 7) % 48
                          ELSE 64 + (octet_length(encode(text)) * 31) % 433 END AS height,
                     CASE WHEN ['image','audio','video'][(doc_id % 3) + 1] = 'video'
                          THEN 1 + octet_length(encode(text)) % 24 ELSE 1 END AS n_frames
              FROM documents ORDER BY media_id""")),

    // Frame sampling: explode every 4th frame index of video rows —
    // narrow columns only, payload bytes never enter the explode.
    Q("mm_frame_sample",
      (s, dir) => {
        import s.implicits._
        val media = SharedMedia(s, dir).as[Multimodal.MediaRow]
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

    // Perceptual hash of every image payload: real PNG decode →
    // grayscale 9×8 box grid → 64-bit gradient-sign dHash. No SQL engine
    // can decode PNG, so the driver records rows-only; determinism and
    // the near-dup property are pinned by MultimodalSpec (same bytes →
    // same hash; brightness-shifted re-encode lands within 6 bits;
    // unrelated images ~32 bits apart).
    .appended(Q("mm_phash",
      (s, dir) => Multimodal.imagePhashes(SharedMedia(s, dir))
        .orderBy("media_id"),
      None))

    // Near-duplicate image detection end-to-end: the fixture corpus plus
    // a brightness-shifted RE-ENCODE of every image (twin ids offset by
    // 1e6) → per-image dHash → banded hamming join (7 chunks, guaranteed
    // recall at ≤ 6 bits) → exact bit_count verify. Every emitted pair
    // is original × its planted twin — the image analog of the SimHash
    // text path, one shuffle keyed on (band, chunk), never image×image.
    .appended(Q("mm_phash_pairs",
      (s, dir) => Multimodal.phashPairs(
          Multimodal.imagePhashes(SharedMediaWithTwins(s, dir)),
          maxHamming = 6)
        .orderBy("a_id", "b_id"),
      None))
}
