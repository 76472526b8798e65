package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata — the Spark-side plumbing for a training-data pipeline.
  *
  * The actual codec work (JPEG decode, audio resample, video frame
  * extraction) is STUBBED with a deterministic fake — the image/audio
  * libraries are not in this container — but everything Spark-level is
  * real and tested: the schema contract, the `mapPartitions` batch shape
  * (decoder initialized once per partition, amortized across rows — the
  * same pattern a JNI/FFmpeg binding needs), partitioning hints for
  * byte-heavy rows, and the explode shape for frame sampling.
  *
  * Scale notes: media rows are orders of magnitude wider than their
  * metadata. The operators here keep bytes out of shuffles — metadata is
  * projected *before* any wide operation, and frame sampling explodes
  * only (id, frame_idx, offset) triples, never the payload.
  */
object Multimodal {

  /** Typed media row: payload + source metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded (stub) metadata — what a real codec would report. */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

  /** Deterministic fake media derived from the documents fixture (UTF-8
    * payload bytes) — stands in for real blobs in tests/fixtures.
    */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("bytes"))

  /** STUB decoder: a real implementation would parse the codec header
    * here (and is the only line that changes when a codec lib exists).
    * Deterministic pure function of the payload so tests/oracles can
    * reproduce it.
    */
  private def decodeHeaderStub(kind: String, bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    val width = 64 + n % 577
    val height = 64 + (n * 31) % 433
    val frames = kind match {
      case "video" => 1 + n % 24
      case _ => 1
    }
    (width, height, frames)
  }

  /** Decode media metadata with the per-partition-init `mapPartitions`
    * batch shape (decoder/codec context constructed once per partition,
    * not per row).
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (e.g. load codec lib)
      rows.map { r =>
        val (w, h, f) = decodeHeaderStub(r.kind, r.bytes)
        MediaMeta(r.media_id, r.kind, r.bytes.length, w, h, f)
      }
    }
  }

  /** Frame sampling for video rows: emit every `stride`-th frame index
    * with its (fake) byte offset — only narrow columns explode; payload
    * bytes never enter the explode.
    */
  def sampleFrames(meta: Dataset[MediaMeta], stride: Int): DataFrame =
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"), col("n_bytes"),
        explode(sequence(lit(0L), col("n_frames").cast("long") - 1, lit(stride.toLong))).as("frame_idx"))
      .withColumn("byte_offset", col("frame_idx") * col("n_bytes") / col("n_frames"))
      .select("media_id", "frame_idx", "byte_offset")

  /** DataFrame-level metadata decode (same stub arithmetic, pure column
    * expressions) — used by the oracled query so DuckDB can mirror it.
    */
  def decodeMetaColumns(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .withColumn("width", (lit(64) + pmod(col("n_bytes"), lit(577))).cast("long"))
      .withColumn("height", (lit(64) + pmod(col("n_bytes") * 31, lit(433))).cast("long"))
      .withColumn("n_frames",
        when(col("kind") === "video", lit(1) + pmod(col("n_bytes"), lit(24)))
          .otherwise(lit(1)).cast("long"))
      .select("media_id", "kind", "n_bytes", "width", "height", "n_frames")
}
