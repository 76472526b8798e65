package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** The multimodal plumbing: typed mapPartitions decode (the codec-shaped
  * path) must agree with the pure-column decode (the oracled path), and
  * frame sampling must keep payload bytes out of the exploded frame.
  */
class MultimodalSpec extends SparkSpec {

  test("typed mapPartitions decode == column-expression decode") {
    import spark.implicits._
    val media = Multimodal.fakeMediaFromDocs(Tables.table(spark, sfDir, "documents"))
    val typed = Multimodal.decodeMeta(media.as[Multimodal.MediaRow]).toDF()
      .orderBy("media_id").collect()
    val cols = Multimodal.decodeMetaColumns(media)
      .orderBy("media_id").collect()
    assert(typed.length === cols.length && typed.length > 0)
    typed.zip(cols).foreach { case (t, c) =>
      assert(t.getLong(0) === c.getLong(0))
      assert(t.getInt(2).toLong === c.getLong(2))   // n_bytes
      assert(t.getInt(3).toLong === c.getLong(3))   // width
      assert(t.getInt(4).toLong === c.getLong(4))   // height
      assert(t.getInt(5).toLong === c.getLong(5))   // n_frames
    }
  }

  test("image payloads are real PNGs and decode round-trips the encoded dims") {
    import spark.implicits._
    val media = Multimodal.fakeMediaFromDocs(Tables.table(spark, sfDir, "documents"))
      .filter(col("kind") === "image")
    val rows = media.as[Multimodal.MediaRow].collect()
    assert(rows.nonEmpty)
    rows.take(20).foreach { r =>
      // PNG magic: the payload is a genuine PNG stream, not arithmetic
      assert((r.bytes(0) & 0xff) === 0x89 && r.bytes(1) === 'P'.toByte
        && r.bytes(2) === 'N'.toByte && r.bytes(3) === 'G'.toByte)
    }
    // the real decoder reproduces the dimensions each image was encoded at
    val decoded = Multimodal.decodeMeta(media.as[Multimodal.MediaRow])
      .collect()
    decoded.foreach { m =>
      val (w, h) = Multimodal.imageDims(m.media_id)
      assert((m.width, m.height) === ((w, h)),
        s"media ${m.media_id}: decoded ${(m.width, m.height)} != encoded ${(w, h)}")
    }
  }

  test("frame sampling explodes only narrow columns, one row per stride") {
    import spark.implicits._
    val media = Multimodal.fakeMediaFromDocs(Tables.table(spark, sfDir, "documents"))
    val meta = Multimodal.decodeMeta(media.as[Multimodal.MediaRow])
    val frames = Multimodal.sampleFrames(meta, stride = 4)
    assert(frames.columns.toSeq === Seq("media_id", "frame_idx", "byte_offset"))
    val perVideo = meta.toDF().filter(col("kind") === "video")
      .select("media_id", "n_frames").collect()
      .map(r => r.getLong(0) -> (1 + (r.getInt(1) - 1) / 4)).toMap
    val got = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got === perVideo)
  }
}
