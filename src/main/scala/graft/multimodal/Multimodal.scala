package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.ByteBuffer

import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata — the Spark-side plumbing for a training-data pipeline.
  *
  * ALL THREE modalities now run a real header codec end-to-end:
  *  - IMAGE: fixture payloads are genuine PNGs (encoded with
  *    `javax.imageio`, the JDK's production PNG writer); metadata decode
  *    parses the stream header back (signature + IHDR).
  *  - AUDIO: fixture payloads are genuine RIFF/WAVE files (written by
  *    `javax.sound.sampled.AudioSystem`, the JDK's production WAV
  *    writer); metadata decode parses the RIFF header back with
  *    `AudioSystem.getAudioFileFormat` — sample rate, channel count and
  *    frame length come from the actual `fmt `/`data` chunks, not from
  *    arithmetic on the payload.
  *  - VIDEO: fixture payloads are genuine ISO-BMFF (MP4) byte streams —
  *    `ftyp` + `moov(mvhd + trak(tkhd))` + `mdat` — and metadata decode
  *    is a real box walker reading timescale/duration from `mvhd` and
  *    the 16.16 fixed-point width/height from `tkhd`. Container-header
  *    parsing is pure byte arithmetic; no frame DECODER exists in this
  *    container (that one step would need FFmpeg), so `mdat` holds
  *    deterministic filler — but every byte the operators READ is parsed
  *    from a spec-correct container, not reverse-engineered from length.
  * Everything Spark-level is real and tested: the schema contract, the
  * `mapPartitions` batch shape (decoder initialized once per partition,
  * amortized across rows — the same pattern a JNI/FFmpeg binding needs),
  * and the explode shape for frame sampling.
  *
  * Scale notes: media rows are orders of magnitude wider than their
  * metadata. The operators here keep bytes out of shuffles — metadata is
  * projected *before* any wide operation, and frame sampling explodes
  * only (id, frame_idx, offset) triples, never the payload.
  */
object Multimodal {

  /** Typed media row: payload + source metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata — every populated field comes from a real header
    * parse of the payload bytes. Inapplicable fields are None: images
    * have no sample rate, audio has no pixel dimensions. `n_frames` is
    * the modality's native frame count (1 for stills, PCM sample frames
    * for audio, video frames for video).
    */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
      width: Option[Int], height: Option[Int], n_frames: Int,
      sample_rate: Option[Int], channels: Option[Int],
      duration_ms: Option[Long])

  /** The deterministic dimensions fixture images are encoded with (and
    * the only thing the DuckDB oracle needs to predict — the PNG byte
    * stream itself round-trips through the real codec).
    */
  def imageDims(mediaId: Long): (Int, Int) =
    (16 + (mediaId % 48).toInt, 16 + ((mediaId * 7) % 48).toInt)

  /** Encode a real PNG for `mediaId` at its [[imageDims]], with a
    * deterministic pixel pattern. Every byte of the payload is produced
    * by the JDK's PNG encoder — downstream decode is a genuine parse.
    */
  def encodePng(mediaId: Long): Array[Byte] = {
    val (w, h) = imageDims(mediaId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      px(i) = ((mediaId * 2654435761L + (i % w) * 31 + (i / w) * 17) & 0xffffff).toInt
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val encodePngUdf = udf(encodePng _)

  /** Real PNG HEADER decode: the registered PNG `ImageReader` parses the
    * stream's header (signature + IHDR) and reports pixel dimensions
    * WITHOUT decoding pixel data — metadata extraction should not pay
    * the full inflate cost (measured 15× vs ~10× scale-up on the 10×
    * corpus with the full `ImageIO.read`). Returns (0, 0) for
    * undecodable bytes.
    */
  def decodePngDims(bytes: Array[Byte]): (Int, Int) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (0, 0)
      else {
        val r = readers.next()
        try { r.setInput(iis, true, true); (r.getWidth(0), r.getHeight(0)) }
        finally r.dispose()
      }
    } finally iis.close()
  }

  private val decodePngDimsUdf = udf(decodePngDims _)

  /** Full pixel decode + integer channel statistics: `ImageIO.read`
    * inflates the whole PNG (the real pixel path, unlike
    * [[decodePngDims]]'s header peek) and the RGB planes fold into
    * exact integer sums — so the fixture's deterministic pixel formula
    * lets ANY engine reproduce the result arithmetically, certifying
    * the codec round trip at the sample level (the image analog of
    * [[wavSampleStats]]).
    */
  def pngPixelStats(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          val p = px(i)
          sr += (p >> 16) & 255
          sg += (p >> 8) & 255
          sb += p & 255
          i += 1
        }
        Some((w.toLong * h, sr, sg, sb))
      }
    } catch { case _: Exception => None }

  private val pngStatsUdf = udf(pngPixelStats _)

  /** Per-image channel sums over the image rows of a media frame —
    * narrow (filter + projection), integer-exact end to end.
    */
  def imagePixelStats(media: DataFrame): DataFrame =
    media.filter(col("kind") === "image")
      .withColumn("st", pngStatsUdf(col("bytes")))
      .select(col("media_id"), col("st._1").as("n_px"),
        col("st._2").as("sum_r"), col("st._3").as("sum_g"),
        col("st._4").as("sum_b"))

  /** RESIZE: 2×2 average-pool thumbnail from the full pixel decode —
    * the downsample step of an image-preprocessing pipeline, in exact
    * integer arithmetic (each output channel is the floor-average of
    * its 4 source pixels; odd trailing rows/columns are cropped, the
    * conventional floor(w/2)×floor(h/2) pooling contract). Returns the
    * pooled dimensions and the channel sums OVER THE THUMBNAIL, which
    * an oracle reproduces from the fixture's pixel formula bit-for-bit
    * — certifying the resize arithmetic, not just the decode.
    */
  def pngThumbStats(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val ow = w / 2
        val oh = h / 2
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) {
            var cr = 0; var cg = 0; var cb = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val p = px((2 * y + dy) * w + (2 * x + dx))
                cr += (p >> 16) & 255; cg += (p >> 8) & 255; cb += p & 255
                dx += 1
              }
              dy += 1
            }
            sr += cr / 4; sg += cg / 4; sb += cb / 4
            x += 1
          }
          y += 1
        }
        Some((ow, oh, sr, sg, sb))
      }
    } catch { case _: Exception => None }

  private val pngThumbUdf = udf(pngThumbStats _)

  /** Per-image thumbnail (2×2 average-pool) statistics — the resize
    * transform over the media frame; narrow, integer-exact end to end.
    */
  def imageThumbStats(media: DataFrame): DataFrame =
    media.filter(col("kind") === "image")
      .withColumn("st", pngThumbUdf(col("bytes")))
      .select(col("media_id"), col("st._1").as("thumb_w"),
        col("st._2").as("thumb_h"), col("st._3").as("sum_r"),
        col("st._4").as("sum_g"), col("st._5").as("sum_b"))

  // ---------------------------------------------------------------- audio

  /** The deterministic parameters fixture audio is encoded with:
    * (sampleRateHz, channels, pcmSampleFrames). Like [[imageDims]], this
    * is the only thing the oracle needs to predict — the WAV byte stream
    * itself round-trips through the JDK's RIFF codec.
    */
  def audioParams(mediaId: Long): (Int, Int, Int) = {
    val rates = Array(8000, 11025, 16000, 22050, 44100)
    (rates((mediaId % 5).toInt), 1 + (mediaId % 2).toInt,
      256 + (mediaId % 512).toInt)
  }

  /** Encode a real RIFF/WAVE payload for `mediaId` at its [[audioParams]]
    * (16-bit little-endian PCM, deterministic sample values). Every byte
    * is produced by `AudioSystem.write` — the JDK's WAV encoder — so the
    * downstream decode is a genuine RIFF header parse.
    */
  def encodeWav(mediaId: Long): Array[Byte] =
    // the unscaled encode IS the ×1 gain encode — one copy of the
    // deterministic sample formula (see encodeWavScaled)
    encodeWavScaled(mediaId, 1, 1)

  private val encodeWavUdf = udf(encodeWav _)

  /** Real WAV metadata decode: `AudioSystem.getAudioFileFormat` parses
    * the RIFF `fmt `/`data` chunks (header only — sample data is never
    * inflated) and reports (sampleRateHz, channels, pcmSampleFrames).
    * None for undecodable bytes.
    */
  def decodeWavMeta(bytes: Array[Byte]): Option[(Int, Int, Long)] =
    try {
      val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(bytes))
      if (aff.getType != AudioFileFormat.Type.WAVE) None
      else {
        val f = aff.getFormat
        Some((f.getSampleRate.toInt, f.getChannels, aff.getFrameLength.toLong))
      }
    } catch { case _: Exception => None }

  private val wavMetaUdf = udf(decodeWavMeta _)

  /** Full PCM decode + integer sample statistics: run the payload
    * through `AudioSystem.getAudioInputStream` (the real RIFF→PCM
    * path, not a header peek), then fold the 16-bit LE samples into
    * (nSamples, Σs², peak |s|, clipped-count) — all integer-exact, so
    * the downstream rms/clip-ratio arithmetic is bit-reproducible by
    * any engine that can regenerate the deterministic samples.
    */
  /** The ONE RIFF→PCM decode both sample consumers fold over: the
    * 16-bit LE stream as signed ints, None for undecodable bytes. A
    * decode fix lands in the stats and the fingerprint together.
    */
  private def decodePcm(bytes: Array[Byte]): Option[Array[Int]] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      val data = ais.readAllBytes()
      val n = data.length / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = (((data(2 * i) & 0xff) | (data(2 * i + 1).toInt << 8)).toShort).toInt
        i += 1
      }
      Some(out)
    } catch { case _: Exception => None }

  def wavSampleStats(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    decodePcm(bytes).map { pcm =>
      var i = 0
      var sumsq = 0L
      var peak = 0L
      var clipped = 0L
      while (i < pcm.length) {
        val s = pcm(i)
        sumsq += s.toLong * s
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        if (a >= 32767) clipped += 1
        i += 1
      }
      (pcm.length.toLong, sumsq, peak, clipped)
    }

  private val wavStatsUdf = udf(wavSampleStats _)

  /** Per-clip loudness/clipping profile over the audio rows of a media
    * frame: real PCM decode (see [[wavSampleStats]]), integer folds in
    * the UDF, final rms/clip-ratio arithmetic left to the plan so the
    * rounding is engine-reproducible. Narrow (filter + projection —
    * bytes never shuffle); at 100 TB this is the embarrassingly
    * parallel per-object scan shape every audio-curation signal takes.
    */
  def audioSampleStats(media: DataFrame): DataFrame =
    media.filter(col("kind") === "audio")
      .withColumn("st", wavStatsUdf(col("bytes")))
      .select(col("media_id"), col("st._1").as("n_samples"),
        round(sqrt(col("st._2").cast("double") / col("st._1")), 4).as("rms"),
        col("st._3").as("peak"),
        round(col("st._4").cast("double") / col("st._1"), 6).as("clip_ratio"))

  // ---------------------------------------------------------------- video

  /** The deterministic parameters fixture video is encoded with:
    * (width, height, timescale = frames/sec, nFrames). The MP4 container
    * bytes round-trip through a spec-correct ISO-BMFF writer/parser.
    */
  def videoParams(mediaId: Long): (Int, Int, Int, Int) =
    (160 + (mediaId % 8).toInt * 16, 96 + (mediaId % 6).toInt * 16,
      12 + (mediaId % 20).toInt, 24 + (mediaId % 240).toInt)

  /** ISO-BMFF identity transform matrix (16.16 / 2.30 fixed point). */
  private val Mp4IdentityMatrix =
    Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)

  /** Fixture GOP length: every `Mp4Gop`-th frame is a sync sample
    * (I-frame), recorded in the encoder's `stss` box.
    */
  val Mp4Gop = 4

  private def mp4Box(tpe: String, payload: Array[Byte]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + payload.length)
    bb.putInt(8 + payload.length)
    bb.put(tpe.getBytes("US-ASCII"))
    bb.put(payload)
    bb.array()
  }

  /** Per-frame payload size in the fixture MP4: deterministic and
    * SQL-expressible (8/10/12/14 cycling), so the DuckDB oracle can
    * reproduce every `stsz` entry and every prefix-summed `stco`-based
    * byte offset arithmetically.
    */
  def mp4FrameSize(i: Int): Int = 8 + (i % 4) * 2

  /** Encode a real (header-level) MP4 payload for `mediaId`:
    * `ftyp` + `moov(mvhd + trak(tkhd + mdia(minf(stbl(stsz + stco)))))`
    * + `mdat`. The movie header carries timescale = fps and duration =
    * frame count (so duration in timescale units IS the frame count);
    * the track header carries width/height in 16.16 fixed point; the
    * SAMPLE TABLE is real — `stsz` lists every frame's byte size
    * ([[mp4FrameSize]]) and `stco` the single chunk's absolute file
    * offset, and the `mdat` payload is exactly Σ sizes bytes, so
    * per-frame byte ranges computed from the table land inside the
    * actual frame bytes — all per ISO/IEC 14496-12 box layouts. No
    * frame CODEC exists in this container, but every structural field a
    * demuxer walks is spec-correct.
    */
  def encodeMp4(mediaId: Long, gainNum: Int = 1, gainDen: Int = 1)
      : Array[Byte] = {
    val (w, h, fps, nF) = videoParams(mediaId)
    val ftyp = mp4Box("ftyp", {
      val bb = ByteBuffer.allocate(16)
      bb.put("isom".getBytes("US-ASCII")); bb.putInt(512)
      bb.put("isom".getBytes("US-ASCII")); bb.put("mp41".getBytes("US-ASCII"))
      bb.array()
    })
    val mvhd = mp4Box("mvhd", {
      val bb = ByteBuffer.allocate(100)
      bb.putInt(0)                       // version 0 + flags
      bb.putInt(0); bb.putInt(0)         // creation, modification
      bb.putInt(fps)                     // timescale (units/sec)
      bb.putInt(nF)                      // duration (in timescale units)
      bb.putInt(0x00010000)              // rate 1.0
      bb.putShort(0x0100.toShort)        // volume 1.0
      bb.position(bb.position() + 10)    // reserved
      Mp4IdentityMatrix.foreach(bb.putInt)
      bb.position(bb.position() + 24)    // pre_defined
      bb.putInt(2)                       // next_track_ID
      bb.array()
    })
    val tkhd = mp4Box("tkhd", {
      val bb = ByteBuffer.allocate(84)
      bb.putInt(0x00000007)              // version 0 + enabled|in_movie|in_preview
      bb.putInt(0); bb.putInt(0)         // creation, modification
      bb.putInt(1)                       // track_ID
      bb.putInt(0)                       // reserved
      bb.putInt(nF)                      // duration
      bb.position(bb.position() + 8)     // reserved
      bb.putShort(0); bb.putShort(0)     // layer, alternate_group
      bb.putShort(0); bb.putShort(0)     // volume (video: 0), reserved
      Mp4IdentityMatrix.foreach(bb.putInt)
      bb.putInt(w << 16)                 // width  16.16
      bb.putInt(h << 16)                 // height 16.16
      bb.array()
    })
    val sizes = Array.tabulate(nF)(mp4FrameSize)
    val stsz = mp4Box("stsz", {
      val bb = ByteBuffer.allocate(12 + 4 * nF)
      bb.putInt(0)           // version + flags
      bb.putInt(0)           // sample_size 0 ⇒ per-sample table follows
      bb.putInt(nF)          // sample_count
      sizes.foreach(bb.putInt)
      bb.array()
    })
    // stss (SyncSampleBox, ISO 14496-12 §8.6.2): the REAL keyframe
    // signal — 1-BASED sample numbers of the I-frames. The fixture's
    // GOP is 4: frames 0,4,8,… are sync samples
    val syncNos = 0 until nF by Mp4Gop
    val stss = mp4Box("stss", {
      val bb = ByteBuffer.allocate(8 + 4 * syncNos.length)
      bb.putInt(0)               // version + flags
      bb.putInt(syncNos.length)  // entry_count
      syncNos.foreach(i => bb.putInt(i + 1))
      bb.array()
    })
    def stco(chunkOff: Int) = mp4Box("stco", {
      val bb = ByteBuffer.allocate(12)
      bb.putInt(0)           // version + flags
      bb.putInt(1)           // entry_count: one chunk holds all samples
      bb.putInt(chunkOff)    // absolute file offset of the chunk
      bb.array()
    })
    def moov(chunkOff: Int) = mp4Box("moov", mvhd ++ mp4Box("trak",
      tkhd ++ mp4Box("mdia", mp4Box("minf", mp4Box("stbl",
        stsz ++ stss ++ stco(chunkOff))))))
    // stco stores an ABSOLUTE file offset; the moov size doesn't depend
    // on the offset VALUE, so a two-pass build resolves it exactly
    val mdatPayloadOff = ftyp.length + moov(0).length + 8
    val filler = new Array[Byte](sizes.sum)
    var i = 0
    while (i < filler.length) {
      filler(i) =
        ((((mediaId * 31 + i * 131) & 0xff) * gainNum / gainDen).toByte)
      i += 1
    }
    ftyp ++ moov(mdatPayloadOff) ++ mp4Box("mdat", filler)
  }

  /** Re-encode `mediaId`'s fixture video with every elementary-stream
    * byte scaled by num/den (truncated; bytes are unsigned so floor =
    * truncation) — the planted near-duplicate for [[videoFingerprints]]:
    * the video twin of [[encodeWavScaled]]. The container boxes are
    * byte-identical (same sample table); only the mdat content dims.
    */
  def encodeMp4Scaled(mediaId: Long, num: Int, den: Int): Array[Byte] =
    encodeMp4(mediaId, num, den)

  private val encodeMp4Udf = udf((id: Long) => encodeMp4(id))
  private val encodeMp4ScaledUdf = udf(encodeMp4Scaled _)

  private def beInt(bytes: Array[Byte], off: Int): Int =
    ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)

  /** Real MP4 metadata decode: walk the top-level box sequence to
    * `moov`, then its children to `mvhd` (timescale, duration) and
    * `trak/tkhd` (16.16 width/height). Returns
    * (timescale, durationUnits, width, height); None for bytes that are
    * not a well-formed ISO-BMFF stream. Pure byte arithmetic — container
    * headers need no codec.
    */
  def decodeMp4Meta(bytes: Array[Byte]): Option[(Int, Long, Int, Int)] = {
    // (payloadStart, boxEnd) of the first `tpe` box in [start, end)
    def findBox(start: Int, end: Int, tpe: String): Option[(Int, Int)] = {
      var off = start
      while (off + 8 <= end) {
        val size = beInt(bytes, off)
        if (size < 8 || off + size > end) return None
        if (new String(bytes, off + 4, 4, "US-ASCII") == tpe)
          return Some((off + 8, off + size))
        off += size
      }
      None
    }
    try {
      for {
        (moovS, moovE) <- findBox(0, bytes.length, "moov")
        (mvhdS, mvhdE) <- findBox(moovS, moovE, "mvhd")
        (trakS, trakE) <- findBox(moovS, moovE, "trak")
        (tkhdS, tkhdE) <- findBox(trakS, trakE, "tkhd")
        if mvhdE - mvhdS >= 100 && tkhdE - tkhdS >= 84
        // version-0 boxes only (32-bit times); version-1 would shift offsets
        if bytes(mvhdS) == 0 && bytes(tkhdS) == 0
      } yield (
        beInt(bytes, mvhdS + 12),                       // timescale
        beInt(bytes, mvhdS + 16).toLong & 0xffffffffL,  // duration
        beInt(bytes, tkhdS + 76) >>> 16,                // width  16.16 → int
        beInt(bytes, tkhdS + 80) >>> 16)                // height 16.16 → int
    } catch { case _: Exception => None }
  }

  private val mp4MetaUdf = udf(decodeMp4Meta _)

  /** Real MP4 SAMPLE-TABLE walk (`moov/trak/mdia/minf/stbl`): `stsz`
    * gives every frame's byte size (or the uniform size), `stco` the
    * chunk's absolute file offset; per-frame byte offsets are the chunk
    * offset plus the prefix sum of the preceding sizes — exactly the
    * computation a demuxer does to seek a frame, for the single-chunk
    * layout this fixture writes. Returns (per-frame offsets, sizes);
    * None when the boxes are absent or malformed.
    */
  def decodeMp4SampleTable(bytes: Array[Byte])
      : Option[(Array[Long], Array[Int])] = {
    def findBox(start: Int, end: Int, tpe: String): Option[(Int, Int)] =
      findMp4Box(bytes, start, end, tpe)
    try {
      for {
        (moovS, moovE) <- findBox(0, bytes.length, "moov")
        (trakS, trakE) <- findBox(moovS, moovE, "trak")
        (mdiaS, mdiaE) <- findBox(trakS, trakE, "mdia")
        (minfS, minfE) <- findBox(mdiaS, mdiaE, "minf")
        (stblS, stblE) <- findBox(minfS, minfE, "stbl")
        (stszS, stszE) <- findBox(stblS, stblE, "stsz")
        (stcoS, stcoE) <- findBox(stblS, stblE, "stco")
        if stszE - stszS >= 12 && stcoE - stcoS >= 12
        uniform = beInt(bytes, stszS + 4)
        count = beInt(bytes, stszS + 8)
        // long arithmetic + a physical bound: a count the FILE cannot
        // contain (more samples than bytes) is malformed, not a reason
        // to allocate gigabytes — the per-sample table must really be
        // present, and the claim must fit the payload either way
        if count > 0 && count <= bytes.length
        if uniform != 0 || (stszE - stszS).toLong >= 12L + 4L * count
        if beInt(bytes, stcoS + 4) >= 1
      } yield {
        val sizes =
          if (uniform != 0) Array.fill(count)(uniform)
          else Array.tabulate(count)(i => beInt(bytes, stszS + 12 + 4 * i))
        val chunkOff = beInt(bytes, stcoS + 8).toLong & 0xffffffffL
        val offsets = new Array[Long](count)
        var acc = chunkOff
        var i = 0
        while (i < count) { offsets(i) = acc; acc += sizes(i); i += 1 }
        (offsets, sizes)
      }
    } catch { case _: Exception => None }
  }

  private val mp4SampleTableUdf = udf(decodeMp4SampleTable _)

  /** Child-box scan shared by the MP4 walks: payload bounds of the first
    * `tpe` box between `start` and `end`, None when absent/malformed.
    */
  private def findMp4Box(bytes: Array[Byte], start: Int, end: Int,
      tpe: String): Option[(Int, Int)] = {
    var off = start
    while (off + 8 <= end) {
      val size = beInt(bytes, off)
      if (size < 8 || off + size > end) return None
      if (new String(bytes, off + 4, 4, "US-ASCII") == tpe)
        return Some((off + 8, off + size))
      off += size
    }
    None
  }

  /** `stss` (SyncSampleBox) walk: the container's ACTUAL keyframe
    * signal — 1-based sample numbers of the sync samples (I-frames).
    * None when the box is absent (per ISO 14496-12 an absent `stss`
    * means EVERY sample is sync — the caller owns that default) or
    * malformed. Same physical-bound hygiene as the stsz walk: an entry
    * count the box cannot contain is malformed, not an allocation.
    */
  def decodeMp4SyncSamples(bytes: Array[Byte]): Option[Array[Int]] = {
    try {
      for {
        (moovS, moovE) <- findMp4Box(bytes, 0, bytes.length, "moov")
        (trakS, trakE) <- findMp4Box(bytes, moovS, moovE, "trak")
        (mdiaS, mdiaE) <- findMp4Box(bytes, trakS, trakE, "mdia")
        (minfS, minfE) <- findMp4Box(bytes, mdiaS, mdiaE, "minf")
        (stblS, stblE) <- findMp4Box(bytes, minfS, minfE, "stbl")
        (stssS, stssE) <- findMp4Box(bytes, stblS, stblE, "stss")
        if stssE - stssS >= 8
        count = beInt(bytes, stssS + 4)
        if count >= 0 && (stssE - stssS).toLong >= 8L + 4L * count
      } yield Array.tabulate(count)(i => beInt(bytes, stssS + 8 + 4 * i))
    } catch { case _: Exception => None }
  }

  private val mp4SyncUdf = udf(decodeMp4SyncSamples _)

  /** 64-bit perceptual difference hash (dHash) of an image payload:
    * real decode → grayscale box-average onto a 9×8 grid → one bit per
    * horizontal gradient sign (cell > right neighbor). Re-encodes,
    * brightness shifts, and small edits preserve most gradient signs, so
    * near-duplicate images land within a few bits of each other while
    * unrelated images differ in ~32. Integer-only arithmetic (sums
    * cross-multiplied instead of divided) → bit-identical across
    * JVMs/platforms. None for undecodable payloads.
    */
  def dHash(bytes: Array[Byte]): Option[Long] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return None
    val (w, h) = (img.getWidth, img.getHeight)
    if (w < 9 || h < 8) return None
    // bulk raster fetch: ONE getRGB call (per-pixel getRGB pays a
    // ColorModel conversion per call — measured ~3× slower)
    val px = img.getRGB(0, 0, w, h, null, 0, w)
    // 9×8 box-average grayscale grid: per cell keep (sum, count) so the
    // bit test below can cross-multiply — no division rounding anywhere
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      val row = y * w
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        val rgb = px(row + x)
        val gray = ((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
          (rgb & 0xff) * 114L
        sums(gy)(gx) += gray
        cnts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var hash = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        // avg(gx) > avg(gx+1)  ⇔  sumL·cntR > sumR·cntL (exact integers)
        if (sums(gy)(gx) * cnts(gy)(gx + 1) > sums(gy)(gx + 1) * cnts(gy)(gx))
          hash |= 1L << (gy * 8 + gx)
        gx += 1
      }
      gy += 1
    }
    Some(hash)
  }

  private val dHashUdf = udf(dHash _)

  /** Perceptual hashes of the image rows: (media_id, phash). Decode is
    * the whole cost — a narrow projection, zero shuffle, linear scan.
    */
  def imagePhashes(media: DataFrame): DataFrame =
    media.filter(col("kind") === "image")
      .select(col("media_id"), dHashUdf(col("bytes")).as("phash"))
      .filter(col("phash").isNotNull)

  /** Near-duplicate image pairs by perceptual hash: all (a, b) with
    * hamming(phash_a, phash_b) ≤ `maxHamming`, found by ≥2-SHARED-CHUNKS
    * combinatorial banding ([[phashCandidatesPairBand]]): the hash splits
    * into c = maxHamming + 2 chunks, so a pair within the bound disturbs
    * at most maxHamming chunks and must agree exactly on ≥ 2 — i.e. on at
    * least one of the C(c,2) CHUNK PAIRS, which is the equi-join key.
    * Guaranteed recall like the classic one-shared-chunk split, but the
    * band key carries 2 chunks ≈ double the bits: at h = 6 the key space
    * is 2^16 per band instead of the 2^9 that the r13 sf10 decade probe
    * measured saturating at ~300k hashes (candidate join gone quadratic).
    * `bit_count(xor)` verifies the exact distance on candidates only, and
    * the ≤-bound filter runs BEFORE the pair-level distinct so the dedup
    * shuffle carries only verified pairs, never the full candidate set.
    * ONE shuffle keyed on (band, chunk-pair value), never image × image.
    *
    * Loud capacity guard (the `needsRebalance` convention): banding has a
    * measurable saturation point — once mean bucket occupancy passes
    * [[MaxBandOccupancy]] the candidate join is quadratic-in-practice, so
    * rather than silently degrade, the corpus size is probed (one
    * `limit(cap+1)` count over the lazily checkpointed hash frame, which
    * the join then reuses) and the breach throws with the remediation
    * dials (smaller bound / longer fingerprint) spelled out.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val ckpt = hashes.localCheckpoint(eager = false)
    val cap = bandCapacity(maxHamming)
    val n = ckpt.limit((cap + 1).toInt).count()
    if (n > cap) throw new IllegalStateException(
      s"phashPairs: $n fingerprints exceed the banding capacity $cap at " +
        s"maxHamming=$maxHamming (mean band-bucket occupancy > " +
        s"$MaxBandOccupancy — the candidate join would go quadratic). " +
        "Lower the hamming bound (more key bits per band) or move to a " +
        "longer fingerprint.")
    phashCandidatesPairBand(ckpt, maxHamming, preFilter = true).distinct()
  }

  /** Mean band-bucket occupancy above which the banded self-join is
    * declared saturated (candidates ≈ occupancy × corpus — no longer
    * near-linear) and [[phashPairs]] fails loudly instead.
    */
  val MaxBandOccupancy = 16L

  /** [[phashPairs]]'s counted capacity: fingerprint count beyond which
    * mean bucket occupancy at `maxHamming` passes [[MaxBandOccupancy]] —
    * the key space per band is 2^(2·width) with width = 64/(maxHamming+2)
    * chunk bits (two chunks form the band key).
    */
  def bandCapacity(maxHamming: Int): Long = {
    require(maxHamming >= 0 && maxHamming < 16, "maxHamming in [0, 16)")
    val keyBits = 2 * (64 / (maxHamming + 2))
    // cap the probe at an int-sized count so limit(cap+1) stays valid —
    // 2^31 fingerprints saturate nothing at these key widths — and test
    // keyBits FIRST: a Long shift is mod-64, so 16 << 64 (h = 0: two
    // 32-bit chunks) would silently wrap to 16 instead of "unbounded"
    if (keyBits >= 31) (Int.MaxValue - 1).toLong
    else (MaxBandOccupancy << keyBits) min ((Int.MaxValue - 1).toLong)
  }

  /** The ≥2-shared-chunks candidate generator behind [[phashPairs]]:
    * c = maxHamming + 2 chunks of width 64/c, band key = the packed long
    * (bandIndex(i,j), chunk_i, chunk_j) over all C(c,2) chunk pairs.
    * Pigeonhole recall proof: ≤ maxHamming differing bits land in at most
    * maxHamming of the c chunks (leftover high bits, when 64 isn't a
    * multiple of c, live OUTSIDE every chunk and can only leave more
    * chunks intact), so ≥ 2 chunks match exactly and the pair shares at
    * least one band key. MultimodalSpec pins this against brute force.
    * With `preFilter` the ≤-bound verdict applies before the pair-level
    * distinct (the serving path — the dedup shuffle carries only true
    * pairs); without it, every distinct candidate survives with its exact
    * hamming (the `mm_band_eval` measuring path).
    */
  def phashCandidatesPairBand(hashes: DataFrame, maxHamming: Int,
      preFilter: Boolean = false): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16, "maxHamming in [0, 16)")
    val c = maxHamming + 2
    val width = 64 / c
    val mask = (1L << width) - 1
    def chunk(k: Int) =
      shiftrightunsigned(col("phash"), k * width).bitwiseAND(lit(mask))
    // one LONG band key: (band index | chunk_i | chunk_j) bit-packed —
    // band index < C(17,2) = 136 needs 8 bits, 2·width ≤ 42 bits at
    // h = 1, so the key always fits; a single long shuffles cheaper
    // than a 4-column struct key
    val keys = (for { i <- 0 until c; j <- (i + 1) until c } yield
      (lit(((i * c + j).toLong) << (2 * width)).bitwiseOR(
        shiftleft(chunk(i), width)).bitwiseOR(chunk(j)))): IndexedSeq[Column]
    val banded = hashes.select(col("media_id"), col("phash"),
      explode(array(keys: _*)).as("bk"))
    val a = banded.select(col("media_id").as("a_id"), col("phash").as("a_ph"),
      col("bk"))
    val b = banded.select(col("media_id").as("b_id"), col("phash").as("b_ph"),
      col("bk"))
    val cand = a.join(b, Seq("bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_ph").bitwiseXOR(col("b_ph"))).cast("long").as("hamming"))
    if (preFilter) cand.filter(col("hamming") <= maxHamming)
    else cand.distinct()
  }

  /** The CLASSIC one-shared-chunk banding's CANDIDATES (distinct
    * same-chunk pairs with their exact hamming, before the ≤ maxHamming
    * verdict) — retained as the `mm_band_eval` measuring device, no
    * longer the serving path: the chunk space is 2^(64/(maxHamming+1)),
    * so once the corpus outgrows it, bucket occupancy — and candidate
    * count — turns quadratic (measured: the r13 sf10 probe at
    * maxHamming = 6 holds only 512 values for ~333k hashes, 20.6× per
    * decade). [[phashCandidatesPairBand]] is the scale-safe successor
    * (squared key space at the same recall bound); the eval sweeps BOTH
    * schemes so the trade stays a measured number instead of folklore.
    */
  def phashCandidates(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16, "maxHamming in [0, 16)")
    val bands = maxHamming + 1
    val width = 64 / bands
    val mask = (1L << width) - 1
    val banded = hashes.select(col("media_id"), col("phash"),
      posexplode(array((0 until bands).map(i =>
        shiftrightunsigned(col("phash"), i * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "chunk")))
    val a = banded.select(col("media_id").as("a_id"), col("phash").as("a_ph"),
      col("band"), col("chunk"))
    val b = banded.select(col("media_id").as("b_id"), col("phash").as("b_ph"),
      col("band"), col("chunk"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_ph").bitwiseXOR(col("b_ph"))).cast("long").as("hamming"))
      .distinct()
  }

  /** 64-bit energy-contour fingerprint of a WAV payload — the audio twin
    * of [[dHash]]: the PCM stream decodes once, |sample| sums accumulate
    * into 65 equal time windows, and bit k records whether window k's
    * MEAN |amplitude| exceeds window k+1's (cross-multiplied exact
    * integers, since window sizes can differ by one sample). A gain
    * change scales every window sum by the same positive factor and
    * leaves the contour signs intact — the near-dup robustness a raw
    * PCM hash lacks. None for undecodable bytes or clips shorter than
    * 65 samples. Unlike the image hash, this one is ORACLE-able: the
    * fixture samples are arithmetic in (media_id, i), so DuckDB can
    * regenerate the windows and the bit string.
    */
  def audioFingerprint(bytes: Array[Byte]): Option[Long] =
    decodePcm(bytes).filter(_.length >= 65).map { pcm =>
      val n = pcm.length
      val sums = new Array[Long](65)
      val cnts = new Array[Long](65)
      var i = 0
      while (i < n) {
        val w = (i.toLong * 65 / n).toInt
        sums(w) += math.abs(pcm(i).toLong)
        cnts(w) += 1
        i += 1
      }
      var fp = 0L
      var k = 0
      while (k < 64) {
        if (sums(k) * cnts(k + 1) > sums(k + 1) * cnts(k)) fp |= 1L << k
        k += 1
      }
      fp
    }

  private val audioFpUdf = udf(audioFingerprint _)

  /** Energy-contour fingerprints of the audio rows, `(media_id, phash)`
    * — the column is named like the image hash so [[phashPairs]]'s
    * pigeonhole banding serves both modalities unchanged.
    */
  def audioFingerprints(media: DataFrame): DataFrame =
    media.filter(col("kind") === "audio")
      .select(col("media_id"), audioFpUdf(col("bytes")).as("phash"))
      .filter(col("phash").isNotNull)

  /** Re-encode `mediaId`'s fixture audio with every sample scaled by
    * num/den (truncated toward zero) — the planted near-duplicate for
    * [[audioFingerprints]]: positive gain preserves every window-energy
    * ordering except integer-truncation near-ties, so the twin lands a
    * few bits from the original.
    */
  def encodeWavScaled(mediaId: Long, num: Int, den: Int): Array[Byte] = {
    val (sr, ch, nFrames) = audioParams(mediaId)
    val fmt = new AudioFormat(sr.toFloat, 16, ch, true, false)
    val data = new Array[Byte](nFrames * ch * 2)
    var i = 0
    while (i < data.length / 2) {
      val s0 = ((mediaId * 2654435761L + i * 40503L) & 0xffff).toShort.toInt
      val s = (s0 * num / den).toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt,
      nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private val encodeWavScaledUdf = udf(encodeWavScaled _)

  /** The fixture media plus a gain-scaled re-encode of every audio clip
    * (twin ids offset by `twinOffset`) — input for the audio near-dup
    * pair demo/test: each clip should pair with exactly its twin.
    */
  def withScaledAudioTwins(media: DataFrame, num: Int, den: Int,
      twinOffset: Long): DataFrame = {
    requireMediaSchema(media, "withScaledAudioTwins")
    // the guard rides the PASSTHROUGH projection: every input row of
    // every kind is checked (a non-audio row at/above the offset would
    // collide with a twin id just as silently), not only the twinned one
    media.select(guardedId(twinOffset).as("media_id"), col("kind"),
        col("bytes"))
      .unionByName(media.filter(col("kind") === "audio")
        .select((col("media_id") + twinOffset).as("media_id"), col("kind"),
          encodeWavScaledUdf(col("media_id"), lit(num), lit(den)).as("bytes")))
  }

  /** 64-bit content-contour fingerprint of an MP4 payload — the video
    * member of the perceptual-hash family ([[dHash]] / [[audioFingerprint]]):
    * the REAL stsz/stco sample-table walk locates every frame's byte
    * range, the frames' bytes concatenate into the elementary stream
    * (exactly what a demuxer hands the decoder), unsigned byte values
    * sum into 65 equal stream windows, and bit k records whether window
    * k's mean exceeds window k+1's (cross-multiplied exact integers —
    * the [[audioFingerprint]] convention). A uniform content gain
    * scales every window sum by the same positive factor and leaves
    * the contour signs intact. None for unparseable containers, frame
    * ranges outside the payload, or streams shorter than 65 bytes.
    * ORACLE-able: the fixture mdat bytes are arithmetic in
    * (media_id, i), so DuckDB regenerates windows and bits exactly.
    */
  def videoFingerprint(bytes: Array[Byte]): Option[Long] =
    decodeMp4SampleTable(bytes).flatMap { case (offsets, sizes) =>
      val total = sizes.foldLeft(0L)(_ + _)
      // EVERY frame range must be validated, not just the first offset
      // and the last frame: decodeMp4SampleTable accepts arbitrary
      // 32-bit stsz values (negative, non-monotonic), so a crafted
      // container can keep the endpoints plausible while a MIDDLE
      // frame indexes outside the payload — and video_fingerprint is
      // SQL-registered, so the walk is user-reachable. Long-range
      // checks against bytes.length (< 2^31) also reject any offset
      // the later (offsets(f)+j).toInt would silently truncate.
      val inBounds = sizes.length > 0 && (0 until sizes.length).forall { f =>
        sizes(f) >= 0 && offsets(f) >= 0 &&
          offsets(f) + sizes(f) <= bytes.length
      }
      if (total < 65 || !inBounds) None
      else {
        val sums = new Array[Long](65)
        val cnts = new Array[Long](65)
        var pos = 0L
        var f = 0
        while (f < sizes.length) {
          var j = 0
          while (j < sizes(f)) {
            val w = (pos * 65 / total).toInt
            sums(w) += (bytes((offsets(f) + j).toInt) & 0xff).toLong
            cnts(w) += 1
            pos += 1
            j += 1
          }
          f += 1
        }
        var fp = 0L
        var k = 0
        while (k < 64) {
          if (sums(k) * cnts(k + 1) > sums(k + 1) * cnts(k)) fp |= 1L << k
          k += 1
        }
        Some(fp)
      }
    }

  private val videoFpUdf = udf(videoFingerprint _)

  /** Content-contour fingerprints of the video rows, `(media_id, phash)`
    * — named like the image hash so [[phashPairs]]'s pigeonhole banding
    * serves all three modalities unchanged.
    */
  def videoFingerprints(media: DataFrame): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), videoFpUdf(col("bytes")).as("phash"))
      .filter(col("phash").isNotNull)

  /** The fixture media plus a gain-scaled re-encode of every video clip
    * (twin ids offset by `twinOffset`) — input for the video near-dup
    * pair demo/test, mirroring [[withScaledAudioTwins]].
    */
  def withScaledVideoTwins(media: DataFrame, num: Int, den: Int,
      twinOffset: Long): DataFrame = {
    requireMediaSchema(media, "withScaledVideoTwins")
    media.select(guardedId(twinOffset).as("media_id"), col("kind"),
        col("bytes"))
      .unionByName(media.filter(col("kind") === "video")
        .select((col("media_id") + twinOffset).as("media_id"), col("kind"),
          encodeMp4ScaledUdf(col("media_id"), lit(num), lit(den)).as("bytes")))
  }

  /** Twin-builder input contract: positional unions silently misalign a
    * caller's differently-ordered frame, so both builders union BY NAME
    * and demand exactly the fakeMediaFromDocs column set up front.
    */
  private def requireMediaSchema(media: DataFrame, who: String): Unit = {
    val need = Set("media_id", "kind", "bytes")
    require(media.columns.toSet == need,
      s"$who expects columns $need, got ${media.columns.mkString("(", ", ", ")")}")
  }

  /** Data-derived twin offset: one above the frame's max media_id (a
    * 1-row aggregation, run once per fixture at twin-frame build). A
    * HARD-CODED offset breaks on a bigger fixture — the sf1 replica's
    * ids reach ~1e9 and tripped [[guardedId]] at 1e6/2e6; deriving from
    * the data keeps the no-collision invariant at every scale.
    */
  def twinOffsetFor(media: DataFrame): Long = {
    val row = media.agg(org.apache.spark.sql.functions.max("media_id")).head()
    // max() of an empty frame is NULL; a bare getLong would NPE with no
    // context — fail with the actual contract violation instead
    require(!row.isNullAt(0),
      "twinOffsetFor: empty media frame — twin offsets are derived from " +
        "max(media_id) and need at least one real media row")
    row.getLong(0) + 1L
  }

  /** media_id with the twin-collision guard folded into the expression
    * (load-bearing, so column pruning cannot skip it): a real id at or
    * above the offset would collide with a twin id and silently corrupt
    * the planted-pair bookkeeping — fail the job instead.
    */
  private def guardedId(twinOffset: Long) =
    when(col("media_id") < twinOffset, col("media_id"))
      .otherwise(raise_error(concat(
        lit(s"twin offset $twinOffset <= real media_id "), col("media_id"))))

  /** Re-encode `mediaId`'s fixture image with every channel brightened by
    * `delta` (clamped) — the planted near-duplicate used to demonstrate
    * [[phashPairs]]: a global brightness shift preserves every gradient
    * sign except where channels saturate, so the twin lands a few bits
    * from the original.
    */
  def encodePngBrightened(mediaId: Long, delta: Int): Array[Byte] = {
    val (w, h) = imageDims(mediaId)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var i = 0
    while (i < px.length) {
      val rgb = ((mediaId * 2654435761L + (i % w) * 31 + (i / w) * 17) & 0xffffff).toInt
      val r = math.min(((rgb >> 16) & 0xff) + delta, 255)
      val g = math.min(((rgb >> 8) & 0xff) + delta, 255)
      val bb = math.min((rgb & 0xff) + delta, 255)
      px(i) = (r << 16) | (g << 8) | bb
      i += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val encodePngBrightenedUdf = udf(encodePngBrightened _)

  /** The fixture media plus a brightness-shifted re-encode of every image
    * (twin ids offset by `twinOffset`) — input for the near-dup pair
    * demo/test: each image should pair with exactly its twin.
    */
  def withBrightenedTwins(media: DataFrame, delta: Int,
      twinOffset: Long): DataFrame = {
    requireMediaSchema(media, "withBrightenedTwins")
    // guard on the passthrough projection — see withScaledAudioTwins
    media.select(guardedId(twinOffset).as("media_id"), col("kind"),
        col("bytes"))
      .unionByName(media.filter(col("kind") === "image")
        .select((col("media_id") + twinOffset).as("media_id"), col("kind"),
          encodePngBrightenedUdf(col("media_id"), lit(delta)).as("bytes")))
  }

  private def kindOf(idCol: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(idCol, lit(3)) + 1).cast("int"))

  /** Deterministic fixture media derived from the documents fixture —
    * every payload is a REAL container byte stream for its modality:
    * PNG (javax.imageio) for images, RIFF/WAVE (javax.sound) for audio,
    * ISO-BMFF/MP4 (spec-layout box writer) for video. The encode
    * parameters are pure functions of the id ([[imageDims]] /
    * [[audioParams]] / [[videoParams]]) so an independent engine can
    * predict what a real decode must recover.
    */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      kindOf(col("doc_id")).as("kind"),
      when(kindOf(col("doc_id")) === "image", encodePngUdf(col("doc_id")))
        .when(kindOf(col("doc_id")) === "audio", encodeWavUdf(col("doc_id")))
        .otherwise(encodeMp4Udf(col("doc_id"))).as("bytes"))

  /** Decode media metadata with the per-partition-init `mapPartitions`
    * batch shape (decoder/codec context constructed once per partition,
    * not per row). All three modalities decode through real header
    * parsers: PNG IHDR, WAV RIFF, MP4 mvhd/tkhd. Undecodable payloads
    * surface as zero/None fields rather than failing the partition.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (e.g. load codec lib);
      // ImageIO/AudioSystem register their reader SPIs once per JVM
      rows.map { r =>
        r.kind match {
          case "image" =>
            val (w, h) = decodePngDims(r.bytes)
            MediaMeta(r.media_id, r.kind, r.bytes.length, Some(w), Some(h),
              n_frames = 1, None, None, None)
          case "audio" =>
            val (sr, ch, frames) =
              decodeWavMeta(r.bytes).getOrElse((0, 0, 0L))
            MediaMeta(r.media_id, r.kind, r.bytes.length, None, None,
              n_frames = frames.toInt, Some(sr), Some(ch),
              Some(if (sr > 0) frames * 1000L / sr else 0L))
          case _ =>
            val (ts, dur, w, h) =
              decodeMp4Meta(r.bytes).getOrElse((0, 0L, 0, 0))
            MediaMeta(r.media_id, r.kind, r.bytes.length, Some(w), Some(h),
              n_frames = dur.toInt, None, None,
              Some(if (ts > 0) dur * 1000L / ts else 0L))
        }
      }
    }
  }

  /** Frame sampling for video rows, driven by the REAL sample table:
    * every `stride`-th frame index explodes with its presentation
    * timestamp (floor ms from the parsed `mvhd` duration/timescale),
    * its absolute byte offset (`stco` chunk offset + `stsz` prefix sum
    * — the demuxer's seek computation) and its byte size (`stsz`). The
    * frame COUNT is the `stsz` sample count, not header arithmetic.
    * Only the narrow (offsets, sizes) arrays enter the explode; payload
    * bytes never do.
    */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        mp4MetaUdf(col("bytes")).as("m"),
        mp4SampleTableUdf(col("bytes")).as("st"))
      .filter(col("m").isNotNull && col("st").isNotNull &&
        size(col("st._1")) > 0) // a zero-sample table has nothing to emit
      .select(col("media_id"),
        expr("m._2 * 1000 div m._1").as("duration_ms"),
        size(col("st._1")).cast("long").as("n_frames"),
        col("st._1").as("offs"), col("st._2").as("szs"))
      .select(col("media_id"), col("duration_ms"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong)))
          .as("frame_idx"),
        col("offs"), col("szs"))
      .select(col("media_id"), col("frame_idx"),
        expr("frame_idx * duration_ms div n_frames").as("ts_ms"),
        element_at(col("offs"), (col("frame_idx") + 1).cast("int"))
          .as("byte_off"),
        element_at(col("szs"), (col("frame_idx") + 1).cast("int"))
          .cast("long").as("frame_bytes"))

  /** Keyframe extraction for video rows from the REAL `stss` sync-sample
    * box (not a size heuristic): each listed 1-based sample number joins
    * back to the parsed sample table for its 0-based frame index, seek
    * offset and byte size. Rows whose container carries no `stss` are
    * dropped here — for the "absent ⇒ all sync" default, sample with
    * [[sampleFrames]] stride 1 instead; conflating the two would turn a
    * missing box into "every frame is a keyframe" silently. Narrow
    * columns only; zero shuffle, like the other decode paths.
    */
  def syncFrames(media: DataFrame): DataFrame =
    media
      .filter(col("kind") === "video")
      .select(col("media_id"),
        mp4SampleTableUdf(col("bytes")).as("st"),
        mp4SyncUdf(col("bytes")).as("sync"))
      .filter(col("st").isNotNull && col("sync").isNotNull)
      .select(col("media_id"), col("st._1").as("offs"),
        col("st._2").as("szs"), explode(col("sync")).as("sample_no"))
      // a sync entry pointing outside the sample table is malformed —
      // drop the entry, keep the file's valid ones
      .filter(col("sample_no") >= 1 && col("sample_no") <= size(col("offs")))
      .select(col("media_id"),
        (col("sample_no") - 1).cast("long").as("frame_idx"),
        element_at(col("offs"), col("sample_no")).as("byte_off"),
        element_at(col("szs"), col("sample_no")).cast("long").as("frame_bytes"))

  /** DataFrame-level metadata decode — used by the oracled query. Every
    * populated value comes from a real header parse of the payload (PNG
    * IHDR / WAV RIFF / MP4 box walk), evaluated only on rows of that
    * kind; the oracle predicts the values from the deterministic encode
    * parameters — if any decode were fake, the parse would not reproduce
    * them. Inapplicable fields are NULL.
    */
  def decodeMetaColumns(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .withColumn("png",
        when(col("kind") === "image", decodePngDimsUdf(col("bytes"))))
      .withColumn("wav",
        when(col("kind") === "audio", wavMetaUdf(col("bytes"))))
      .withColumn("mp4",
        when(col("kind") === "video", mp4MetaUdf(col("bytes"))))
      .withColumn("width",
        when(col("kind") === "image", col("png._1"))
          .when(col("kind") === "video", col("mp4._3")).cast("long"))
      .withColumn("height",
        when(col("kind") === "image", col("png._2"))
          .when(col("kind") === "video", col("mp4._4")).cast("long"))
      .withColumn("n_frames",
        when(col("kind") === "image", lit(1L))
          .when(col("kind") === "audio", col("wav._3"))
          .otherwise(col("mp4._2")).cast("long"))
      .withColumn("sample_rate",
        when(col("kind") === "audio", col("wav._1")).cast("long"))
      .withColumn("channels",
        when(col("kind") === "audio", col("wav._2")).cast("long"))
      .withColumn("duration_ms",
        when(col("kind") === "audio", expr("wav._3 * 1000 div wav._1"))
          .when(col("kind") === "video", expr("mp4._2 * 1000 div mp4._1"))
          .cast("long"))
      .select("media_id", "kind", "n_bytes", "width", "height", "n_frames",
        "sample_rate", "channels", "duration_ms")
}
