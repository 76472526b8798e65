package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque `binary` + typed
  * metadata — the Spark-side plumbing for a training-data pipeline.
  *
  * The IMAGE path runs a real codec end-to-end: fixture payloads are
  * genuine PNGs (encoded with `javax.imageio`, the JDK's production PNG
  * writer) and metadata decode parses them back with `ImageIO.read` — an
  * honest encode→decode round trip, no arithmetic stand-in. The AUDIO /
  * VIDEO paths remain STUBBED with deterministic byte arithmetic (no
  * audio/video codec exists in this container — loudly marked below);
  * everything Spark-level is real and tested either way: the schema
  * contract, the `mapPartitions` batch shape (decoder initialized once
  * per partition, amortized across rows — the same pattern a JNI/FFmpeg
  * binding needs), and the explode shape for frame sampling.
  *
  * Scale notes: media rows are orders of magnitude wider than their
  * metadata. The operators here keep bytes out of shuffles — metadata is
  * projected *before* any wide operation, and frame sampling explodes
  * only (id, frame_idx, offset) triples, never the payload.
  */
object Multimodal {

  /** Typed media row: payload + source metadata. */
  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte])

  /** Decoded metadata — real for images, stub-derived for audio/video. */
  case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int)

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
    * hamming(phash_a, phash_b) ≤ `maxHamming`, found by pigeonhole
    * banding — the 64-bit hash splits into `maxHamming + 1` chunks, and
    * any pair within the bound must agree exactly on ≥ 1 chunk, so an
    * equi-join on (band, chunk) has guaranteed recall; `bit_count(xor)`
    * verifies the exact distance on candidates only. Same scale shape as
    * the SimHash text path: ONE shuffle keyed on (band, chunk-value),
    * never image × image.
    */
  def phashPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
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
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

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
      twinOffset: Long): DataFrame =
    media.union(
      media.filter(col("kind") === "image")
        .select((col("media_id") + twinOffset).as("media_id"), col("kind"),
          encodePngBrightenedUdf(col("media_id"), lit(delta)).as("bytes")))

  private def kindOf(idCol: Column): Column =
    element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(idCol, lit(3)) + 1).cast("int"))

  /** Deterministic fake media derived from the documents fixture: image
    * rows carry REAL PNG payloads (encoded per doc id), audio/video rows
    * carry the doc's UTF-8 bytes (stand-ins for real blobs).
    */
  def fakeMediaFromDocs(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      kindOf(col("doc_id")).as("kind"),
      when(kindOf(col("doc_id")) === "image", encodePngUdf(col("doc_id")))
        .otherwise(col("text").cast("binary")).as("bytes"))

  /** STUB decoder for audio/video: a real implementation would parse the
    * codec header here (and is the only code that changes when an
    * audio/video lib exists). Deterministic pure function of the payload
    * so tests/oracles can reproduce it.
    */
  private def decodeHeaderStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (64 + n % 577, 64 + (n * 31) % 433, 1 + n % 24)
  }

  /** Decode media metadata with the per-partition-init `mapPartitions`
    * batch shape (decoder/codec context constructed once per partition,
    * not per row). Images decode through the real PNG codec; audio/video
    * through the stub arithmetic.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (e.g. load codec lib);
      // ImageIO registers its reader SPI once per JVM
      rows.map { r =>
        val (w, h, f) = r.kind match {
          case "image" =>
            val (w0, h0) = decodePngDims(r.bytes)
            (w0, h0, 1)
          case "video" =>
            decodeHeaderStub(r.bytes)
          case _ =>
            val (w0, h0, _) = decodeHeaderStub(r.bytes)
            (w0, h0, 1)
        }
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

  /** DataFrame-level metadata decode — used by the oracled query. Image
    * dimensions come from the REAL PNG parse (`ImageIO.read` in a UDF,
    * evaluated only on image rows); audio/video from the stub column
    * arithmetic DuckDB mirrors directly.
    */
  def decodeMetaColumns(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
      .withColumn("png",
        when(col("kind") === "image", decodePngDimsUdf(col("bytes"))))
      .withColumn("width",
        when(col("kind") === "image", col("png._1").cast("long"))
          .otherwise((lit(64) + pmod(col("n_bytes"), lit(577))).cast("long")))
      .withColumn("height",
        when(col("kind") === "image", col("png._2").cast("long"))
          .otherwise((lit(64) + pmod(col("n_bytes") * 31, lit(433))).cast("long")))
      .withColumn("n_frames",
        when(col("kind") === "video", lit(1) + pmod(col("n_bytes"), lit(24)))
          .otherwise(lit(1)).cast("long"))
      .select("media_id", "kind", "n_bytes", "width", "height", "n_frames")
}
