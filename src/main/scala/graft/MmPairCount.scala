package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Dev tool: EXACT true-pair volume for the three mm_*_pairs queries,
  * computed without the banded join — the pair-count denominator for the
  * decade adjudication. The fixture generators produce hashes with LOW
  * value diversity (the r14 python sim measured ~2k distinct dHashes over
  * 167k sf10 images), so true pairs = Σ C(group,2) within equal-hash
  * groups plus Σ cnt_a·cnt_b over DISTINCT value pairs within the hamming
  * bound — the distinct-value space is thousands of rows, so the
  * cross-product runs on values, never on the corpus. Collecting the
  * (value, count) frame is dev-tool-only driver use, guarded by a count.
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sf10 runMain graft.MmPairCount
  */
object MmPairCount {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.table(spark, sfDir, "documents")
    val media = Multimodal.fakeMediaFromDocs(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def adjudicate(tag: String, hashes: DataFrame, maxHamming: Int): Unit = {
      val groups = hashes.groupBy("phash").count()
      val nDistinct = groups.count()
      require(nDistinct < 2000000, s"$tag: $nDistinct distinct values — " +
        "too many to adjudicate on the driver; the corpus is NOT collapsed")
      val vals = groups.collect().map(r => (r.getLong(0), r.getLong(1)))
      val n = vals.map(_._2).sum
      var pairs = vals.map { case (_, c) => c * (c - 1) / 2 }.sum
      var i = 0
      while (i < vals.length) {
        var j = i + 1
        while (j < vals.length) {
          if (java.lang.Long.bitCount(vals(i)._1 ^ vals(j)._1) <= maxHamming)
            pairs += vals(i)._2 * vals(j)._2
          j += 1
        }
        i += 1
      }
      println(s"[mmpaircount] $tag hashes=$n distinct=$nDistinct " +
        s"true_pairs=$pairs")
    }

    val imgTwins = Multimodal.withBrightenedTwins(media, delta = 8,
      twinOffset = Multimodal.twinOffsetFor(media))
    adjudicate("image_h6", Multimodal.imagePhashes(imgTwins), 6)

    val audioBase = media.filter(col("kind") === "audio")
    val audioTwins = Multimodal.withScaledAudioTwins(audioBase, num = 7,
      den = 8, twinOffset = Multimodal.twinOffsetFor(audioBase))
    adjudicate("audio_h6", Multimodal.audioFingerprints(audioTwins), 6)

    val videoBase = media.filter(col("kind") === "video")
    val videoTwins = Multimodal.withScaledVideoTwins(videoBase, num = 7,
      den = 8, twinOffset = Multimodal.twinOffsetFor(videoBase))
    adjudicate("video_h6", Multimodal.videoFingerprints(videoTwins), 6)

    spark.stop()
  }
}
