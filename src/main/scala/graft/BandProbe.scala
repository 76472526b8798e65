package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Dev tool: the banded-pairs operator measured in ISOLATION from the
  * fixture's hash distribution. The r14 sf10 probe showed mm_phash_pairs
  * time tracking OUTPUT (75.6M true pairs at sf10 — the linear-ramp pixel
  * generator collapses 167k images into ~2k distinct dHashes, so pair
  * volume is quadratic BY FIXTURE); this probe instead feeds
  * [[Multimodal.phashPairs]] a uniform synthetic corpus (xxhash64 of the
  * row id — 64 i.i.d. bits) with `n/10` planted twins at hamming ≤ 6, so
  * TRUE output is corpus-linear and any super-linear wall-clock would be
  * the OPERATOR's fault. Run at n and 10n to read the decade slope:
  *
  *   SPARK_GRAFT_N=1000000 SPARK_GRAFT_H=3 runMain graft.BandProbe
  *
  * SPARK_GRAFT_H picks the hamming bound (default 6). The bound sets the
  * capacity the probe must respect — the operator's counted guard FAILS
  * LOUDLY past mean band occupancy 16 (h=6 ⇒ 8 chunks × 8 bits ⇒ 2^16
  * pair keys ⇒ ~1.05M hashes; h=3 ⇒ 5 chunks × 12 bits ⇒ 2^24 pair keys
  * ⇒ ~268M) — so the decade reads are n ∈ {80k, 800k} at h=6 and
  * n ∈ {1M, 10M} at h=3. (The guard firing AT 1M/h=6 is itself evidence:
  * that is precisely the saturation the r13 probe measured as a 20.6×
  * decade before the guard existed.)
  *
  * Prints hashes, candidate volume (the banding's cost driver), verified
  * pairs, and wall-clock for the full pairs job.
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_N", "1000000").toLong
    val h = sys.env.getOrElse("SPARK_GRAFT_H", "6").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // uniform 64-bit hashes; every 10th row gets a twin 3 bits away
    // (flip bits 5, 20, 40 — hamming 3 ≤ every probed bound)
    val base = spark.range(n).select(col("id").as("media_id"),
      xxhash64(col("id")).as("phash"))
    val twins = base.filter(col("media_id") % 10 === 0)
      .select((col("media_id") + n).as("media_id"),
        col("phash").bitwiseXOR(lit((1L << 5) | (1L << 20) | (1L << 40)))
          .as("phash"))
    val hashes = base.unionAll(twins)

    val t0 = System.nanoTime()
    val pairs = Multimodal.phashPairs(hashes, maxHamming = h).count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    val cands = Multimodal.phashCandidatesPairBand(hashes, maxHamming = h)
      .count()
    println(f"[bandprobe] n=$n h=$h hashes=${n + n / 10} candidates=$cands " +
      f"pairs=$pairs pairs_time=$tPairs%.2f s")
    spark.stop()
  }
}
