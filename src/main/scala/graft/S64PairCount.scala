package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (the MmPairCount pattern for the TEXT 64-bit SimHash): exact
  * TRUE h ≤ 2 pair count from the signature VALUE HISTOGRAM, so the
  * decade adjudication's output denominator never needs the full
  * doc-level pair join (whose count() at sf10u is itself a 10⁹-row job):
  * equal-value pairs are Σ_v C(cnt_v, 2) in closed form; cross-value
  * pairs band the DISTINCT values (≤ |corpus| rows, typically far fewer)
  * with the same 4-chunk/6-chunk-pair keys the operator uses and weight
  * each surviving value pair by cnt_a · cnt_b. Recall of the banding on
  * values is the operator's own guarantee (≥ 2 intact chunks at h ≤ 2).
  *
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.S64PairCount`
  */
object S64PairCount {
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

    def report(k: String, v: Long): Unit = println(s"[s64paircount] $k=$v")

    val docs = Tables.table(spark, sfDir, "documents")
    val hist = graft.dedup.Dedup.simHash64(docs, "doc_id", "text")
      .groupBy("simhash").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    report("distinct_values", hist.count())
    report("equal_value_pairs",
      hist.agg(sum(expr("cnt * (cnt - 1) div 2"))).head().getLong(0))
    // h = 2 → c = 4 chunks of 16 bits, C(4,2) = 6 chunk-pair band keys
    // (the operator's own key construction, re-derived here on DISTINCT
    // values only)
    def chunk(k: Int): Column =
      shiftrightunsigned(col("simhash"), k * 16).bitwiseAND(lit(0xFFFFL))
    val keys = for { i <- 0 until 4; j <- (i + 1) until 4 } yield
      shiftleft(lit((i * 4 + j).toLong), 44)
        .bitwiseOR(shiftleft(chunk(i), 22)).bitwiseOR(chunk(j))
    val banded = hist.select(col("simhash"), col("cnt"),
      explode(array(keys: _*)).as("bk"))
    val cross = banded.as("a").join(banded.as("b"), Seq("bk"))
      .filter(col("a.simhash") < col("b.simhash"))
      .filter(bit_count(expr("a.simhash ^ b.simhash")) <= 2)
      .select(col("a.simhash").as("va"), col("b.simhash").as("vb"),
        (col("a.cnt") * col("b.cnt")).as("w"))
      .distinct()
    report("cross_value_pairs", cross.agg(coalesce(sum("w"), lit(0L)))
      .head().getLong(0))
    spark.stop()
  }
}
