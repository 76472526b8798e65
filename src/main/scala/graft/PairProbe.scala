package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.dedup.Dedup

/** Dev tool: pair-count-normalized decade adjudication for the
  * pair-emitting dedup/similarity operators (the r13 verdict's ask: a
  * super-linear wall-clock step on a replica fixture is only a scale bug
  * if TIME outgrows CANDIDATES — replica corpora inflate true pair output
  * by construction, so the honest metric is time-per-candidate).
  *
  * `SPARK_GRAFT_SF_DIR=<dir> runMain graft.PairProbe [skipvec]` prints
  * one line per measure: candidate volume, verified pairs, and the
  * postings/explosion sizes that drive each operator's cost. Timings come
  * from BenchOne (same session shape) — this tool reports the COUNTS that
  * normalize them.
  */
object PairProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val skipVec = args.contains("skipvec")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._

    def report(k: String, v: Long): Unit = println(s"[pairprobe] $k=$v")

    val docs = Tables.table(spark, sfDir, "documents")
    // "cheap" (the sf10u leg): report only the closed-form WORK drivers
    // (Σ C(group,2) over postings / band buckets — one groupBy each, no
    // pair row ever materialized); the verified-pair counts come from
    // the single BenchOne SPARK_GRAFT_ROWS=1 run of each query instead
    // of duplicating the full join here.
    val cheap = args.contains("cheap")

    // doc_dedup_contain: cost driver = the postings-list pair explosion
    // Σ_shingle C(df,2); candidates = doc pairs sharing ≥ 1 shingle
    val idx = Dedup.shingleIndex(docs, "doc_id", "text", 3)
      .persist(StorageLevel.MEMORY_AND_DISK)
    report("shingle_postings", idx.count())
    val explosion = idx.groupBy("shingle").count()
      .agg(sum(expr("count * (count - 1) div 2"))).head().getLong(0)
    report("contain_explosion_pairs", explosion)
    if (!cheap) {
      report("contain_candidates",
        Dedup.containmentPairsFromIndex(idx, 0.0).count())
      report("contain_pairs",
        Dedup.containmentPairsFromIndex(idx, 0.9).count())
    }
    idx.unpersist()

    // doc_dedup_simhash_pairs: banded row volume Σ_bk C(cnt,2) is the
    // join's emitted-row count (the work); distinct candidates dedup it
    val bandRows = Dedup.simHashBands(docs, "doc_id", "text", 2)
      .groupBy("bk").count()
      .agg(sum(expr("count * (count - 1) div 2"))).head().getLong(0)
    report("simhash_band_rows", bandRows)
    if (!cheap) {
      report("simhash_candidates",
        Dedup.simHashCandidates(docs, "doc_id", "text", 2).count())
      report("simhash_pairs",
        Dedup.simHashPairs(docs, "doc_id", "text", 2).count())
    }

    // doc_dedup_simhash64_pairs (r15 decade leg): the same Σ_bk C(cnt,2)
    // work driver over the 64-bit chunk-pair banding — the emitted-row
    // count of the candidate join before verify/distinct
    val bandRows64 = Dedup.simHashBands(docs, "doc_id", "text", 2, bits = 64)
      .groupBy("bk").count()
      .agg(sum(expr("count * (count - 1) div 2"))).head().getLong(0)
    report("simhash64_band_rows", bandRows64)

    // vec_near_dup: EXACT all-pairs by declaration — candidates are
    // C(n,2) in closed form; the measure of interest is verified output
    if (!skipVec) {
      val embs = Tables.table(spark, sfDir, "embeddings")
      val n = embs.count()
      report("embeddings_n", n)
      report("vec_allpairs", n * (n - 1) / 2)
      // the exact verify join is the expensive leg — skipped in cheap
      // mode (its verified count comes from BenchOne SPARK_GRAFT_ROWS=1)
      if (!cheap)
        report("vec_near_dup_pairs",
          Dedup.embeddingPairs(embs, "vec_id", "embedding", 0.45).count())

      // vec_near_dup_lsh (r15 decade leg): SRP candidate volume on the
      // planted-clone corpus (same construction as the query's
      // nearDupLshCorpus helper: every even vec_id gets an exact twin at
      // id + 100000) — the collision-term denominator that normalizes
      // the query's wall clock
      val base = embs.select(col("vec_id"), col("embedding"))
      val corpus = base.unionAll(
        base.filter(col("vec_id") % 2 === 0)
          .select((col("vec_id") + lit(100000L)).as("vec_id"),
            col("embedding")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val cn = corpus.count()
      report("lsh_corpus_n", cn)
      val bits = Dedup.srpBitsFor(cn, 8)
      report("lsh_bits", bits.toLong)
      report("lsh_candidates",
        graft.similarity.Similarity.srpCandidates(
          corpus, "vec_id", "embedding", bits, 4, 64, 42L).count())
      corpus.unpersist()
    }
    spark.stop()
  }
}
