package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_similarity
import graft.text.TextFunctions

/** Document deduplication operators for training-data pipelines, each in
  * its 100 TB-shaped form:
  *
  *  - [[exactDedup]]       — hash-groupBy on a content fingerprint: one
  *    shuffle on the hash, output one representative per group.
  *  - [[jaccardPairs]]     — shingle-inverted-index self-join: explode
  *    distinct shingles, shuffle on the *shingle* (never doc×doc), count
  *    common shingles per pair, exact Jaccard. The classic
  *    "index-then-verify" shape; at scale, hot shingles are the skew risk
  *    (AQE skew-join splits them; [[minHashCandidates]] is the cheaper
  *    path when pair verification is too expensive).
  *  - [[minHashSignatures]] / [[minHashCandidates]] — MinHash + LSH
  *    banding: k independent permutations approximated by salted hashes,
  *    signatures reduced in ONE aggregation over the exploded shingles
  *    (k `min` aggregates — no k-fold data blowup), then pairs that share
  *    a band bucket. Candidate generation cost is linear in docs × bands.
  *  - [[simHash]]          — 32-bit SimHash per doc: token-hash bit votes,
  *    one aggregation, constant state per doc; near-dup = small Hamming
  *    distance ([[simHashPairs]]).
  *  - [[embeddingPairs]]   — cosine near-dup over embedding vectors
  *    (brute-force verify form; candidate pruning at scale comes from
  *    [[graft.similarity.Similarity]]'s IVF routing).
  *
  * All hashes are md5-derived so independent engines (the DuckDB oracle)
  * can reproduce them exactly.
  */
object Dedup {

  /** One representative (min id) per exact-content group. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exploded (id, shingle) inverted index over distinct word n-grams.
    *
    * The input is repartitioned to the cluster's parallelism first:
    * shingling is CPU-heavy narrow work (regex normalize + n-gram build
    * per row), and a corpus that arrives as few/small files would
    * otherwise run it on a handful of tasks regardless of core count —
    * measured 4× on 32 local cores. The pre-shuffle moves only the raw
    * doc rows, far smaller than the exploded index it unlocks.
    */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(
        col(idCol).as("doc_id"),
        explode(TextFunctions.shingles(
          TextFunctions.tokens(TextFunctions.normalize(col(textCol))), n)).as("shingle"))

  /** Exact n-gram Jaccard similarity for every pair above `minJaccard`.
    *
    * The shingle index backs three subtrees (sizes + both join sides), so
    * it is cached — measured 6× faster than recomputing it per subtree.
    * The pin is MEMORY_AND_DISK and LRU-evictable, but a returned-lazy
    * frame has no safe unpersist point, so each call leaves one pinned
    * plan behind — long-lived sessions making many calls should pass
    * `cacheIndex = false` (recompute per subtree) or materialize the
    * index themselves (`shingleIndex(...).write.parquet`) and join
    * manually; at 100 TB that one-time materialization is the right
    * shape anyway.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, cacheIndex: Boolean = true): DataFrame = {
    val idx0 = shingleIndex(docs, idCol, textCol, n)
    val idx =
      if (cacheIndex)
        idx0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else idx0
    val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val common = idx.as("a").join(idx.as("b"), Seq("shingle"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
      .join(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  /** k-wide MinHash signature per doc in a single aggregation.
    *
    * Permutation `i` = lexicographic-min of an 8-hex-char LANE of a salted
    * md5: one md5 yields 4 independent uniform lanes (32 hex chars / 8),
    * so k permutations cost k/4 md5 calls per shingle. The salted md5s
    * are materialized in a projection BEFORE the aggregation — aggregate
    * expressions don't share subexpressions, so `min(substr(md5(...)))`
    * k times would recompute every md5 k/4 times. String min over a
    * uniform hex lane ≡ min over a uniform hash of the shingle universe,
    * reproducible in any engine with md5.
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val nSalts = (k + 3) / 4
    val idx = shingleIndex(docs, idCol, textCol, n)
      .select(col("doc_id") +:
        (0 until nSalts).map(s =>
          md5(concat(lit(s"$s:"), col("shingle"))).as(s"h$s")): _*)
    val lane = (i: Int) => substring(col(s"h${i / 4}"), (i % 4) * 8 + 1, 8)
    idx.groupBy("doc_id")
      .agg(min(lane(0)).as("mh0"),
        (1 until k).map(i => min(lane(i)).as(s"mh$i")): _*)
  }

  /** LSH banding: docs sharing any band bucket are candidate pairs.
    * `k` signatures split into `bands` bands of `k/bands` rows each.
    */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rows = k / bands
    val sigs = minHashSignatures(docs, idCol, textCol, n, k)
    val bandKey = (b: Int) =>
      struct(lit(b).as("band"),
        md5(concat_ws("|", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)).as("bkey"))
    val buckets = sigs.select(col("doc_id"),
      explode(array((0 until bands).map(bandKey): _*)).as("bk"))
    buckets.as("a").join(buckets.as("b"), Seq("bk"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
  }

  /** 32-bit frequency-weighted SimHash per document. */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normalize(col(textCol)))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
      .select(col("doc_id"), col("h"), explode(sequence(lit(0), lit(31))).as("b"))
      .withColumn("vote",
        when(expr("(h >> b) % 2") === 1, lit(1)).otherwise(lit(-1)))
      .groupBy("doc_id", "b")
      .agg(sum("vote").as("votes"))
      .withColumn("bit", when(col("votes") > 0, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(expr("bit << b")).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`. */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sh = simHash(docs, idCol, textCol)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming", bit_count(expr("a.simhash ^ b.simhash")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs above `minCos` (brute-force verify).
    * The streamed side is repartitioned so the O(n²) cosine loop spreads
    * over all cores even when the corpus arrives as one small file.
    */
  def embeddingPairs(embs: DataFrame, idCol: String, vecCol: String,
      minCos: Double): DataFrame =
    embs.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
      .repartition(embs.sparkSession.sparkContext.defaultParallelism)
      .join(embs.select(col(idCol).as("b_id"), col(vecCol).as("b_vec")),
        col("a_id") < col("b_id"))
      .withColumn("cos", cosine_similarity(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= minCos)
      .select("a_id", "b_id", "cos")
}
