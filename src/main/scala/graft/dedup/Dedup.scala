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
    // Postings-list pair generation: ONE shuffle of the index (groupBy
    // shingle), then pairs explode narrowly from each posting array —
    // half the shuffle volume of the self-join shape (which moves the
    // index twice), and singleton shingles (which can never produce a
    // pair) die in the size filter instead of riding through a join.
    // A shingle shared by d docs still yields d²/2 pairs either way —
    // that blowup is inherent to exact Jaccard; the posting array just
    // holds the d doc ids (not the pairs) in memory per group.
    val pairs = idx.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds) - i - 1), y ->
          |    named_struct('a_id', x, 'b_id', y))))""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
    val common = pairs.groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    // sizes is one row per doc — tiny next to the pair table; broadcast
    // keeps the two enrichment joins shuffle-free
    common
      .join(broadcast(sizes.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na")), "a_id")
      .join(broadcast(sizes.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb")), "b_id")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  /** Fixed coefficients for the MinHash linear permutations: arbitrary odd
    * multipliers < 2³⁰ and offsets < 2³², so `a·h + b` with a 32-bit `h`
    * stays under 2⁶³ — no overflow in Java longs OR in engines whose
    * BIGINT arithmetic raises on overflow (the DuckDB oracle) instead of
    * wrapping. Public so oracle SQL can be generated from the same values.
    */
  val Perms: IndexedSeq[(Long, Long)] = IndexedSeq(
    (972663749L, 1005101413L), (589317241L, 259122101L),
    (775982237L, 847983251L), (463856993L, 754976947L),
    (646428733L, 185959823L), (854747021L, 362736509L),
    (569352097L, 719240027L), (912338389L, 478562137L),
    (737106461L, 928392013L), (398479853L, 613790467L),
    (820055317L, 294817291L), (507909379L, 881573279L),
    (693582359L, 157399841L), (941276489L, 536098331L),
    (425918047L, 672410393L), (758631229L, 409563119L))

  /** k-wide MinHash signature per doc in a single aggregation.
    *
    * The classic one-hash scheme: md5 the shingle ONCE, take its first
    * 32 bits as `h`, and approximate k independent permutations with k
    * linear transforms `(aᵢ·h + bᵢ) mod 2³²` ([[Perms]]) — k `min`
    * aggregates over cheap integer arithmetic instead of k/4 md5 calls
    * per shingle (md5 dominated the old profile 4:1). Pure integer math
    * on an md5-derived value, so any engine with md5 reproduces the
    * signatures bit-for-bit.
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    require(k <= Perms.length, s"at most ${Perms.length} permutations wired")
    val idx = shingleIndex(docs, idCol, textCol, n)
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long").as("h"))
    def perm(i: Int): Column = {
      val (a, b) = Perms(i)
      (col("h") * a + b) % 4294967296L
    }
    idx.groupBy("doc_id")
      .agg(min(perm(0)).as("mh0"),
        (1 until k).map(i => min(perm(i)).as(s"mh$i")): _*)
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

  /** 32-bit frequency-weighted SimHash per document.
    *
    * ONE aggregation with 32 integer `sum` columns (one per bit), not an
    * explode of tokens × 32 bit-positions: the explode shape pushed a 32×
    * row blowup through two shuffles; here the shuffle carries 32 long
    * partials per doc (map-side combine) and the bit votes stay inside
    * whole-stage codegen. Integer sums are order-independent, so the
    * result is bit-identical to the per-bit formulation.
    */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normalize(col(textCol)))).as("tok"))
      .select(col("doc_id"),
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long").as("h"))
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(col("h"), b) % 2 === 1, 1).otherwise(-1)).as(s"v$b"))
    hashed.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

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
