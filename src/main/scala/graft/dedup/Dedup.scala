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
    * The shingle index backs three subtrees (sizes + both join sides);
    * `cacheIndex = true` pins it MEMORY_AND_DISK (measured 6× faster than
    * recomputing per subtree) — but a returned-lazy frame has no safe
    * unpersist point, so each cached call leaves one pinned plan behind.
    * The default is therefore the leak-free recompute path; callers that
    * want the cached speed without the leak should use
    * [[withShingleIndex]] (scoped pin, released on exit) or
    * [[writeShingleIndex]] (one-time materialization — the right shape at
    * 100 TB anyway).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minJaccard: Double, cacheIndex: Boolean = false,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val idx0 = shingleIndex(docs, idCol, textCol, n)
    val idx =
      if (cacheIndex)
        idx0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else idx0
    jaccardPairsFromIndex(idx, minJaccard, maxShingleDf)
  }

  /** Loan-pattern shingle index: pins the index for the duration of `f`
    * and releases the pin on exit — the non-leaking way to run several
    * pair-generation passes (different thresholds, pairs + clusters) over
    * one build of the index. `f` MUST consume its result (collect/write)
    * before returning: the pin is gone once this returns, so a lazy frame
    * escaping `f` silently recomputes the index per subtree.
    */
  def withShingleIndex[A](docs: DataFrame, idCol: String, textCol: String,
      n: Int)(f: DataFrame => A): A = {
    val idx = shingleIndex(docs, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try f(idx)
    finally { idx.unpersist(blocking = false); () }
  }

  /** Materialize the shingle index once (partitioned by shingle hash so
    * downstream pair generation reads pre-bucketed data), for the
    * long-lived-session / 100 TB shape: build once, run many
    * [[jaccardPairsFromIndex]] passes at different thresholds without a
    * cache pin or recompute. Pair with
    * `spark.read.parquet(path)` → [[jaccardPairsFromIndex]].
    */
  def writeShingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int, path: String, buckets: Int = 64): DataFrame = {
    shingleIndex(docs, idCol, textCol, n)
      .withColumn("shingle_bucket", pmod(xxhash64(col("shingle")), lit(buckets)))
      .write.partitionBy("shingle_bucket").mode("overwrite").parquet(path)
    docs.sparkSession.read.parquet(path)
  }

  /** Enrich a pair frame with per-doc sizes on BOTH sides. `sizes` is
    * corpus-derived (one row per doc), so the broadcast is gated on one
    * counted `limit(cap+1)` probe shared by the two joins — broadcast
    * within the cap, identical shuffled equi-joins beyond it — the
    * probe-then-branch is [[graft.queries.VocabGuard.fitsWithinCap]],
    * the checkpoint-FREE half of the guardedJoin discipline: this
    * helper's callers run inside [[withShingleIndex]]'s pin/release
    * scope contract (spec-pinned: NO pin created in the scope may
    * survive it), and a localCheckpoint's blocks linger until GC, so
    * the sizes frame stays an ordinary lazy plan. The recompute cost is
    * bounded by the caller: the probe and both joins re-derive `sizes`
    * from the (typically pinned) index — one cheap per-doc count
    * aggregate per subtree. NOTE the probe is an eager Spark action at
    * DataFrame-construction time.
    */
  private def sizeEnrichedJoins(pairsFrame: DataFrame, sizes: DataFrame,
      cap: Long): DataFrame = {
    val fits = graft.queries.VocabGuard.fitsWithinCap(sizes, cap)
    def enrich(f: DataFrame, side: String, as: String): DataFrame = {
      val dim = sizes.withColumnRenamed("doc_id", side).withColumnRenamed("n_sh", as)
      if (fits) f.join(broadcast(dim), side) else f.join(dim, side)
    }
    enrich(enrich(pairsFrame, "a_id", "na"), "b_id", "nb")
  }

  /** Exact Jaccard pairs from a prebuilt (doc_id, shingle) index — the
    * primary pair-generation engine behind [[jaccardPairs]].
    *
    * Postings-list shape: ONE shuffle of the index (groupBy shingle),
    * then pairs explode narrowly from each posting array — half the
    * shuffle volume of the self-join shape (which moves the index twice),
    * and singleton shingles (which can never produce a pair) die in the
    * size filter instead of riding through a join.
    *
    * `maxShingleDf` is the stop-shingle cap: a shingle appearing in d
    * docs yields d²/2 pairs, so one web-scale stop-shingle ("in the of")
    * explodes quadratically. Dropping postings longer than the cap before
    * pair generation bounds every posting's fan-out at cap²/2.
    * RECALL TRADEOFF: a pair whose every common shingle is capped is
    * lost, and a pair that keeps some common shingles still counts the
    * capped ones in the union (sizes are computed pre-cap), so its
    * Jaccard is UNDERestimated — the cap trades bounded work for
    * one-sided (never inflated) similarity. Near-dup pairs share many
    * low-df shingles, so a generous cap (≫ typical duplication factor,
    * ≪ corpus size) loses nothing in practice.
    */
  def jaccardPairsFromIndex(idx: DataFrame, minJaccard: Double,
      maxShingleDf: Int = Int.MaxValue,
      sizesCap: Long = graft.queries.VocabGuard.MaxBroadcastEntries): DataFrame = {
    val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = idx.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxShingleDf)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds) - i - 1), y ->
          |    named_struct('a_id', x, 'b_id', y))))""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
    val common = pairs.groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    // sizes is one row per DOC — corpus-derived, so an unconditional
    // broadcast() is the same web-scale driver-OOM class VocabGuard
    // closed for the vocabulary joins: counted broadcast within the cap,
    // identical shuffled equi-join beyond it. One limit-probe covers both
    // enrichment joins (VocabGuard.fitsWithinCap — the checkpoint-free
    // branch; see sizeEnrichedJoins for why no checkpoint here).
    sizeEnrichedJoins(common, sizes, sizesCap)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  /** Candidate common-shingle counts `(a_id, b_id, c)` between a STANDING
    * index (`oldIdx`) and an increment (`newIdx`), both `(doc_id,
    * shingle)` — the join at the heart of incremental dedup: never pairs
    * the corpus with itself, cost bounded by the increment.
    *
    * The increment's postings BROADCAST only while the increment is
    * genuinely increment-sized: its postings are COUNTED (cheap — the
    * caller's index is persisted) and must not exceed
    * `maxBroadcastPostings`. Above the bound — a backfill day, a bulk
    * import, anything no longer ≪ corpus — the join falls back to a
    * shuffled equi-join on `shingle`: identical rows, one extra exchange,
    * instead of an executor-memory blow-up. The default bound of 4M
    * postings (~56 B each ≈ 220 MB deserialized) sits well inside
    * Spark's 8 GB broadcast hard cap and a shared-executor heap slice,
    * mirroring [[graft.operators.BloomPrune]]'s documented
    * literal-vs-subquery size split.
    */
  def incrementalCandidates(oldIdx: DataFrame, newIdx: DataFrame,
      maxBroadcastPostings: Long = 4000000L,
      knownPostings: Option[Long] = None): DataFrame = {
    val a = oldIdx.withColumnRenamed("doc_id", "a_id")
    val b0 = newIdx.withColumnRenamed("doc_id", "b_id")
    // callers that already track the increment's postings count (a
    // pipeline knows its batch size; the query layer memoizes it per
    // fixture) pass it via knownPostings and skip the count job
    val n = knownPostings.getOrElse(b0.count())
    val b = if (n <= maxBroadcastPostings) broadcast(b0) else b0
    a.join(b, "shingle").groupBy("a_id", "b_id").agg(count(lit(1)).as("c"))
  }

  /** CONTAINMENT near-dup on a prebuilt shingle index: pairs where the
    * smaller doc's shingle set sits ≥ `minContainment` inside the
    * other's — catches doc-inside-doc duplication (boilerplate wrapping,
    * partial scrapes, quote farms) that symmetric Jaccard structurally
    * misses: a 100-shingle doc embedded in a 10 000-shingle doc has
    * Jaccard ≈ 0.01 but containment 1.0. Identical scale shape to
    * [[jaccardPairsFromIndex]] (one postings-list shuffle, counted
    * broadcast-or-shuffle size enrichment); only the final ratio differs.
    */
  def containmentPairsFromIndex(idx: DataFrame, minContainment: Double,
      maxShingleDf: Int = Int.MaxValue,
      sizesCap: Long = graft.queries.VocabGuard.MaxBroadcastEntries): DataFrame = {
    val sizes = idx.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = idx.groupBy("shingle")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1 && size(col("ds")) <= maxShingleDf)
      .select(explode(expr(
        """flatten(transform(ds, (x, i) ->
          |  transform(slice(ds, i + 2, size(ds) - i - 1), y ->
          |    named_struct('a_id', x, 'b_id', y))))""".stripMargin)).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
    val common = pairs.groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    // per-doc sizes are corpus-derived: counted broadcast-or-shuffle
    // (the VocabGuard discipline), never an unconditional broadcast
    sizeEnrichedJoins(common, sizes, sizesCap)
      .withColumn("containment",
        col("n_common").cast("double") / least(col("na"), col("nb")).cast("double"))
      .filter(col("containment") >= minContainment)
      .select("a_id", "b_id", "containment")
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
      n: Int, k: Int): DataFrame =
    minHashSignaturesFromIndex(shingleIndex(docs, idCol, textCol, n), k)

  /** [[minHashSignatures]] over a prebuilt (doc_id, shingle) index —
    * composes with a cached/materialized [[shingleIndex]] so several
    * sketch consumers share one index build.
    */
  def minHashSignaturesFromIndex(idx: DataFrame, k: Int): DataFrame = {
    require(k <= Perms.length, s"at most ${Perms.length} permutations wired")
    val hashed = idx
      .select(col("doc_id"),
        conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long").as("h"))
    def perm(i: Int): Column = {
      val (a, b) = Perms(i)
      (col("h") * a + b) % 4294967296L
    }
    hashed.groupBy("doc_id")
      .agg(min(perm(0)).as("mh0"),
        (1 until k).map(i => min(perm(i)).as(s"mh$i")): _*)
  }

  /** LSH banding: docs sharing any band bucket are candidate pairs.
    * `k` signatures split into `bands` bands of `k/bands` rows each.
    */
  def minHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int): DataFrame =
    minHashCandidatesFromSignatures(
      minHashSignatures(docs, idCol, textCol, n, k), k, bands)

  /** The banding half of [[minHashCandidates]], on a prebuilt signature
    * table (doc_id, mh0..mh{k-1}).
    */
  def minHashCandidatesFromSignatures(sigs: DataFrame, k: Int,
      bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into equal bands")
    val rows = k / bands
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

  /** Sketch-based Jaccard ESTIMATION for LSH candidate pairs: the
    * fraction of agreeing MinHash lanes is an unbiased estimator of the
    * true Jaccard (each lane agrees with probability J), with stderr
    * √(J(1−J)/k). At 100 TB this replaces the exact intersect/union
    * verify — per-pair work is O(k) on two k-long signatures that
    * already exist, no posting lists touched. Returns
    * (a_id, b_id, jaccard_est ∈ {0, 1/k, …, 1}).
    */
  def minHashJaccardEstimate(sigs: DataFrame, k: Int, bands: Int): DataFrame = {
    val cands = minHashCandidatesFromSignatures(sigs, k, bands)
    def side(p: String): DataFrame =
      sigs.toDF(sigs.columns.map(c =>
        if (c == "doc_id") s"${p}_id" else s"${p}_$c"): _*)
    val agree = (0 until k)
      .map(i => when(col(s"a_mh$i") === col(s"b_mh$i"), 1).otherwise(0))
      .reduce(_ + _)
    cands.join(side("a"), "a_id").join(side("b"), "b_id")
      .select(col("a_id"), col("b_id"),
        (agree.cast("double") / k).as("jaccard_est"))
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

  /** 64-bit frequency-weighted SimHash — [[simHash]] carried to the
    * signature width web-scale banding needs: the ≥2-shared-chunks
    * chunk-pair key space is 2^(2·bits/c), so a 32-bit signature at
    * h = 2 caps the banded self-join at ~1M docs (16 × 2^16 mean-
    * occupancy capacity) while 64 bits lift the same bound to
    * 16 × 2^32 ≈ 68 BILLION — the difference between a fixture and a
    * web corpus. Same one-aggregation shape (64 integer vote sums, map-
    * side combined, order-independent); the token hash takes BOTH 32-bit
    * halves of the same md5 the 32-bit path reads its first half from,
    * so the low 32 bits of this signature EQUAL [[simHash]]'s output
    * (spec-pinned) and the two operators can never drift. The bits
    * assemble with bitwiseOR (disjoint powers of two — bit 63 would
    * overflow an ANSI sum).
    */
  def simHash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(TextFunctions.normalize(col(textCol))))
          .as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("m"))
      .select(col("doc_id"),
        conv(substring(col("m"), 1, 8), 16, 10).cast("long").as("hlo"),
        conv(substring(col("m"), 9, 8), 16, 10).cast("long").as("hhi"))
    val votes = (0 until 64).map { b =>
      val h = if (b < 32) col("hlo") else col("hhi")
      sum(when(shiftright(h, b % 32) % 2 === 1, 1).otherwise(-1)).as(s"v$b")
    }
    hashed.groupBy("doc_id")
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("simhash"))
  }

  /** The C(c,2) chunk-pair band keys of a `bits`-wide `simhash` column —
    * the ≥2-SHARED-CHUNKS combinatorial banding (the r14 move, shared
    * with the 64-bit perceptual-hash path): c = maxHamming + 2 chunks,
    * band key = one of the C(c,2) CHUNK PAIRS. A pair within the bound
    * disturbs ≤ maxHamming chunks, so ≥ 2 survive intact and at least
    * one chunk-pair key matches — same guaranteed recall as the classic
    * one-shared split, with the per-band key space SQUARED: at the
    * standing 32-bit h = 2 that is 4 × 8-bit chunks → 2^16 keys instead
    * of the 3 × ~11-bit chunks (2^10.7) the r13 decade probe measured
    * saturating; at 64-bit h = 2 it is 2^32. Chunk boundaries are
    * k·bits/c, so all bits are covered at any c. The key bit-packs into
    * ONE long (pairIdx << 44 | chunk_i << 22 | chunk_j — chunk width
    * ≤ 22 enforced, pairIdx < 33² < 2^11, total < 2^55) — a single long
    * shuffles cheaper than a 4-column key. `shiftrightunsigned` so a
    * set 64-bit sign bit cannot smear into the extracted chunk.
    */
  private def chunkPairKeys(c: Int, bits: Int): IndexedSeq[Column] = {
    require(bits == 32 || bits == 64, "simhash width is 32 or 64")
    require(bits / c + 1 <= 22,
      s"chunk width ${bits / c + 1} exceeds the 22-bit key pack at c=$c")
    def chunk(k: Int): Column = {
      val lo = k * bits / c
      val width = (k + 1) * bits / c - lo
      shiftrightunsigned(col("simhash"), lo).bitwiseAND(lit((1L << width) - 1))
    }
    for { i <- 0 until c; j <- (i + 1) until c } yield
      shiftleft(lit((i * c + j).toLong), 44)
        .bitwiseOR(shiftleft(chunk(i), 22)).bitwiseOR(chunk(j))
  }

  /** The banded (doc_id, simhash, bk) rows behind [[simHashPairs]],
    * exposed so skew can be inspected/tested without re-deriving the
    * chunk arithmetic.
    */
  private[graft] def simHashBands(docs: DataFrame, idCol: String,
      textCol: String, maxHamming: Int, bits: Int = 32): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 31,
      "need 0 <= maxHamming < 31 for >=2-shared chunk-pair bands")
    val sigs =
      if (bits == 64) simHash64(docs, idCol, textCol)
      else simHash(docs, idCol, textCol)
    bandSigs(sigs, maxHamming, bits)
  }

  private def bandSigs(sigs: DataFrame, maxHamming: Int, bits: Int): DataFrame =
    sigs.select(col("doc_id"), col("simhash"),
      explode(array(chunkPairKeys(maxHamming + 2, bits): _*)).as("bk"))

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, via
    * ≥2-shared-chunks pigeonhole banding ([[simHashBands]]) — NOT an
    * all-pairs join: the equi-join on the chunk-pair band key has
    * **guaranteed total recall** (exact, not approximate — see the
    * banding scaladoc), survivors are Hamming-verified with one
    * XOR+popcount, and the ≤-bound filter runs BEFORE the pair-level
    * dedup so the distinct shuffles only true pairs. At 100 TB the
    * shuffle carries C(maxHamming+2, 2) longs per doc.
    *
    * Skew: a chunk-pair key shared by d docs concentrates d²/2 candidate
    * comparisons on one reducer (boilerplate/templated corpora make hot
    * keys real). AQE's skew-join split is the first line of defense;
    * `saltBuckets = S > 1` is the guaranteed bound: the left side salts
    * each row into one of S sub-keys by doc-id hash, the right side
    * replicates each row to all S sub-keys, so every unordered pair still
    * meets exactly once (at the left doc's salt) while each reducer does
    * ~1/S of the hot key's comparisons. Cost: S× replication of the
    * (doc_id, simhash, bk) band rows — cheap, they are three longs wide.
    *
    * Capacity: the 32-bit key space caps this path at ~16 · 2^(2·⌊32/c⌋)
    * docs (≈ 1 M at h = 2); a counted probe REFUSES loudly past that —
    * the web-scale configuration is [[simHashPairs64]].
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, saltBuckets: Int = 1): DataFrame =
    simHashRawCandidates(docs, idCol, textCol, maxHamming, saltBuckets)
      .filter(col("hamming") <= maxHamming)
      .distinct()

  /** The banding join's DISTINCT candidates with their exact hamming,
    * before the ≤ maxHamming verdict — the probe/eval surface (what does
    * the banding scheme COST in candidate volume at this corpus?); the
    * serving path is [[simHashPairs]], which verifies before the
    * pair-level distinct.
    */
  def simHashCandidates(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, saltBuckets: Int = 1): DataFrame =
    simHashRawCandidates(docs, idCol, textCol, maxHamming, saltBuckets)
      .distinct()

  private def simHashRawCandidates(docs: DataFrame, idCol: String,
      textCol: String, maxHamming: Int, saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    // Counted capacity guard (the simHashPairs64/phashPairs convention,
    // ported here in r15 — this was the one banded-pairs member that
    // could still go quadratic SILENTLY): the 32-bit chunk-pair key
    // space is 2^(2·⌊32/c⌋) values (2^16 at h = 2 → capacity
    // 16 · 2^16 ≈ 1 M docs at mean band occupancy
    // [[graft.multimodal.Multimodal.MaxBandOccupancy]]); past it the
    // equi-join's collision term dominates and the job must REFUSE with
    // the remediation dials, not degrade. The signature frame is lazily
    // checkpointed so the probe and both join sides share ONE
    // materialization of the 64-vote aggregation.
    val sigs = simHash(docs, idCol, textCol).localCheckpoint(eager = false)
    val cap = simHashCapacity(maxHamming, bits = 32)
    val n = sigs.limit((cap min (Int.MaxValue - 1).toLong).toInt + 1).count()
    if (n > cap) throw new IllegalStateException(
      s"simHashPairs: $n signatures exceed the banding capacity $cap at " +
        s"maxHamming=$maxHamming (mean band-bucket occupancy > " +
        s"${graft.multimodal.Multimodal.MaxBandOccupancy} — the candidate " +
        "join would go quadratic). Lower the hamming bound (more key bits " +
        "per band), switch to simHashPairs64 (2^32-value bands at h=2, " +
        "capacity ~68 billion docs), or shard the corpus.")
    val banded = bandSigs(sigs, maxHamming, bits = 32)
    val (aSide, bSide, keys) =
      if (saltBuckets == 1) (banded, banded, Seq("bk"))
      else (
        banded.withColumn("salt",
          pmod(xxhash64(col("doc_id")), lit(saltBuckets)).cast("int")),
        banded.withColumn("salt",
          explode(sequence(lit(0), lit(saltBuckets - 1)))),
        Seq("bk", "salt"))
    aSide.as("a").join(bSide.as("b"), keys)
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(expr("a.simhash ^ b.simhash")).as("hamming"))
  }

  /** 64-bit SimHash near-dup pairs with the LOUD capacity guard — the
    * web-scale serving configuration of the banded family: chunk-pair
    * keys over a [[simHash64]] signature give a 2^(2·64/c)-value key
    * space (2^32 at h = 2 vs the 32-bit path's 2^16 — theoretical
    * capacity 16 × 2^32 ≈ 68 BILLION docs at mean band occupancy
    * [[graft.multimodal.Multimodal.MaxBandOccupancy]]; the counted
    * probe saturates at ~2^31, where occupancy over 2^32 keys is still
    * < 1 — the same int-limit convention as the phash guard), and like
    * [[graft.multimodal.Multimodal.phashPairs]] the corpus is counted
    * against that capacity via one `limit(cap+1)` probe over the lazily
    * checkpointed signature frame (which the self-join then reuses, so
    * the 64-vote aggregation runs ONCE, not once per join side) and the
    * job fails with the remediation dials spelled out instead of
    * silently going quadratic. Verify-before-distinct: the ≤-bound
    * filter runs before the pair-level dedup so the distinct shuffles
    * only true pairs. Same salt dial as [[simHashPairs]].
    */
  def simHashPairs64(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, saltBuckets: Int = 1): DataFrame = {
    require(saltBuckets >= 1, "saltBuckets must be >= 1")
    val sigs = simHash64(docs, idCol, textCol).localCheckpoint(eager = false)
    val cap = simHashCapacity(maxHamming, bits = 64)
    val n = sigs.limit((cap min (Int.MaxValue - 1).toLong).toInt + 1).count()
    if (n > cap) throw new IllegalStateException(
      s"simHashPairs64: $n signatures exceed the banding capacity $cap at " +
        s"maxHamming=$maxHamming (mean band-bucket occupancy > " +
        s"${graft.multimodal.Multimodal.MaxBandOccupancy} — the candidate " +
        "join would go quadratic). Lower the hamming bound (more key bits " +
        "per band) or shard the corpus.")
    val banded = bandSigs(sigs, maxHamming, bits = 64)
    val (aSide, bSide, keys) =
      if (saltBuckets == 1) (banded, banded, Seq("bk"))
      else (
        banded.withColumn("salt",
          pmod(xxhash64(col("doc_id")), lit(saltBuckets)).cast("int")),
        banded.withColumn("salt",
          explode(sequence(lit(0), lit(saltBuckets - 1)))),
        Seq("bk", "salt"))
    aSide.as("a").join(bSide.as("b"), keys)
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        bit_count(expr("a.simhash ^ b.simhash")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[simHashPairs64]]'s counted capacity: signature count beyond which
    * mean band-bucket occupancy at `maxHamming` passes the shared
    * [[graft.multimodal.Multimodal.MaxBandOccupancy]] bound. Key bits =
    * 2 · floor(bits/c) (two chunks form the band key; the floor is the
    * conservative narrow-chunk width).
    */
  def simHashCapacity(maxHamming: Int, bits: Int): Long = {
    require(maxHamming >= 0 && maxHamming < 31, "maxHamming in [0, 31)")
    val keyBits = 2 * (bits / (maxHamming + 2))
    if (keyBits >= 31) (Int.MaxValue - 1).toLong
    else (graft.multimodal.Multimodal.MaxBandOccupancy << keyBits)
      .min((Int.MaxValue - 1).toLong)
  }

  /** Exact embedding-cosine near-dup pairs above `minCos`, as a
    * **packed blocked triangle join** — every pair is compared exactly
    * once, with data movement O(n·B) instead of O(n²): rows hash into one
    * of `blocks` buckets by id, each bucket PACKS into a single
    * (blk, rows[]) row, and the B(B+1)/2 bucket-PAIRS equi-join; a
    * per-partition double loop over the two packed arrays then emits only
    * the qualifying pairs. The naive row-level formulation materializes
    * n²/2 join rows each carrying BOTH vectors (~100 GB of intermediate
    * at 20 k × dim-64 — measured 110 s); packing ships each bucket's
    * vectors (B+1)/2 times total and deserializes them once per bucket
    * pair, leaving the inherent n²/2 cosines as pure primitive-array
    * arithmetic (measured 20×+ faster). Per-task memory = two buckets ≈
    * 2·(n/B)·dim floats — choose `blocks` so a bucket fits comfortably;
    * at 100 TB that is the same `blocks ≈ n/√(pairs-per-task budget)`
    * dial as before.
    *
    * The cosine accumulates dot/norms SEQUENTIALLY IN FLOAT32 and widens
    * to double only for the final sqrt/divide — bit-identical to the
    * [[cosine_similarity]] codegen expression and the DuckDB oracle's
    * `list_dot_product` (proven by the brute-force parity test and the
    * `vec_near_dup` hash-match).
    *
    * Why not LSH here: an exact result at a MODERATE threshold
    * (cos ≈ 0.5 ⇒ ~0.65 per-bit collision) needs so many tables that
    * candidate volume exceeds n²/2 — see
    * [[graft.similarity.Similarity.srpCandidates]]'s regime note. For
    * true near-dup thresholds use [[embeddingPairsViaCandidates]].
    */
  def embeddingPairs(embs: DataFrame, idCol: String, vecCol: String,
      minCos: Double, blocks: Int = 8): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val packed = embs
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        pmod(xxhash64(col(idCol)), lit(blocks)).cast("int").as("blk"))
      .groupBy("blk")
      .agg(collect_list(struct(col("id").as("_1"), col("vec").as("_2"))).as("rows"))
    val aSide = packed.select(col("blk").as("bi"), col("rows").as("a_rows"))
      .withColumn("bj", explode(sequence(col("bi"), lit(blocks - 1))))
    val bSide = packed.select(col("blk").as("bj"), col("rows").as("b_rows"))
    aSide.join(bSide, Seq("bj"))
      .select(col("bi").as("_1"), col("bj").as("_2"),
        col("a_rows").as("_3"), col("b_rows").as("_4"))
      .as[(Int, Int, Seq[(Long, Seq[Float])], Seq[(Long, Seq[Float])])]
      .flatMap { case (bi, bj, aRows, bRows) =>
        val as = aRows.iterator.map { case (i, v) => (i, v.toArray) }.toArray
        val bs = if (bi == bj) as
          else bRows.iterator.map { case (i, v) => (i, v.toArray) }.toArray
        def cosOf(x: Array[Float], y: Array[Float]): Double = {
          var dot = 0.0f; var nx = 0.0f; var ny = 0.0f
          var i = 0
          while (i < x.length) {
            dot += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
          }
          dot.toDouble / (math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble))
        }
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
        var i = 0
        while (i < as.length) {
          // diagonal bucket: each unordered pair once (j > i); cross
          // bucket: full product, ids normalized on emit
          var j = if (bi == bj) i + 1 else 0
          while (j < bs.length) {
            val c = cosOf(as(i)._2, bs(j)._2)
            if (c >= minCos) {
              val (ia, ib) = (as(i)._1, bs(j)._1)
              out += ((math.min(ia, ib), math.max(ia, ib), c))
            }
            j += 1
          }
          i += 1
        }
        out
      }
      .toDF("a_id", "b_id", "cos")
  }

  /** Duplicate-cluster formation: connected components of the undirected
    * near-dup pair graph, labeled by each component's minimum doc id —
    * the step that turns pairwise [[jaccardPairs]]/[[simHashPairs]]/
    * [[embeddingPairs]] output into "keep one representative per
    * cluster". Iterative min-label propagation: each round every node
    * takes the min of its own and its neighbors' labels — converges in
    * O(graph diameter) rounds (near-dup graphs are shallow: dup clusters
    * are cliques or short chains). Each round is one shuffle-join + one
    * aggregation on the edge list; per-round checkpointing truncates the
    * plan lineage so iteration count doesn't grow the DAG. The per-round
    * driver convergence check reads ONE boolean (empty/non-empty), not
    * data. Output: (doc_id, cluster_id) for every doc appearing in a
    * pair; a doc in no pair is its own cluster by definition (callers
    * left-join and coalesce to itself).
    *
    * Fault tolerance: when the session has a checkpoint directory set
    * (`sc.setCheckpointDir`, pointing at reliable storage — HDFS/S3 on a
    * cluster), each round uses RELIABLE `checkpoint()`: an executor loss
    * mid-iteration recovers from storage. Without one it falls back to
    * `localCheckpoint()` (executor-local blocks — fine for local mode,
    * unrecoverable on executor loss because lineage is truncated), which
    * is the only option anyway. Checkpoint files accumulate one small
    * (id,label) table per round; `spark.cleaner.referenceTracking
    * .cleanCheckpoints=true` reclaims them as rounds are GC'd.
    *
    * Convergence: a component whose diameter exceeds `maxIter` would get
    * truncated (wrong) labels — that is never returned silently. With
    * `requireConvergence` (default) the method throws; disabling it logs
    * a warning and returns the partial labels for callers that prefer
    * approximate clusters over failure.
    */
  def duplicateClusters(pairs: DataFrame, aCol: String = "a_id",
      bCol: String = "b_id", maxIter: Int = 25,
      requireConvergence: Boolean = true): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val reliable = sc.getCheckpointDir.isDefined
    def truncateLineage(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val edges = truncateLineage(
      pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct())
    // fold round 1 into the init: label = min(self, direct neighbors) —
    // one aggregation instead of a full join+update+convergence round
    var labels = truncateLineage(
      edges.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src").as("id"), least(col("src"), col("mn")).as("label")))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy("src").agg(min("label").as("nlabel"))
        .withColumnRenamed("src", "id")
      // carry a per-row `changed` flag through the SAME pass, so the
      // convergence check is a filter over the materialized checkpoint,
      // not another shuffle join against the previous labels
      val updated = truncateLineage(
        labels
          .join(neighborMin, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"),
            (coalesce(col("nlabel"), col("label")) < col("label")).as("changed")))
      converged = updated.filter(col("changed")).isEmpty
      labels = updated.select("id", "label")
      i += 1
    }
    if (!converged) {
      val msg = s"duplicateClusters did not converge within maxIter=$maxIter " +
        "rounds: some component's diameter exceeds the round budget and its " +
        "labels are still split across sub-clusters"
      if (requireConvergence) throw new IllegalStateException(msg)
      else org.slf4j.LoggerFactory.getLogger(getClass).warn(msg)
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** SRP table width that keeps mean bucket occupancy ≤ `occupancy` for
    * an `n`-row corpus: a FIXED bit width is the same saturation disease
    * the hamming banding had — 2^bits buckets hold a growing corpus at
    * occupancy n/2^bits, and per-bucket self-join volume grows
    * n²/2^bits, quadratic once the corpus outgrows the key space
    * (measured: the 8-bit config ran 74 s at 30k vectors vs 16 s brute
    * force). Adaptive bits pin the collision term at
    * ~tables · occupancy · n — linear with a documented constant.
    * Capped at 30 bits (plane literals stay bounded); corpora past
    * occupancy·2^30 rows per table should raise `occupancy`/`tables`.
    */
  def srpBitsFor(n: Long, floorBits: Int, occupancy: Long = 16L): Int = {
    require(floorBits >= 1 && occupancy >= 1)
    val pos = math.max(n, 1L)
    // overflow-safe ceil division (pos + occupancy - 1 wraps at Long.Max)
    val groups = pos / occupancy + (if (pos % occupancy == 0L) 0L else 1L)
    val need =
      if (groups <= 1L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(groups - 1L)
    math.min(30, math.max(floorBits, need))
  }

  /** Embedding near-dup via SRP-LSH candidates → exact cosine verify —
    * the sub-quadratic path for TRUE near-duplicate thresholds
    * (cos ≥ ~0.85), where a few tables give near-total recall at a
    * candidate volume ≪ n²/2. Candidates shuffle on (table, bucket);
    * the verify joins vectors back by id and keeps pairs ≥ `minCos`.
    * Approximate by construction: recall is 1-(1-p^bits)^tables per pair
    * (p = 1 - θ/π); raise `tables` to taste.
    *
    * `bitsPerTable` is the FLOOR: the effective width comes from
    * [[srpBitsFor]] over a counted corpus probe, so the bucket space
    * grows with the corpus instead of saturating (EXACT duplicates —
    * identical vectors — collide at any width, so recall for the clone
    * regime is unaffected; near-but-not-identical recall decays slowly
    * with width, compensate with `tables`).
    *
    * NOTE the width probe is an EAGER `count()` at construction time
    * unless `knownN` is supplied — callers that already know the corpus
    * cardinality (a pipeline knows its batch size; the query layer
    * counts the fixture once) pass it to keep the call lazy and to
    * guarantee the probed count matches the corpus the hashes are built
    * over even when `embs` is nondeterministic upstream.
    */
  def embeddingPairsViaCandidates(embs: DataFrame, idCol: String, vecCol: String,
      minCos: Double, dim: Int, bitsPerTable: Int = 12, tables: Int = 6,
      seed: Long = 42L, knownN: Option[Long] = None): DataFrame = {
    val bits = srpBitsFor(knownN.getOrElse(embs.count()), bitsPerTable)
    val cands = graft.similarity.Similarity.srpCandidates(
      embs, idCol, vecCol, bits, tables, dim, seed)
    val vecs = embs.select(col(idCol), col(vecCol))
    cands
      .join(vecs.select(col(idCol).as("a_id"), col(vecCol).as("a_vec")), "a_id")
      .join(vecs.select(col(idCol).as("b_id"), col(vecCol).as("b_vec")), "b_id")
      .withColumn("cos", cosine_similarity(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= minCos)
      .select("a_id", "b_id", "cos")
  }

  /** Corpus-level LINE deduplication (the CCNet / RefinedWeb pass): every
    * line whose normalized form appears in ≥ `maxDocFreq` DISTINCT
    * documents is boilerplate (nav bars, cookie banners, license headers,
    * share buttons) and is cut from EVERY document; the rest of each doc
    * reassembles in order. This is line-granular, corpus-frequency-keyed —
    * a different axis from span dedup (`doc_despan` cuts shingle runs but
    * keeps one keeper copy) and from doc-level dedup (which drops whole
    * docs): boilerplate lines survive doc-level dedup because the docs
    * AROUND them differ, and despan's keeper rule would keep one copy per
    * distinct span, which is wrong for boilerplate — no copy is content.
    *
    * Shape at 100 TB: an OPTIONAL doc-row re-spread (only when the
    * corpus arrives in fewer partitions than the cluster has cores —
    * the [[shingleIndex]] small-files rationale; a well-partitioned
    * corpus is left alone, so the narrow line-ification below is the
    * first real work), one narrow line-ification (posexplode), one
    * aggregation shuffled on the normalized line (count DISTINCT docs —
    * partial aggregation absorbs the per-doc repeats map-side), one
    * corpus-sized equi-join back on the line key, one per-doc positional
    * re-collect. Everything is linear in total line count; there is no
    * pair join anywhere, no broadcast of corpus-derived state, and the
    * line-frequency table shards freely across executors. Hot keys (the
    * boilerplate itself — some lines appear in millions of docs) are
    * exactly the keys the join's build side REMOVES, and AQE skew-split
    * covers the count; `maxDocFreq` is the only dial.
    *
    * `docs(idCol, textCol)` → (doc_id, pos, line, keep) at line grain.
    */
  def lineDedupFlags(docs: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int, maxDocFreq: Long): DataFrame = {
    require(wordsPerLine >= 1, s"wordsPerLine must be >= 1, got $wordsPerLine")
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2, got $maxDocFreq")
    // The fixture's documents carry no newlines, so "lines" are fixed
    // windows of `wordsPerLine` whitespace-separated words — the chunking
    // is deterministic, so exact-clone docs produce exactly-equal lines
    // (the property corpus-frequency keying needs). A real web corpus
    // would split on '\n' instead; everything downstream is unchanged.
    // gated re-spread: only a corpus arriving in FEWER partitions than
    // the cluster has cores gets the shingleIndex-style repartition (the
    // few/small-files case the narrow line-ification needs); a corpus
    // already at cluster parallelism keeps its partitioning — no
    // unconditional corpus-wide shuffle
    val parallelism = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < parallelism)
        docs.repartition(parallelism)
      else docs
    // null text must not drop the doc (the cardinality invariant
    // lineDedup documents): split(NULL) would propagate null through
    // transform/sequence and posexplode would erase the row, so null
    // coalesces to the empty string (which line-ifies to one empty line,
    // exactly like genuinely empty text)
    val lines = spread
      .select(
        col(idCol).as("doc_id"),
        split(coalesce(col(textCol), lit("")), " ").as("w"))
      .select(
        col("doc_id"),
        posexplode(expr(
          s"""transform(sequence(0, (size(w) + ${wordsPerLine - 1}) div $wordsPerLine - 1),
             |          i -> array_join(slice(w, i * $wordsPerLine + 1, $wordsPerLine), ' '))"""
            .stripMargin)))
      .select(col("doc_id"), col("pos"), col("col").as("line"))
      .withColumn("k", lower(trim(col("line"))))
      // lines feeds BOTH the corpus-frequency aggregate and the flag
      // join; the lazy checkpoint runs the line-ification (split +
      // posexplode over the corpus) once instead of once per reference —
      // the materialized rows are exactly what the freq shuffle moves
      .localCheckpoint(eager = false)
    val freq = lines
      .groupBy("k")
      .agg(countDistinct(col("doc_id")).as("line_df"))
    lines
      .join(freq, "k")
      .select(col("doc_id"), col("pos"), col("line"),
        (col("line_df") < maxDocFreq).as("keep"))
  }

  /** [[lineDedupFlags]] reassembled to cleaned documents: (doc_id,
    * clean_text, n_kept_lines, n_dropped_lines). Docs that were ALL
    * boilerplate come back with empty text and n_kept_lines = 0 (the
    * downstream quality filter's job to drop — this operator never
    * changes corpus cardinality).
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
      wordsPerLine: Int = 10, maxDocFreq: Long = 3L): DataFrame = {
    // flags backs the rebuilt text AND the per-doc line totals — one
    // materialization instead of re-running the frequency join per
    // reference (same rows either way; the totals read is narrow)
    val flags = lineDedupFlags(docs, idCol, textCol, wordsPerLine, maxDocFreq)
      .localCheckpoint(eager = false)
    val rebuilt = flags
      .filter(col("keep"))
      .groupBy("doc_id")
      .agg(
        concat_ws(" ", expr(
          "transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"))
          .as("clean_text"),
        count(lit(1)).as("n_kept_lines"))
    val totals = flags
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_lines"))
    totals
      .join(rebuilt, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept_lines"), lit(0L)).as("n_kept_lines"),
        (col("n_lines") - coalesce(col("n_kept_lines"), lit(0L)))
          .as("n_dropped_lines"))
  }
}
