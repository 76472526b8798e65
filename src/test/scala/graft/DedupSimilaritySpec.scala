package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.VectorFunctions.cosine_similarity
import graft.similarity.Similarity

/** Semantics tests for the LLM-pipeline operators on the sf0.001 fixtures:
  * MinHash-LSH recall vs exact Jaccard, SimHash locality, kNN exactness,
  * IVF candidate containment, approx-distinct error bound.
  */
class DedupSimilaritySpec extends SparkSpec {

  private lazy val docs = Tables.table(spark, sfDir, "documents")
  private lazy val embs = Tables.table(spark, sfDir, "embeddings")

  test("minhash-LSH candidates contain every high-Jaccard pair (recall)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.9)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minHashCandidates(docs, "doc_id", "text", n = 3, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val missed = exact -- cand
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("simhash: near-dup docs land within small hamming distance") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.95)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(exact.nonEmpty)
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (a, b) =>
      val ham = java.lang.Long.bitCount(sh(a) ^ sh(b))
      assert(ham <= 6, s"pair ($a,$b) jaccard>=0.95 but hamming=$ham")
    }
  }

  test("cosine expression matches a driver-side reference computation") {
    val rows = embs.limit(3).select("vec_id", "embedding").collect()
    val a = rows(0).getSeq[Float](1); val b = rows(1).getSeq[Float](1)
    // sequential float32 accumulation — the DuckDB list_dot_product
    // scheme the expression is pinned to
    def cos(x: Seq[Float], y: Seq[Float]): Double = {
      var dot = 0.0f; var na = 0.0f; var nb = 0.0f
      x.zip(y).foreach { case (p, q) => dot += p * q; na += p * p; nb += q * q }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val got = spark.range(1)
      .select(cosine_similarity(typedLit(a), typedLit(b)).as("c"))
      .head().getDouble(0)
    assert(math.abs(got - cos(a, b)) < 1e-12)
  }

  test("brute-force kNN returns the exact top-k (validated by full sort)") {
    val probe = embs.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    val knn = Similarity.bruteForceKnn(embs, "vec_id", "embedding", typedLit(probe), 5)
      .collect().map(_.getLong(0))
    val full = embs
      .withColumn("sim", cosine_similarity(col("embedding"), typedLit(probe)))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5).collect().map(_.getLong(0))
    assert(knn.sameElements(full))
  }

  test("IVF kNN results are a subset of the probe centroid's bucket, exact within it") {
    val centroids = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val probe = embs.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0)
    val assigned = Similarity.assignToCentroids(embs, "vec_id", "embedding",
      centroids, "cid", "cvec")
    // every corpus vector got exactly one centroid
    assert(assigned.count() === embs.count())
    val res = Similarity.ivfKnn(assigned, "vec_id", "embedding",
      centroids, "cid", "cvec", typedLit(probe), 5)
    assert(res.count() === 5)
    // vec 7 is itself a centroid: its bucket contains it with sim 1.0
    val top = res.orderBy(col("sim").desc).head()
    assert(top.getLong(0) === 7L && math.abs(top.getDouble(1) - 1.0) < 1e-12)
  }

  test("SRP-LSH: bucket keys are deterministic and candidates are id-ordered pairs") {
    val c1 = Similarity.srpCandidates(embs, "vec_id", "embedding",
      bitsPerTable = 4, tables = 4, dim = 64)
    val c2 = Similarity.srpCandidates(embs, "vec_id", "embedding",
      bitsPerTable = 4, tables = 4, dim = 64)
    val s1 = c1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val s2 = c2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1 === s2, "deterministic across runs")
    assert(s1.nonEmpty)
    assert(s1.forall { case (a, b) => a < b })
    // more tables can only add candidates (monotone recall)
    val more = Similarity.srpCandidates(embs, "vec_id", "embedding",
      bitsPerTable = 4, tables = 8, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s1.subsetOf(more))
  }

  test("blocked embeddingPairs matches all-pairs brute force, at any block count") {
    val ref = embs.select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
      .crossJoin(embs.select(col("vec_id").as("b_id"), col("embedding").as("b_vec")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", cosine_similarity(col("a_vec"), col("b_vec")))
      .filter(col("cos") >= 0.45)
      .select("a_id", "b_id", "cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ref.nonEmpty, "fixture should contain planted near-dup vectors")
    for (blocks <- Seq(1, 4, 8)) {
      val got = Dedup.embeddingPairs(embs, "vec_id", "embedding",
          minCos = 0.45, blocks = blocks)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === ref, s"blocks=$blocks diverged from brute force")
    }
  }

  test("simHashPairs banding matches the all-pairs Hamming join exactly") {
    val sh = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val maxHam = 3
    val ref = (for {
      (a, ha) <- sh; (b, hb) <- sh if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= maxHam
    } yield (a, b, ham)).toSet
    assert(ref.nonEmpty, "fixture should contain simhash-close docs")
    val got = Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = maxHam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === ref)
  }

  test("simHash64: low half equals the 32-bit signature; banding matches all-pairs") {
    // both operators read the same token md5 (first/both 32-bit halves),
    // so the 64-bit signature's low half must BIT-EQUAL the 32-bit one —
    // the no-drift invariant that lets them share fixtures and intuition
    val sh32 = Dedup.simHash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sh64 = Dedup.simHash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(sh64.nonEmpty)
    sh64.foreach { case (id, h) =>
      assert((h & 0xffffffffL) === sh32(id), s"doc $id low half drifted")
    }
    val maxHam = 2
    val ref = (for {
      (a, ha) <- sh64; (b, hb) <- sh64 if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= maxHam
    } yield (a, b, ham)).toSet
    assert(ref.nonEmpty, "fixture should contain 64-bit simhash-close docs")
    val got = Dedup.simHashPairs64(docs, "doc_id", "text", maxHamming = maxHam)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === ref)
    // the salt dial must not change the pair set (every unordered pair
    // still meets exactly once, at the left doc's salt)
    val salted = Dedup.simHashPairs64(docs, "doc_id", "text",
        maxHamming = maxHam, saltBuckets = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted === ref)
  }

  test("simHashPairs64 fails loudly past its banding capacity") {
    // h = 29 → 31 chunks of 2 bits → 4-bit chunk-pair keys → capacity
    // 16 × 2^4 = 256 < the 500-doc fixture: the counted probe must throw
    // with the remediation dials, never run the quadratic join
    assert(Dedup.simHashCapacity(29, bits = 64) === 256L)
    val e = intercept[IllegalStateException] {
      Dedup.simHashPairs64(docs, "doc_id", "text", maxHamming = 29).count()
    }
    assert(e.getMessage.contains("capacity"))
  }

  test("simHashPairs (32-bit) fails loudly past its banding capacity") {
    // the r15 guard-symmetry item (verdict-r14 #2): the 32-bit path gets
    // the same counted probe as simHashPairs64/phashPairs. h = 29 → 31
    // chunks of 1 bit → 2-bit chunk-pair keys → capacity 16 × 2^2 = 64
    // < the 500-doc fixture: REFUSE with the remediation dials (incl.
    // the pointer to simHashPairs64), never run the quadratic join
    assert(Dedup.simHashCapacity(29, bits = 32) === 64L)
    val e = intercept[IllegalStateException] {
      Dedup.simHashPairs(docs, "doc_id", "text", maxHamming = 29).count()
    }
    assert(e.getMessage.contains("capacity"))
    assert(e.getMessage.contains("simHashPairs64"))
    // candidates surface shares the guard (same raw-candidate path)
    val e2 = intercept[IllegalStateException] {
      Dedup.simHashCandidates(docs, "doc_id", "text", maxHamming = 29).count()
    }
    assert(e2.getMessage.contains("capacity"))
  }

  test("minhash lane agreement estimates Jaccard within sketch error on candidates") {
    val idx = Dedup.shingleIndex(docs, "doc_id", "text", n = 3)
    val sigs = Dedup.minHashSignaturesFromIndex(idx, k = 16)
    val est = Dedup.minHashJaccardEstimate(sigs, k = 16, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est.nonEmpty)
    // candidates share ≥1 band (4 consecutive lanes) by construction
    assert(est.values.forall(e => e >= 0.25 - 1e-9 && e <= 1.0 + 1e-9))
    val exact = Dedup.jaccardPairsFromIndex(idx, minJaccard = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // k=16 lanes: stderr ≤ 1/8; mean |error| across candidates stays small
    val errs = est.toSeq.map { case (pair, e) =>
      math.abs(e - exact.getOrElse(pair, 0.0)) }
    assert(errs.sum / errs.size < 0.2,
      f"mean |est - exact| = ${errs.sum / errs.size}%.3f")
    // true near-dups estimate high
    exact.filter(_._2 >= 0.95).keys.filter(est.contains).foreach { pair =>
      assert(est(pair) >= 0.6, s"$pair: est ${est(pair)} for exact >=0.95")
    }
  }

  test("simhash salt splits hot chunks without changing the pair set") {
    import spark.implicits._
    // worst-case skew: 60 identical docs — ONE simhash value, so every
    // (band, chunk) key holds all 60 rows and one reducer would generate
    // all 60·59/2 candidate pairs
    val hotDocs = (1L to 60L)
      .map(i => (i, "the same boilerplate template text on every page"))
      .toDF("doc_id", "text")
    val unsalted = Dedup.simHashPairs(hotDocs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(unsalted.size === 60 * 59 / 2)
    val salted = Dedup.simHashPairs(hotDocs, "doc_id", "text", maxHamming = 3,
        saltBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(salted === unsalted, "salting must not change the result")
    // the salt splits the hot key's LEFT side (the pair-generation
    // driver): max per-key group drops from n to ~n/S
    val banded = Dedup.simHashBands(hotDocs, "doc_id", "text", maxHamming = 3)
    val hotMax = banded.groupBy("bk").count()
      .agg(max("count")).head().getLong(0)
    assert(hotMax === 60L)
    val saltedMax = banded
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(8)))
      .groupBy("bk", "salt").count()
      .agg(max("count")).head().getLong(0)
    assert(saltedMax <= 20L,
      s"hot chunk not split by salt: max group $saltedMax of 60")
  }

  test("jaccard stop-shingle cap: identity above max df, one-sided below") {
    val off = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(off.nonEmpty)
    // fixture's max shingle df is 9 — a cap of 20 must change nothing
    val generous = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        minJaccard = 0.8, maxShingleDf = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(generous === off)
    // an aggressive cap may only LOSE pairs / shrink jaccard, never add
    val tight = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
        minJaccard = 0.8, maxShingleDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(off.map(t => (t._1, t._2))))
  }

  test("materialized shingle index reproduces jaccardPairs without a cache pin") {
    val dir = java.nio.file.Files.createTempDirectory("shingle_idx").toString
    try {
      val idx = Dedup.writeShingleIndex(docs, "doc_id", "text", n = 3, path = dir)
      val fromIdx = Dedup.jaccardPairsFromIndex(idx, minJaccard = 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val direct = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3,
          minJaccard = 0.8, cacheIndex = false)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(fromIdx === direct)
      assert(fromIdx.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("LSH candidates→verify achieves total recall in the near-dup regime") {
    // plant exact duplicates (cos = 1.0): identical vectors agree on every
    // SRP sign bit, so they collide in every table — recall is certain,
    // which is precisely the regime the candidates path is for
    val planted = embs.select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = embs.select("vec_id", "embedding").unionAll(planted)
    val got = Dedup.embeddingPairsViaCandidates(corpus, "vec_id", "embedding",
        minCos = 0.999, dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = embs.select("vec_id").collect()
      .map(_.getLong(0)).map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(got),
      s"missing planted duplicates: ${expected -- got}")
    // and no false positives below the verify threshold survive
    assert(got.forall { case (a, b) => a < b })
  }

  test("adaptive SRP width: formula pins occupancy, clones still total-recall " +
      "above the floor") {
    // the width formula: floor below saturation, ceil(log2(n/16)) past it,
    // capped at 30 — the anti-saturation dial (a FIXED 8-bit table went
    // quadratic at 30k vectors, measured 74 s vs 16 s brute force at sf1u)
    assert(Dedup.srpBitsFor(1L, 8) == 8)
    assert(Dedup.srpBitsFor(4096L, 8) == 8)       // 4096/16 = 256 = 2^8
    assert(Dedup.srpBitsFor(4097L, 8) == 9)       // first row past capacity
    assert(Dedup.srpBitsFor(30000L, 8) == 11)     // the measured sf1u regime
    assert(Dedup.srpBitsFor(Long.MaxValue, 8) == 30) // hard cap
    // force the adaptive branch with a synthetic corpus well past the
    // 8-bit floor's 4096-row capacity: 6000 deterministic vectors + 600
    // planted exact clones; identical vectors agree on every sign bit at
    // ANY width, so recall for the clone regime must stay total
    import spark.implicits._
    val base = spark.range(6000).select(
      col("id").as("vec_id"),
      expr("cast(transform(sequence(0, 63), d -> " +
        "pmod(xxhash64(id * 64 + d), 1000) / 1000.0 - 0.5) as array<float>)")
        .as("embedding"))
    val clones = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val corpus = base.unionAll(clones)
    val got = Dedup.embeddingPairsViaCandidates(corpus, "vec_id", "embedding",
        minCos = 0.999, dim = 64, bitsPerTable = 8, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (0L until 6000L by 10L).map(id => (id, id + 100000L)).toSet
    assert(expected.subsetOf(got),
      s"adaptive width lost planted clones: ${(expected -- got).take(5)}")
  }

  test("IVF multi-probe: recall grows with nprobe, full probe = brute force") {
    val centroids = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val probe = embs.filter(col("vec_id") === 33)
      .select("embedding").head().getSeq[Float](0)
    val assigned = Similarity.assignToCentroids(embs, "vec_id", "embedding",
      centroids, "cid", "cvec")
    def knnAt(nprobe: Int): Seq[Long] =
      Similarity.ivfKnn(assigned, "vec_id", "embedding",
        centroids, "cid", "cvec", typedLit(probe), 10, nprobe)
        .collect().map(_.getLong(0)).toSeq
    val exact = Similarity.bruteForceKnn(embs, "vec_id", "embedding",
        typedLit(probe), 10)
      .collect().map(_.getLong(0)).toSeq
    // probing every centroid reads the whole corpus: exactly brute force
    assert(knnAt(8) === exact)
    // recall against the exact top-10 never decreases as nprobe grows
    val recalls = Seq(1, 2, 4, 8).map(np => knnAt(np).toSet.intersect(exact.toSet).size)
    assert(recalls.sliding(2).forall { case Seq(a, b) => a <= b })
  }

  test("balancedCentroids splits a hot IVF bucket and preserves full-probe parity") {
    import spark.implicits._
    // deliberately clustered corpus: 360 of 400 vectors jitter around one
    // direction (a near-dup-heavy crawl), the rest are spread. The spread
    // rows take the SMALL ids: KMeans.fit inits from the k smallest-id
    // vectors, so the initial centroids are spread directions and the
    // whole blob lands in ONE centroid's partition — the hot-bucket shape
    val rnd = new scala.util.Random(7)
    val base = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    def jittered(): Seq[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.5f).toSeq
    def spread(): Seq[Float] = Seq.fill(8)(rnd.nextFloat() * 2 - 1)
    val vecs = (1L to 40L).map(i => (i, spread())) ++
      (41L to 400L).map(i => (i, jittered()))
    val corpus = vecs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val init = graft.similarity.KMeans.fit(
      corpus, "vec_id", "embedding", k = 4, iters = 3, dim = 8)
    def maxBucket(cents: org.apache.spark.sql.DataFrame): Long =
      Similarity.assignToCentroids(corpus, "vec_id", "embedding",
          cents, "cid", "cvec")
        .groupBy("centroid_id").count().agg(max("count")).head().getLong(0)
    assert(maxBucket(init) > 150L, "fixture must actually produce a hot bucket")

    val balanced = Similarity.balancedCentroids(corpus, "vec_id", "embedding",
      init, "cid", "cvec", maxRows = 150L, dim = 8)
    // the bound holds after balancing, and the table grew by real splits
    assert(maxBucket(balanced) <= 150L,
      s"hot bucket not split: max=${maxBucket(balanced)}")
    assert(balanced.count() > 4L)

    // parity is untouched: probing EVERY centroid of the balanced table
    // still reproduces exact brute force
    val probe = vecs.head._2
    val assigned = Similarity.assignToCentroids(corpus, "vec_id", "embedding",
      balanced, "cid", "cvec")
    val full = Similarity.ivfKnn(assigned, "vec_id", "embedding",
        balanced, "cid", "cvec", typedLit(probe), 10,
        nprobe = balanced.count().toInt)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.bruteForceKnn(corpus, "vec_id", "embedding",
        typedLit(probe), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full === exact)
  }

  test("duplicateClusters labels every component by its minimum member") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
    val pairList = pairs.select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairList.nonEmpty)
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference components via driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(x => x -> find(x)).toMap
    assert(got === expected)
    // cluster id is always a member and the minimum of its cluster
    got.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keySet.min === cid)
    }
  }

  test("duplicateClusters uses reliable checkpoints when a checkpoint dir is set") {
    val ckDir = java.nio.file.Files.createTempDirectory("cc_ck").toString
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.8)
    val withoutCk = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NOTE: a checkpoint dir cannot be unset on a SparkContext, and the
    // session is shared across suites — the dir deliberately stays set
    // (and on disk) so every later duplicateClusters call exercises the
    // reliable path too.
    spark.sparkContext.setCheckpointDir(ckDir)
    val withCk = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withCk === withoutCk)
    // reliable checkpoint files actually landed in the configured dir —
    // lineage now recovers from storage, not executor-local blocks
    val files = org.apache.commons.io.FileUtils
      .listFiles(new java.io.File(ckDir), null, true)
    assert(!files.isEmpty, "expected reliable checkpoint files on disk")
  }

  test("duplicateClusters surfaces non-convergence instead of silent truncation") {
    import spark.implicits._
    // a 12-node chain has diameter 11: one propagation round past the
    // folded init cannot reach the fixpoint
    val chain = (1L to 11L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val ex = intercept[IllegalStateException] {
      Dedup.duplicateClusters(chain, maxIter = 1)
    }
    assert(ex.getMessage.contains("did not converge"))
    // opt-out path returns the partial labels (documented approximation)
    val partial = Dedup.duplicateClusters(chain, maxIter = 1,
      requireConvergence = false)
    assert(partial.count() === 12)
    // and enough rounds converges to a single min-labeled component
    val full = Dedup.duplicateClusters(chain)
      .collect().map(r => r.getLong(1)).toSet
    assert(full === Set(1L))
  }

  // NOTE on the two pin tests below: the SparkSession (and its
  // ContextCleaner) is SHARED across every suite in the forked test
  // JVM, and the cleaner unpersists GC'd RDDs (earlier suites'
  // localCheckpoints, dropped cache pins) asynchronously — so a global
  // getPersistentRDDs.SIZE can shrink between two reads through no
  // action of this suite (the r10 1-in-3 full-suite flake). Both tests
  // therefore assert on RDD-ID SETS: background cleaning only REMOVES
  // ids, while the failure mode under test (a leaked pin) ADDS ids, so
  // "no NEW ids appeared" is exact and load-independent.
  test("shared shingle index: repeated query calls do not grow the pinned-plan set") {
    def pinnedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    def run(): Unit = {
      SparkEntry.queries("doc_dedup_ngram")(spark, sfDir).count()
      SparkEntry.queries("doc_dedup_clusters")(spark, sfDir).count()
      ()
    }
    run() // builds + pins the one shared index
    val after1 = pinnedIds
    run(); run()
    // any transient pin inside run() unpersists non-blocking — poll
    // before declaring a leak
    val deadline = System.nanoTime() + 10e9.toLong
    while ((pinnedIds -- after1).nonEmpty
        && System.nanoTime() < deadline) Thread.sleep(50)
    val leaked = pinnedIds -- after1
    assert(leaked.isEmpty,
      s"repeated calls pinned NEW plans (leaked RDD ids $leaked)")
  }

  test("withShingleIndex pins for the scope of f and releases on exit") {
    def pinnedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = pinnedIds
    var inside: Set[Int] = Set.empty
    // n = 4: a plan no other test caches — CacheManager dedupes by plan,
    // so persisting the n = 3 index SessionMemo already pinned would add
    // no new id (and its scope-exit unpersist would evict the memo's pin)
    val pairs = Dedup.withShingleIndex(docs, "doc_id", "text", n = 4) { idx =>
      val res = Dedup.jaccardPairsFromIndex(idx, minJaccard = 0.8).collect()
      // the cache pin registers on MATERIALIZATION, not at persist() —
      // snapshot after the first action over the index
      inside = pinnedIds -- before
      assert(inside.nonEmpty, "the index must be pinned inside the scope")
      res
    }
    assert(pairs.nonEmpty)
    // unpersist is async — poll briefly for the scope's own pins to drop
    val deadline = System.nanoTime() + 10e9.toLong
    while ((pinnedIds & inside).nonEmpty
        && System.nanoTime() < deadline) Thread.sleep(50)
    assert((pinnedIds & inside).isEmpty,
      s"scope-pinned RDDs ${pinnedIds & inside} survived the exit")
  }

  test("incremental candidates: shuffled fallback above the broadcast bound, same rows") {
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val idx = Dedup.shingleIndex(docs, "doc_id", "text", n = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // turn Catalyst/AQE auto-broadcast OFF so the plan shape reflects the
    // helper's own decision (at sf0.001 the optimizer would otherwise
    // broadcast the small side regardless and mask the fallback)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      saved.foreach { case (k, _) => spark.conf.set(k, "-1") }
      val oldIdx = idx.filter(col("doc_id") % 10 < 8)
      val newIdx = idx.filter(col("doc_id") % 10 >= 8)
      // default bound: the increment broadcasts (explicit hint survives
      // the disabled auto-broadcast)
      val viaBcast = Dedup.incrementalCandidates(oldIdx, newIdx)
      // bound of 0: every increment exceeds it → shuffled equi-join
      val viaShuffle = Dedup.incrementalCandidates(oldIdx, newIdx,
        maxBroadcastPostings = 0L)
      val a = viaBcast.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val b = viaShuffle.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(a.nonEmpty, "fixture should produce old×new candidates")
      assert(a === b, "fallback path must produce identical candidates")
      // the shapes really differ: broadcast join present under the bound,
      // absent (pure shuffled join) above it
      def hasBroadcastJoin(df: org.apache.spark.sql.DataFrame): Boolean =
        allNodes(df.queryExecution.executedPlan).exists {
          case _: BroadcastHashJoinExec | _: BroadcastExchangeExec => true
          case _ => false
        }
      assert(hasBroadcastJoin(viaBcast), "increment under the bound must broadcast")
      assert(!hasBroadcastJoin(viaShuffle),
        "increment over the bound must NOT broadcast the postings")
    } finally {
      saved.foreach { case (k, v) =>
        v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
      idx.unpersist(); ()
    }
  }

  test("k-means: deterministic fit, k centroids, objective never worsens") {
    def objective(cents: Seq[(Int, Seq[Float])]): Double = {
      // mean max-cosine to a centroid — higher is tighter clustering
      val centDf = Similarity.assignToCentroids(
        embs, "vec_id", "embedding",
        spark.createDataFrame(
          spark.sparkContext.parallelize(
            cents.map { case (c, v) => org.apache.spark.sql.Row(c, v) }, 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("cid",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("cvec",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.FloatType))))),
        "cid", "cvec")
      centDf.join(
          spark.createDataFrame(
            spark.sparkContext.parallelize(
              cents.map { case (c, v) => org.apache.spark.sql.Row(c, v) }, 1),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("centroid_id",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("cvec",
                org.apache.spark.sql.types.ArrayType(
                  org.apache.spark.sql.types.FloatType))))),
          "centroid_id")
        .select(avg(cosine_similarity(col("embedding"), col("cvec"))))
        .head().getDouble(0)
    }
    val fit1 = graft.similarity.KMeans.fit(embs, "vec_id", "embedding",
      k = 8, iters = 3, dim = 64)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    val fit2 = graft.similarity.KMeans.fit(embs, "vec_id", "embedding",
      k = 8, iters = 3, dim = 64)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    assert(fit1 === fit2, "k-means must be deterministic")
    assert(fit1.size === 8)
    // more Lloyd iterations never hurt the clustering objective
    val fit0 = graft.similarity.KMeans.fit(embs, "vec_id", "embedding",
      k = 8, iters = 1, dim = 64)
      .collect().map(r => (r.getInt(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
    assert(objective(fit1) >= objective(fit0) - 1e-9)
  }

  test("learned-centroid IVF over a partitionBy(centroid_id) corpus prunes statically") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val dir = java.nio.file.Files.createTempDirectory("ivf_corpus").toString
    try {
      // learn real centroids, label the corpus, write it partitioned —
      // the one-time IVF "index build" at 100 TB
      val cents = similarity.KMeans.fit(embs, "vec_id", "embedding",
        k = 8, iters = 3, dim = 64)
      Similarity.assignToCentroids(embs, "vec_id", "embedding",
          cents, "cid", "cvec")
        .write.partitionBy("centroid_id").mode("overwrite").parquet(dir)
      val corpus = spark.read.parquet(dir)
      val probe = embs.filter(col("vec_id") === 42)
        .select("embedding").head().getSeq[Float](0)

      val res = Similarity.ivfKnnPruned(corpus, "vec_id", "embedding",
        cents, "cid", "cvec", typedLit(probe), 5, nprobe = 2)
      val rows = res.collect()
      assert(rows.length === 5)

      // the scan itself must carry the centroid predicate as a partition
      // filter and list only nprobe of the k partition directories
      val executed = res.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = executed.collectLeaves().collect { case f: FileSourceScanExec => f }
      assert(scans.nonEmpty, executed.toString)
      val scan = scans.head
      assert(scan.toString.contains("PartitionFilters: [centroid_id"), scan.toString)
      assert(scan.selectedPartitions.partitionCount === 2,
        s"expected 2 pruned partitions, scanned ${scan.selectedPartitions.partitionCount}")

      // parity: probing every centroid reads the whole corpus and must
      // reproduce brute force exactly
      val full = Similarity.ivfKnnPruned(corpus, "vec_id", "embedding",
          cents, "cid", "cvec", typedLit(probe), 10, nprobe = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val exact = Similarity.bruteForceKnn(embs, "vec_id", "embedding",
          typedLit(probe), 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(full === exact)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("approx quantile estimates stay within rank error of exact percentiles") {
    // r17: agg_approx_quantile is the deterministic bottom-m-by-hash
    // sample (KmvSampleAggregator, m=1000) — at this fixture every
    // group is under m so the estimates must be the EXACT rank-selected
    // quantiles; the saturated-regime rank-error bound is pinned in
    // KmvSpec, and the cross-engine arithmetic by the driver oracle
    val events = Tables.table(spark, sfDir, "events")
    val approx = SparkEntry.queries("agg_approx_quantile")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = events.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("percentile(value, array(0.5, 0.9))").as("p"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        (r.getSeq[Double](2)(0), r.getSeq[Double](2)(1)))).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    exact.foreach { case (et, (n, (e50, e90))) =>
      assert(n <= 1000, s"fixture grew past m; revisit this test: $et n=$n")
      val (a50, a90) = approx(et)
      // rank selection (ceil(p·n)) vs percentile()'s interpolation can
      // differ by at most one order statistic's gap; bound via spread/n
      val spread = events.filter(col("event_type") === et)
        .agg(max("value").cast("double") - min("value").cast("double"))
        .head().getDouble(0)
      assert(math.abs(a50 - e50) <= spread * 0.05, s"$et p50: $a50 vs $e50")
      assert(math.abs(a90 - e90) <= spread * 0.05, s"$et p90: $a90 vs $e90")
    }
  }

  test("approx_count_distinct stays within its 2% error bound on events") {
    val events = Tables.table(spark, sfDir, "events")
    val exact = events.select(countDistinct("user_id")).head().getLong(0)
    val approx = events.select(approx_count_distinct("user_id", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("nested LSH bandings nest their candidate sets (the sweep's s-curve theorem)") {
    // with k = 16 lanes, the 2-band split's 8-lane bands are unions of
    // the 4-band split's 4-lane bands, which are unions of the 8-band
    // 2-lane bands: a pair agreeing on a wide band agrees on each of its
    // halves, so candidates(2) ⊆ candidates(4) ⊆ candidates(8) — the
    // monotone recall the doc_dedup_eval_sweep table reports is a
    // structural property, not a fixture accident
    val docs = Tables.table(spark, sfDir, "documents")
    val sigs = graft.dedup.Dedup.minHashSignatures(docs, "doc_id", "text", 3, 16)
      .localCheckpoint(eager = false)
    def cands(b: Int) = graft.dedup.Dedup
      .minHashCandidatesFromSignatures(sigs, k = 16, bands = b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (c2, c4, c8) = (cands(2), cands(4), cands(8))
    assert(c2.subsetOf(c4), s"${(c2 -- c4).take(3)} in bands=2 but not 4")
    assert(c4.subsetOf(c8), s"${(c4 -- c8).take(3)} in bands=4 but not 8")
    // and the widening is real on this corpus, not vacuous equality
    assert(c8.size > c2.size)
  }

  test("line dedup: corpus-frequent lines cut everywhere, unique lines keep order") {
    import spark.implicits._
    // texts are sequences of exactly-aligned 10-word lines so the planted
    // boilerplate occupies one chunk window; the key is lower(trim(_)),
    // so doc 4's SHOUTED copy must still count toward (and fall to) the
    // corpus frequency
    def line(tag: String): String =
      (1 to 10).map(i => s"$tag$i").mkString(" ")
    val boiler = line("cookie")
    val docsDf = Seq(
      (1L, s"${line("alpha")} $boiler ${line("beta")}"),
      (2L, s"$boiler ${line("gamma")}"),
      (3L, s"${line("delta")} $boiler"),
      (4L, boiler.toUpperCase),
      (5L, s"${line("eps")} ${line("zeta")}")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(docsDf, "doc_id", "text",
        wordsPerLine = 10, maxDocFreq = 3L)
      .orderBy("doc_id")
      .collect()
    assert(out.length == 5, "line dedup must never change corpus cardinality")
    val byId = out.map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // boilerplate (df = 4 >= 3) is gone from every doc, no keeper copy
    out.foreach(r => assert(!r.getString(1).toLowerCase.contains("cookie1"),
      s"doc ${r.getLong(0)} still carries the boilerplate line"))
    // unique lines survive in original order
    assert(byId(1L)._1 == s"${line("alpha")} ${line("beta")}")
    assert(byId(1L)._2 == 2L && byId(1L)._3 == 1L)
    assert(byId(2L)._1 == line("gamma"))
    assert(byId(3L)._1 == line("delta"))
    // the all-boilerplate doc empties but stays present
    assert(byId(4L) == (("", 0L, 1L)))
    // a doc with no frequent lines is untouched
    assert(byId(5L) == ((s"${line("eps")} ${line("zeta")}", 2L, 0L)))
    // and below the threshold nothing is cut: df = 4 < maxDocFreq = 5
    val loose = Dedup.lineDedup(docsDf, "doc_id", "text",
        wordsPerLine = 10, maxDocFreq = 5L)
      .filter(col("n_dropped_lines") > 0).count()
    assert(loose == 0L)
  }

  test("line dedup: null-text docs survive (cardinality invariant, r15)") {
    import spark.implicits._
    // split(NULL) would null-propagate and posexplode would erase the
    // row — the advisor-r14 hole: the operator coalesces to '' so a
    // null-text doc comes back exactly like an empty-text doc
    val withNull = Seq(
      (1L, "alpha beta"),
      (2L, null.asInstanceOf[String]),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Dedup.lineDedup(withNull, "doc_id", "text",
        wordsPerLine = 2, maxDocFreq = 2L)
      .orderBy("doc_id").collect()
    assert(out.length == 3, "null text must not drop the doc")
    val byId = out.map(r => r.getLong(0) ->
      ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(byId(1L) == (("alpha beta", 1L, 0L)))
    // null and empty text behave identically: one empty line, which is
    // corpus-frequent here (df = 2 >= 2) so both docs empty but remain
    assert(byId(2L) == byId(3L))
    assert(byId(2L)._1 == "")
  }
}
