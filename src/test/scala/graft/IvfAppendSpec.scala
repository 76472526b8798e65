package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.similarity.{IvfMaintenance, Similarity}

/** Incremental IVF maintenance contracts: parquet append never touches
  * the standing corpus files, the sidecar stats stay consistent with the
  * layout, append+search equals rebuild+search, and the rebalance signal
  * fires exactly on the build-time skew bound.
  */
class IvfAppendSpec extends SparkSpec {

  import spark.implicits._

  private def centroids2 = Seq(
    (0, Seq(1f, 0f, 0f, 0f)),
    (1, Seq(0f, 1f, 0f, 0f))).toDF("cid", "cvec")

  /** id-keyed toy vectors leaning toward the axis given by `bucket`. */
  private def vecs(ids: Range, bucket: Int) = ids.map { i =>
    val v = if (bucket == 0) Seq(1f, 0.1f * (i % 3), 0f, 0f)
            else Seq(0.1f * (i % 3), 1f, 0f, 0f)
    (i.toLong, v)
  }.toDF("vec_id", "embedding")

  private def listFiles(root: Path): Map[String, Long] =
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filterNot(_.getFileName.toString.startsWith("_"))
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => root.relativize(p).toString -> Files.size(p)).toMap

  test("append adds files without reading or rewriting standing ones") {
    val root = Files.createTempDirectory("ivfapp_files")
    val corpus = root.resolve("corpus").toString
    val base = Similarity.assignToCentroids(
      vecs(0 until 40, 0).union(vecs(40 until 80, 1)),
      "vec_id", "embedding", centroids2, "cid", "cvec")
    base.write.partitionBy("centroid_id").parquet(corpus)
    IvfMaintenance.initStats(corpus, base)
    val before = listFiles(root.resolve("corpus"))

    val rep = IvfMaintenance.append(vecs(80 until 100, 1),
      "vec_id", "embedding", centroids2, "cid", "cvec", corpus,
      maxBucketFactor = 4L)
    assert(rep.appended == 20)
    val after = listFiles(root.resolve("corpus"))
    // every pre-existing data file survives with identical size…
    before.foreach { case (f, sz) => assert(after.get(f).contains(sz), f) }
    // …and the new files landed only under the touched partition dir
    val added = after.keySet -- before.keySet
    assert(added.nonEmpty)
    assert(added.forall(_.startsWith("centroid_id=1")), added)
  }

  test("sidecar stats match the actual layout after appends") {
    val root = Files.createTempDirectory("ivfapp_stats")
    val corpus = root.resolve("corpus").toString
    val base = Similarity.assignToCentroids(vecs(0 until 30, 0),
      "vec_id", "embedding", centroids2, "cid", "cvec")
    base.write.partitionBy("centroid_id").parquet(corpus)
    IvfMaintenance.initStats(corpus, base)
    IvfMaintenance.append(vecs(30 until 50, 1), "vec_id", "embedding",
      centroids2, "cid", "cvec", corpus, 4L)
    IvfMaintenance.append(vecs(50 until 60, 0), "vec_id", "embedding",
      centroids2, "cid", "cvec", corpus, 4L)
    val actual = spark.read.parquet(corpus)
      .groupBy("centroid_id").count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    assert(IvfMaintenance.readStats(corpus).contains(actual))
  }

  test("a pre-stats layout bootstraps its sidecar on first append") {
    val root = Files.createTempDirectory("ivfapp_boot")
    val corpus = root.resolve("corpus").toString
    Similarity.assignToCentroids(vecs(0 until 30, 0),
        "vec_id", "embedding", centroids2, "cid", "cvec")
      .write.partitionBy("centroid_id").parquet(corpus)
    assert(IvfMaintenance.readStats(corpus).isEmpty)
    IvfMaintenance.append(vecs(30 until 40, 1), "vec_id", "embedding",
      centroids2, "cid", "cvec", corpus, 4L)
    val actual = spark.read.parquet(corpus)
      .groupBy("centroid_id").count().collect()
      .map(r => r.get(0).toString.toInt -> r.getLong(1)).toMap
    assert(IvfMaintenance.readStats(corpus).contains(actual))
  }

  test("rebalance signal fires exactly on the skew bound") {
    assert(!IvfMaintenance.skewed(Map(0 -> 50L, 1 -> 50L), 4L))
    // 4 buckets, mean 75, bound 2×75=150: a 300-row bucket breaches
    assert(IvfMaintenance.skewed(
      Map(0 -> 300L, 1 -> 0L, 2 -> 0L, 3 -> 0L), 2L))
    assert(!IvfMaintenance.skewed(
      Map(0 -> 100L, 1 -> 80L, 2 -> 60L, 3 -> 60L), 2L))
    assert(!IvfMaintenance.skewed(Map.empty, 4L))
    val root = Files.createTempDirectory("ivfapp_skew")
    val corpus = root.resolve("corpus").toString
    val base = Similarity.assignToCentroids(
      vecs(0 until 10, 0).union(vecs(10 until 20, 1)),
      "vec_id", "embedding", centroids2, "cid", "cvec")
    base.write.partitionBy("centroid_id").parquet(corpus)
    IvfMaintenance.initStats(corpus, base)
    // a heavily one-sided ingest breaches the bound (k=2 ⇒ factor 1:
    // bound = the total's even split; bucket 1 ends at 110/120)
    val rep = IvfMaintenance.append(vecs(20 until 120, 1),
      "vec_id", "embedding", centroids2, "cid", "cvec", corpus, 1L)
    assert(rep.needsRebalance)
  }

  test("a boundary-mode append decays recall@1, trips the skew signal, and a re-fit restores both") {
    // The planted drift scenario vec_ivf_recall_drift measures on the
    // fixture, here PROVABLE by construction: a new embedding mode lands
    // on the c0/c1 decision boundary, so (a) its members split across
    // the two buckets and a probe from inside the mode loses exactly
    // half its true neighbors at nprobe=1, and (b) the mode's volume
    // concentrates in 2 of 4 buckets and breaches the build-time skew
    // bound — the SAME ingest produces the decay AND the signal, and the
    // signal's remedy (a re-fit whose centroid set covers the mode)
    // restores recall@1 to 1.0.
    val centroids4 = Seq(
      (0, Seq(1f, 0f, 0f, 0f)), (1, Seq(0f, 1f, 0f, 0f)),
      (2, Seq(0f, 0f, 1f, 0f)), (3, Seq(0f, 0f, 0f, 1f))).toDF("cid", "cvec")
    def axisVecs(ids: Range, axis: Int) = ids.map { i =>
      val v = Seq.tabulate(4)(d =>
        if (d == axis) 1f else if (d == (axis + 1) % 4) 0.1f * (i % 3) else 0f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val base = (0 until 4).map(a => axisVecs(a * 10 until (a + 1) * 10, a))
      .reduce(_ union _)
    // boundary mode: equal c0/c1 weight, an alternating ±0.001 lean
    // deciding the bucket, a third component cycling i%3 deciding the
    // within-mode ranking (i%3 == 0 ⇒ the probe's nearest ring)
    val boundary = (100 until 140).map { i =>
      val lean = if (i % 2 == 0) 0.001f else -0.001f
      (i.toLong, Seq(1f + lean, 1f - lean, 0.01f * (i % 3), 0f))
    }.toDF("vec_id", "embedding")
    val pd = typedLit(Seq(1f, 1f, 0f, 0f)) // probes from inside the mode

    val aug = base.union(boundary)
    val assigned = Similarity.assignToCentroids(
      aug, "vec_id", "embedding", centroids4, "cid", "cvec")
    val brute = Similarity.bruteForceKnn(aug, "vec_id", "embedding", pd, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // the mode's nearest ring is i%3==0, whose parities alternate: the
    // true top-10 splits 5/5 across buckets 0 and 1
    assert(brute == Set(102L, 105L, 108L, 111L, 114L, 117L, 120L, 123L, 126L, 129L))
    def recallAt(centroids: org.apache.spark.sql.DataFrame, np: Int) = {
      val asg = Similarity.assignToCentroids(
        aug, "vec_id", "embedding", centroids, "cid", "cvec")
      Similarity.ivfKnn(asg, "vec_id", "embedding", centroids,
          "cid", "cvec", pd, 10, nprobe = np)
        .select("vec_id").collect().map(_.getLong(0)).toSet
        .intersect(brute).size / 10.0
    }
    assert(recallAt(centroids4, 1) == 0.5) // exactly half the neighbors lost
    assert(recallAt(centroids4, 4) == 1.0) // nprobe=ALL stays exact

    // the same ingest breaches the skew bound through the real append path
    val root = Files.createTempDirectory("ivfapp_drift")
    val corpus = root.resolve("corpus").toString
    val baseAssigned = Similarity.assignToCentroids(
      base, "vec_id", "embedding", centroids4, "cid", "cvec")
    baseAssigned.write.partitionBy("centroid_id").parquet(corpus)
    IvfMaintenance.initStats(corpus, baseAssigned)
    val rep = IvfMaintenance.append(boundary, "vec_id", "embedding",
      centroids4, "cid", "cvec", corpus, 1L)
    assert(rep.needsRebalance,
      "the boundary-mode ingest must trip the rebalance signal")

    // the remedy the signal calls for: a centroid covering the new mode
    val refit = centroids4.union(
      Seq((4, Seq(1f, 1f, 0f, 0f))).toDF("cid", "cvec"))
    assert(recallAt(refit, 1) == 1.0)
  }

  test("append+search at nprobe=ALL equals brute force over the full corpus") {
    val result = SparkEntry.queries("vec_index_append")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val probe = Tables.table(spark, sfDir, "embeddings")
      .filter(col("vec_id") === 42).select("embedding")
      .head().getSeq[Float](0)
    val brute = Similarity.bruteForceKnn(
        Tables.table(spark, sfDir, "embeddings"),
        "vec_id", "embedding", typedLit(probe), 10)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(result == brute)
  }
}
