package graft.similarity

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Artifacts

/** Incremental maintenance of a materialized IVF layout — how a serving
  * index actually lives at 100 TB: the corpus cannot be re-clustered and
  * re-written per ingest batch, so new vectors are assigned to the
  * EXISTING centroids (the same zero-shuffle literal-centroid projection
  * `Similarity.assignToCentroids` uses at build time) and APPENDED into
  * the `partitionBy(centroid_id)` directory layout — parquet append
  * only adds files under the touched partition directories; the standing
  * corpus files are never read or rewritten (IvfAppendSpec proves the
  * pre-existing file set survives byte-identical).
  *
  * Because append never re-learns centroids, drift shows up as bucket
  * skew. Per-bucket row counts are maintained INCREMENTALLY in a
  * `_BUCKETS.tsv` sidecar (model-size: one line per centroid; Spark
  * ignores `_`-prefixed files in a parquet directory): each append
  * counts only its own batch (a model-size aggregation of
  * increment-sized data) and merges into the sidecar under the layout's
  * file lock. [[AppendReport.needsRebalance]] fires when the fullest
  * bucket exceeds `maxBucketFactor ×` the mean — the same bound the
  * initial build enforces via `Similarity.balancedCentroids` — telling
  * the operator to schedule the (rare, expensive) re-cluster instead of
  * running it blindly per batch.
  *
  * The one corpus-sized operation anywhere here is the sidecar
  * BOOTSTRAP when an existing layout predates stats (one count per
  * bucket, once per layout lifetime, documented); every steady-state
  * append costs O(|batch|) + a k-row sidecar rewrite.
  */
object IvfMaintenance {

  final case class AppendReport(
      appended: Long,
      bucketCounts: Map[Int, Long],
      needsRebalance: Boolean)

  private def statsPath(corpusPath: String): Path =
    Paths.get(corpusPath).resolve("_BUCKETS.tsv")

  /** Read the sidecar (cid → rows); None if this layout has no stats yet. */
  def readStats(corpusPath: String): Option[Map[Int, Long]] = {
    val p = statsPath(corpusPath)
    if (!Files.exists(p)) None
    else Some(Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .filter(_.nonEmpty)
      .map { line =>
        val Array(cid, n) = line.split("\t", 2)
        cid.toInt -> n.toLong
      }.toMap)
  }

  private def writeStats(corpusPath: String, counts: Map[Int, Long]): Unit = {
    val p = statsPath(corpusPath)
    val tmp = p.resolveSibling("_BUCKETS.tsv.tmp")
    val body = counts.toSeq.sortBy(_._1)
      .map { case (c, n) => s"$c\t$n" }.mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Initialize the sidecar from a freshly written base layout's
    * assignment frame — call once at build time so appends never need
    * the bootstrap scan.
    */
  def initStats(corpusPath: String, assigned: DataFrame): Unit =
    Artifacts.withDirLock(Paths.get(corpusPath)) {
      writeStats(corpusPath, collectCounts(assigned))
    }

  /** Model-size aggregation: one row per centroid. */
  private def collectCounts(assigned: DataFrame): Map[Int, Long] =
    assigned.groupBy("centroid_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    (a.keySet ++ b.keySet).iterator
      .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap

  /** Whether the fullest bucket breaches `maxBucketFactor ×` mean — the
    * build-time balance bound, re-checked from the incrementally
    * maintained counts.
    */
  def skewed(counts: Map[Int, Long], maxBucketFactor: Long): Boolean = {
    if (counts.isEmpty) false
    else {
      val total = counts.values.sum
      val maxRows = math.max(1L, maxBucketFactor * total / counts.size)
      counts.values.max > maxRows
    }
  }

  /** Append `batch` into the layout at `corpusPath`: assign to the
    * standing `centroids` (zero-shuffle projection over the batch only),
    * parquet-append under the partition directories, merge the batch's
    * bucket counts into the sidecar, and report whether the layout now
    * needs the re-cluster. Never reads a standing corpus file (the
    * stats bootstrap for a pre-stats layout is the documented
    * exception).
    */
  def append(batch: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      corpusPath: String, maxBucketFactor: Long): AppendReport = {
    val spark = batch.sparkSession
    val assigned = Similarity.assignToCentroids(
      batch, idCol, vecCol, centroids, cidCol, cvecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val batchCounts = collectCounts(assigned)
      assigned.write.partitionBy("centroid_id").mode("append")
        .parquet(corpusPath)
      Artifacts.withDirLock(Paths.get(corpusPath)) {
        val base = readStats(corpusPath).getOrElse {
          // bootstrap: a layout that predates stats pays one count —
          // subtract this batch, which the parquet append above already
          // made visible to the scan
          merge(
            collectCounts(spark.read.parquet(corpusPath)
              .select(col("centroid_id").cast("int").as("centroid_id"))),
            batchCounts.view.mapValues(-_).toMap)
        }
        val merged = merge(base, batchCounts).filter(_._2 > 0)
        writeStats(corpusPath, merged)
        AppendReport(
          appended = batchCounts.values.sum,
          bucketCounts = merged,
          needsRebalance = skewed(merged, maxBucketFactor))
      }
    } finally assigned.unpersist(blocking = false)
  }
}
