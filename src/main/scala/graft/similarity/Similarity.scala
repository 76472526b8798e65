package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_similarity

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Shapes:
  *  - [[bruteForceKnn]] — exact top-k for one probe: the probe broadcasts
  *    (it is one row), cosine is a codegen'd expression, and top-k plans as
  *    `TakeOrderedAndProject` (per-partition heap + driver merge of k) — a
  *    single pass over the corpus with zero shuffle. This is the 100 TB
  *    *verification* primitive.
  *  - [[assignToCentroids]] / [[ivfKnn]] — IVF (inverted-file) routing:
  *    corpus vectors are pre-assigned to their nearest centroid (a small
  *    broadcastable table), a probe only scans the `nprobe` closest
  *    centroid partitions. At scale the assignment is computed once and
  *    the corpus is *written partitioned by centroid_id*, so a probe reads
  *    `nprobe/k` of the data — partition pruning does the indexing.
  */
object Similarity {

  /** Exact cosine top-k of `probe` (a 1-row (id, vec) frame) against the
    * corpus. Deterministic: ties broken by id.
    */
  def bruteForceKnn(corpus: DataFrame, idCol: String, vecCol: String,
      probeVec: Column, k: Int): DataFrame =
    corpus
      .withColumn("sim", cosine_similarity(col(vecCol), probeVec))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("sim"))

  /** Nearest-centroid assignment: broadcast the centroid table, argmax
    * cosine per corpus row (window over the small per-row candidate set).
    */
  def assignToCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__csim").desc, col(cidCol))
    corpus
      .crossJoin(broadcast(centroids.select(col(cidCol), col(cvecCol))))
      .withColumn("__csim", cosine_similarity(col(vecCol), col(cvecCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col(cidCol).as("centroid_id"))
  }

  /** IVF search with `nprobe`=1: scan only the corpus partition owned by
    * the probe's nearest centroid, exact top-k within it.
    */
  def ivfKnn(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      probeVec: Column, k: Int): DataFrame = {
    val probeCentroid = centroids
      .withColumn("__psim", cosine_similarity(col(cvecCol), probeVec))
      .orderBy(col("__psim").desc, col(cidCol))
      .limit(1)
      .select(col(cidCol).as("centroid_id"))
    bruteForceKnn(
      assigned.join(broadcast(probeCentroid), "centroid_id"),
      idCol, vecCol, probeVec, k)
  }
}
