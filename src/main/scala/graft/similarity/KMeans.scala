package graft.similarity

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CentroidAggregator

/** Distributed Lloyd's k-means over an `array<float>` embedding column —
  * the clustering primitive a training-data pipeline runs before
  * curation/dedup (cluster-then-sample) and to build IVF routing tables
  * ([[Similarity.ivfKnn]]).
  *
  * Scale shape per iteration:
  *  - ASSIGN is a pure projection ([[Similarity.assignToCentroids]]): the
  *    k-row centroid table becomes a literal, so a 100 TB corpus assigns
  *    with zero shuffle and full codegen.
  *  - UPDATE is one aggregation with the constant-size mergeable
  *    [[CentroidAggregator]] buffer: map-side combine reduces each
  *    partition to ≤k buffers before the k-row shuffle.
  *  - The k-row result legitimately collects to the driver between
  *    iterations (k ≪ corpus by definition — same contract as
  *    `assignToCentroids`); per-iteration state never exceeds k·dim.
  *
  * Determinism: init = the k smallest-id vectors, ties in assignment break
  * toward the smallest centroid id, empty clusters keep their previous
  * centroid — identical inputs give identical centroids, so results are
  * testable without tolerance games.
  */
object KMeans {

  /** One Lloyd iteration: assign every vector to its nearest centroid
    * (cosine), recompute each cluster's element-wise mean. `centroids`
    * is a local (cid, vector) list; returns the updated list with empty
    * clusters keeping their previous centroid.
    */
  def step(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Float])], dim: Int): Seq[(Int, Seq[Float])] = {
    val spark = corpus.sparkSession
    val centroidDf = spark.createDataFrame(
      spark.sparkContext.parallelize(centroids.map { case (cid, v) => Row(cid, v) }, 1),
      StructType(Seq(
        StructField("cid", IntegerType),
        StructField("cvec", ArrayType(FloatType)))))
    val assigned = Similarity.assignToCentroids(
      corpus, idCol, vecCol, centroidDf, "cid", "cvec")
    val mean = udaf(new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    val updated = assigned
      .groupBy("centroid_id")
      .agg(mean(col(vecCol)).as("mean"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat))
      .toMap
    centroids.map { case (cid, old) =>
      cid -> updated.get(cid).filter(_.nonEmpty).getOrElse(old)
    }
  }

  /** Full fit: deterministic init from the k smallest-id vectors, `iters`
    * Lloyd iterations. Returns the centroid table as (cid, cvec) rows —
    * feed it to [[Similarity.assignToCentroids]] to label the corpus, or
    * write the corpus partitioned by the assignment for IVF.
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, dim: Int): DataFrame = {
    val spark = corpus.sparkSession
    var cents: Seq[(Int, Seq[Float])] = corpus
      .orderBy(col(idCol))
      .limit(k)
      .select(col(vecCol))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0)) }
      .toSeq
    require(cents.size == k, s"corpus has fewer than k=$k rows")
    for (_ <- 0 until iters) cents = step(corpus, idCol, vecCol, cents, dim)
    spark.createDataFrame(
      spark.sparkContext.parallelize(cents.map { case (cid, v) => Row(cid, v) }, 1),
      StructType(Seq(
        StructField("cid", IntegerType),
        StructField("cvec", ArrayType(FloatType)))))
  }
}
