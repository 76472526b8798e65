package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CentroidAggregator

/** Distributed SPHERICAL k-means (Lloyd) over an `array<float>` embedding
  * column — the clustering primitive a training-data pipeline runs before
  * curation/dedup (cluster-then-sample) and to build IVF routing tables
  * ([[Similarity.ivfKnn]]).
  *
  * Assignment is by cosine, so the matching update is the SPHERICAL one:
  * each cluster's new centroid is the direction of the sum of its
  * members' UNIT vectors (`c ∝ Σ x̂`), which is the exact maximizer of
  * `Σ cos(x, c)` over unit `c` — the plain arithmetic mean of raw vectors
  * is not (long vectors would dominate the direction), and would break
  * the objective-never-worsens guarantee for unnormalized inputs.
  *
  * Scale shape per iteration:
  *  - ASSIGN is a pure projection ([[Similarity.assignToCentroids]]): the
  *    k-row centroid table becomes a literal, so a 100 TB corpus assigns
  *    with zero shuffle and full codegen.
  *  - UPDATE is one aggregation with the constant-size mergeable
  *    [[CentroidAggregator]] buffer over the normalized vectors: map-side
  *    combine reduces each partition to ≤k buffers before the k-row
  *    shuffle (normalization is a narrow codegen'd projection).
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

  /** `vec / ||vec||` as a narrow column expression (float in, float out);
    * zero vectors pass through unchanged to avoid 0/0.
    */
  private def unitize(vec: Column): Column = {
    val nrm = sqrt(aggregate(vec, lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    when(nrm === 0.0d, vec)
      .otherwise(transform(vec, x => (x.cast("double") / nrm).cast("float")))
  }

  /** One spherical Lloyd iteration: assign every vector to its
    * max-cosine centroid, recompute each cluster's centroid as the mean
    * of its members' unit vectors (direction = spherical optimum; the
    * magnitude is irrelevant to cosine assignment and left as the mean's).
    * `centroids` is a local (cid, vector) list; returns the updated list
    * with empty clusters keeping their previous centroid.
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
      .agg(mean(unitize(col(vecCol))).as("mean"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).map(_.toFloat))
      .toMap
    centroids.map { case (cid, old) =>
      cid -> updated.get(cid).filter(v => v.nonEmpty && v.exists(_ != 0.0f))
        .getOrElse(old)
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
