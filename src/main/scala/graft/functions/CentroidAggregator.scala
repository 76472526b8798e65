package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.3 "UDF/UDAF/UDTF"): element-wise mean
  * of embedding vectors per group — the k-means/IVF centroid update step.
  *
  * Buffer = (running element sums, count): constant-size per group,
  * mergeable across partitions — the partial/final shape Spark needs for
  * map-side combine, so 100 TB of vectors shuffle only one buffer per
  * (partition × group).
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i).toDouble; i += 1 }
    (sums, n + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (xs, xn) = x; val (ys, yn) = y
    var i = 0
    while (i < dim) { xs(i) += ys(i); i += 1 }
    (xs, xn + yn)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] = {
    val (sums, n) = b
    if (n == 0) Seq.empty else sums.toSeq.map(_ / n)
  }

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
