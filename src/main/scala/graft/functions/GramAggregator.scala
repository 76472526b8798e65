package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Second-moment accumulator for PCA: one pass over the embedding column
  * producing (Σ x xᵀ flattened row-major, Σ x, n).
  *
  * Buffer is CONSTANT-SIZE (d² + d doubles + a count ≈ 33 KB at d = 64)
  * and mergeable, so Spark's partial aggregation reduces 100 TB of
  * vectors to one buffer per partition before the single-row shuffle —
  * the driver never sees data, only the d×d sufficient statistic
  * (the same "driver sees aggregates, not rows" contract as
  * [[CentroidAggregator]] / the distributed Lloyd fit).
  */
class GramAggregator(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Array[Double], Long),
      (Seq[Double], Seq[Double], Long)] {

  override def zero: (Array[Double], Array[Double], Long) =
    (new Array[Double](dim * dim), new Array[Double](dim), 0L)

  override def reduce(
      b: (Array[Double], Array[Double], Long),
      v: Seq[Float]): (Array[Double], Array[Double], Long) = {
    val (m, s, n) = b
    val x = new Array[Double](dim)
    var i = 0
    while (i < dim && i < v.length) { x(i) = v(i).toDouble; i += 1 }
    i = 0
    while (i < dim) {
      s(i) += x(i)
      var j = 0
      val row = i * dim
      while (j < dim) { m(row + j) += x(i) * x(j); j += 1 }
      i += 1
    }
    (m, s, n + 1)
  }

  override def merge(
      a: (Array[Double], Array[Double], Long),
      b: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = {
    var i = 0
    while (i < dim * dim) { a._1(i) += b._1(i); i += 1 }
    i = 0
    while (i < dim) { a._2(i) += b._2(i); i += 1 }
    (a._1, a._2, a._3 + b._3)
  }

  override def finish(b: (Array[Double], Array[Double], Long)): (Seq[Double], Seq[Double], Long) =
    (b._1.toSeq, b._2.toSeq, b._3)

  override def bufferEncoder: Encoder[(Array[Double], Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Array[Double], Long)]()

  override def outputEncoder: Encoder[(Seq[Double], Seq[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Double], Seq[Double], Long)]()
}
