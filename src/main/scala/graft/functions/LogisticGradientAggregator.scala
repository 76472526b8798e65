package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One training example for the logistic quality model: hashed-feature
  * bucket per token (duplicates kept — the feature value is the count)
  * and the weak label.
  */
final case class LrDoc(bkts: Seq[Int], y: Boolean)

/** Full-batch logistic-regression gradient in one mergeable pass — the
  * [[GramAggregator]] pattern applied to training: the buffer is a
  * CONSTANT-SIZE (d+1 longs ≈ 1 KB at d = 128) per-bucket gradient
  * accumulator, partial-aggregated map-side, so 100 TB of documents
  * reduce to one buffer per partition before the single-row shuffle and
  * the driver only ever sees the gradient, never rows.
  *
  * Determinism: the per-document residual `σ(score) − y` is quantized to
  * exact micro-longs BEFORE accumulation, so every buffer operation is
  * integer addition — associative and commutative — and the gradient is
  * bit-identical under any partitioning or merge order (float summation
  * order cannot leak into the result; QualityModelSpec proves 1-partition
  * ≡ 32-partition training). The doc score itself is exact long
  * arithmetic over the micro-unit weights; the only float op per doc is
  * the sigmoid on the identical exact input.
  */
class LogisticGradientAggregator(wMicro: Array[Long], priorMicro: Long)
    extends Aggregator[LrDoc, (Array[Long], Long), (Seq[Long], Long)] {

  private val d = wMicro.length

  override def zero: (Array[Long], Long) = (new Array[Long](d), 0L)

  override def reduce(b: (Array[Long], Long), doc: LrDoc): (Array[Long], Long) = {
    var s = priorMicro
    var i = 0
    val bk = doc.bkts
    while (i < bk.length) { s += wMicro(bk(i)); i += 1 }
    val p = 1.0 / (1.0 + math.exp(-(s / 1e6)))
    val rMicro = math.round((p - (if (doc.y) 1.0 else 0.0)) * 1e6)
    i = 0
    while (i < bk.length) { b._1(bk(i)) += rMicro; i += 1 }
    (b._1, b._2 + rMicro)
  }

  override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    var i = 0
    while (i < d) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(b: (Array[Long], Long)): (Seq[Long], Long) =
    (b._1.toSeq, b._2)

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[(Seq[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Seq[Long], Long)]()
}
