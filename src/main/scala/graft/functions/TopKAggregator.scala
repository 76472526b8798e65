package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for [[TopKAggregator]]. */
case class ScoredId(sim: Double, id: Long)

/** Bounded per-group top-k as a mergeable aggregation — the batch-probe
  * kNN primitive.
  *
  * The naive per-probe top-k (`row_number` window over probe_id) shuffles
  * and sorts the ENTIRE corpus × probes product onto one reducer per
  * probe. This aggregator instead keeps a ≤k buffer ordered by
  * (sim desc, id asc): partial aggregation reduces each map partition to
  * k rows per probe before the shuffle, so the exchange carries at most
  * partitions × probes × k rows — independent of corpus size. That is
  * the shape that survives a 100 TB corpus with thousands of probes.
  *
  * Determinism: the buffer order is total ((sim, id) — no float ties can
  * flip it), so results are reproducible and oracle-comparable; `finish`
  * returns the buffer already ranked, ready for `posexplode`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.sim > b.sim || (a.sim == b.sim && a.id < b.id)

  private def insert(buf: Seq[ScoredId], v: ScoredId): Seq[ScoredId] =
    if (buf.size >= k && !better(v, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, v))
      (front :+ v) ++ back.take(k - front.size - 1)
    }

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(b: Seq[ScoredId], v: ScoredId): Seq[ScoredId] = insert(b, v)

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    y.foldLeft(x)(insert)

  override def finish(b: Seq[ScoredId]): Seq[ScoredId] = b

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
