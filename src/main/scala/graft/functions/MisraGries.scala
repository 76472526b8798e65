package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a MERGEABLE aggregation — the
  * frequent-items primitive a curation pipeline runs where a full
  * `groupBy(token)` is unaffordable: the buffer is at most `k` counters
  * regardless of stream length, partial aggregation reduces each map
  * partition to ≤ k entries before the shuffle, and the merge preserves
  * the error bound (Agarwal et al., "Mergeable Summaries", PODS'12), so
  * the shape survives arbitrary partitioning at 100 TB.
  *
  * Guarantee: after any tree of reduces and merges over n items, every
  * retained counter UNDERestimates its item's true frequency by at most
  * `n / (k + 1)`, and every item with true frequency > `n / (k + 1)` is
  * retained. The classic two-pass exact heavy hitters builds on this:
  * sketch → candidate set (guaranteed superset) → exact recount of just
  * the candidates — which is what `text_heavy_hitters` does, making the
  * final output deterministic and oracle-checkable even though sketch
  * internals depend on partitioning.
  *
  *  - `reduce`: count if present; insert if room; else decrement ALL
  *    counters by one and drop zeros (the item is not inserted).
  *  - `merge`: add counts; if over `k` entries, subtract the (k+1)-th
  *    largest count from every entry and keep the positives.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        b.iterator.collect { case (t, c) if c > 1 => t -> (c - 1) }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val sum = (a.keySet ++ b.keySet).iterator
      .map(t => t -> (a.getOrElse(t, 0L) + b.getOrElse(t, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count so ≤ k entries stay positive
      val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.iterator.collect { case (t, c) if c > d => t -> (c - d) }.toMap
    }
  }

  override def finish(m: Map[String, Long]): Map[String, Long] = m

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
