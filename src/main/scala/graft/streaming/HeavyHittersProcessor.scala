package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

import graft.functions.MisraGries

/** Streaming heavy hitters on `transformWithState`: per stream key
  * (e.g. topic), a Misra–Gries counter map lives in `ValueState` and
  * every micro-batch folds its items in and emits the current sketch —
  * the continuous twin of the batch `text_heavy_hitters` pass.
  *
  * Why this shape at scale: the state per key is AT MOST `k` counters
  * however long the stream runs (the sketch's whole point), so the
  * state store never grows with the vocabulary — a `groupBy(token)`
  * streaming aggregation would hold one state row per distinct token
  * forever. The Misra–Gries bound survives the incremental fold
  * (mergeable-summary property, same argument as the batch
  * aggregation): after n items, every retained counter undercounts by
  * at most n/(k+1) and every item with true frequency > n/(k+1) is
  * retained. Downstream, the same exact-recount refinement as
  * `text_heavy_hitters` applies — the emitted sketch is a guaranteed
  * candidate superset for the true heavy hitters of the stream so far.
  */
class HeavyHittersProcessor(k: Int)
    extends StatefulProcessor[String, StreamingHeavyHitters.Item,
      StreamingHeavyHitters.TopicSketch] {

  @transient private var state
      : org.apache.spark.sql.streaming.ValueState[StreamingHeavyHitters.Counters] = _
  @transient private lazy val mg = new MisraGries(k)

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[StreamingHeavyHitters.Counters](
      "mg", Encoders.product[StreamingHeavyHitters.Counters],
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[StreamingHeavyHitters.Item],
      timerValues: TimerValues): Iterator[StreamingHeavyHitters.TopicSketch] = {
    var m: Map[String, Long] =
      if (state.exists()) state.get().counts else Map.empty
    var n: Long = if (state.exists()) state.get().n else 0L
    rows.foreach { r => m = mg.reduce(m, r.token); n += 1 }
    state.update(StreamingHeavyHitters.Counters(m, n))
    // deterministic presentation order: count desc, then token
    val items = m.toSeq.sortBy { case (t, c) => (-c, t) }
      .map { case (t, c) => StreamingHeavyHitters.Counter(t, c) }
    Iterator.single(StreamingHeavyHitters.TopicSketch(key, n, items))
  }
}

object StreamingHeavyHitters {
  // state/IO case classes must be PUBLIC: a private case class breaks
  // the state-encoder codegen ("no applicable constructor")
  case class Item(topic: String, token: String)
  case class Counter(token: String, count: Long)
  case class Counters(counts: Map[String, Long], n: Long)
  case class TopicSketch(topic: String, n: Long, items: Seq[Counter])

  /** Per-topic streaming heavy hitters with ≤ `k` counters of state. */
  def heavyHitters(items: Dataset[Item], k: Int): Dataset[TopicSketch] = {
    import items.sparkSession.implicits._
    items.groupByKey(_.topic)
      .transformWithState(new HeavyHittersProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }
}
