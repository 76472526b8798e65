package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Streaming sequence PACKING on `transformWithState`: the online twin of
  * the batch `doc_pack`/`doc_pack_emit` plan (the one shared
  * `AssemblyQueries.packPlan` algorithm — greedy in-order token cumsum,
  * bin = (cum−1) div budget), for the pipeline that packs documents AS
  * THEY ARRIVE from curation instead of re-scanning the corpus.
  *
  * State per (source, shard) key is ONE long (the running token count) —
  * constant regardless of stream length, the boundedness argument every
  * stateful op here makes. Packing is ARRIVAL-ordered by definition of
  * online packing; rows are sorted by doc_id within each micro-batch, so
  * when the stream replays a corpus in doc_id order (the CDC-log-ordered
  * case) the emitted bins are BIT-IDENTICAL to the batch plan
  * (StreamingPackSpec proves parity against the registered `doc_pack`
  * query across multi-batch replays).
  */
class PackProcessor(budget: Long)
    extends StatefulProcessor[(String, Long), StreamingPack.Doc,
      StreamingPack.Packed] {

  @transient private var cum: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cum = getHandle.getValueState[Long]("cum", Encoders.scalaLong,
      org.apache.spark.sql.streaming.TTLConfig.NONE)

  override def handleInputRows(
      key: (String, Long),
      rows: Iterator[StreamingPack.Doc],
      timerValues: TimerValues): Iterator[StreamingPack.Packed] = {
    var c = if (cum.exists()) cum.get() else 0L
    val out = rows.toSeq.sortBy(_.doc_id).map { d =>
      c += d.n_tok
      StreamingPack.Packed(d.doc_id, d.source, d.shard, d.n_tok,
        (c - 1) / budget)
    }
    cum.update(c)
    out.iterator
  }
}

object StreamingPack {
  // state/IO case classes must be PUBLIC: a private case class breaks
  // the state-encoder codegen ("no applicable constructor")
  case class Doc(source: String, shard: Long, doc_id: Long, n_tok: Long)
  case class Packed(doc_id: Long, source: String, shard: Long, n_tok: Long,
      bin: Long)

  /** Online packing keyed by the composite shard (the same ≤1000-doc
    * window bound as the batch plan).
    */
  def pack(docs: Dataset[Doc], budget: Long): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(d => (d.source, d.shard))
      .transformWithState(new PackProcessor(budget),
        TimeMode.None(), OutputMode.Append())
  }
}
