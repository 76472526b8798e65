package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.streaming.StatefulOps.{CurrentState, KeyedChange}

/** Latest-state materialization on Spark 4's `transformWithState` API —
  * the successor to `flatMapGroupsWithState` ([[StatefulOps.latestState]]
  * keeps the classic implementation; both share the same fold semantics).
  *
  * Differences that matter at scale: state lives in per-key
  * `ValueState` handles backed by RocksDB (spill-to-disk state store, no
  * JVM-heap ceiling on the live keyset), and TTL is declarative
  * (`TTLConfig`) instead of hand-rolled timeout plumbing.
  */
class LatestStateProcessor
    extends StatefulProcessor[String, KeyedChange, CurrentState] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[CurrentState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CurrentState](
      "latest", Encoders.product[CurrentState], TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[KeyedChange],
      timerValues: TimerValues): Iterator[CurrentState] = {
    val ordered = rows.toSeq.sortBy(c => (c.eventTimeMs, c.operationType))
    var cur = if (state.exists()) Option(state.get()) else None
    ordered.foreach { c =>
      if (cur.forall(_.lastEventTimeMs <= c.eventTimeMs)) {
        c.operationType match {
          // tombstone, not clear(): rejects replayed older events from
          // later micro-batches (TTLConfig reclaims tombstones)
          case "delete" => cur = Some(CurrentState(key, null, "delete", c.eventTimeMs))
          case _ => cur = Some(CurrentState(key, c.fullDocument, c.operationType, c.eventTimeMs))
        }
      }
    }
    val st = cur.getOrElse(CurrentState(key, null, "delete", 0L))
    state.update(st)
    Iterator.single(st)
  }
}

object LatestStateProcessor {

  /** Streaming latest-state via transformWithState (requires the RocksDB
    * state store provider; see [[StatefulOps.latestState]] for the
    * HDFS-state-store variant).
    */
  def latestState(envelope: DataFrame): Dataset[CurrentState] = {
    import envelope.sparkSession.implicits._
    envelope
      .select(
        col("documentKey"),
        col("operationType"),
        col("fullDocument"),
        unix_millis(to_timestamp(col("clusterTime"))).as("eventTimeMs"))
      .as[KeyedChange]
      .groupByKey(_.documentKey)
      .transformWithState(
        new LatestStateProcessor, TimeMode.None(), OutputMode.Update())
  }
}
