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
class LatestStateProcessor(ttl: TTLConfig = LatestStateProcessor.DefaultTtl)
    extends StatefulProcessor[String, KeyedChange, CurrentState] {

  @transient private var state: org.apache.spark.sql.streaming.ValueState[CurrentState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[CurrentState](
      "latest", Encoders.product[CurrentState], ttl)

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
          // later micro-batches. The TTL passed at construction reclaims
          // tombstones (and abandoned keys); with TTLConfig.NONE they are
          // never reclaimed — only for known-bounded keysets.
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

  /** A production-shaped TTL for reclaiming tombstones and abandoned
    * keys. NOT the default: TTL'd state forces `TimeMode.ProcessingTime`,
    * and under a no-interval trigger (tests, drain jobs) the
    * processing-time clock schedules continuous micro-batches — the same
    * empty-batch spin `flatMapGroupsWithState` timeouts exhibit. Opt in
    * (`latestState(env, SevenDayTtl)`) wherever the query runs with a
    * real trigger interval; the clockless default keeps tombstones
    * forever, so only use it for known-bounded keysets.
    */
  val SevenDayTtl: TTLConfig = TTLConfig(java.time.Duration.ofDays(7))

  /** Clockless default — see [[SevenDayTtl]] for when to override. */
  val DefaultTtl: TTLConfig = TTLConfig.NONE

  /** Streaming latest-state via transformWithState (requires the RocksDB
    * state store provider; see [[StatefulOps.latestState]] for the
    * HDFS-state-store variant). `clusterTime` is parsed via
    * [[StatefulOps.eventTimeMillis]] ($date / $timestamp / ISO);
    * unparseable rows are dropped here and visible through
    * [[StatefulOps.latestStateDeadLetter]].
    */
  def latestState(envelope: DataFrame,
      ttl: TTLConfig = DefaultTtl): Dataset[CurrentState] = {
    import envelope.sparkSession.implicits._
    // TTL'd state needs a processing-time clock; only NONE can run clockless
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None() else TimeMode.ProcessingTime()
    StatefulOps.keyedChanges(envelope)
      .filter(col("eventTimeMs").isNotNull)
      .as[KeyedChange]
      .groupByKey(_.documentKey)
      .transformWithState(
        new LatestStateProcessor(ttl), timeMode, OutputMode.Update())
  }
}
